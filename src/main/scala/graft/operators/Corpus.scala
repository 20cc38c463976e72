package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between dedup
  * and tokenization: keep-best selection inside exact-duplicate groups,
  * token-budget shard packing, the source/language mixture report a data
  * recipe is specified against, and SCD2 history assembly for dimension
  * snapshots.
  *
  * No reference equivalent (zonbloop/flink-rag has no batch curation
  * surface); these extend the SURVEY §2.2 [EXT] LLM-pipeline story.
  *
  * Scale shapes:
  *  - keep_best: one hash shuffle on md5(text) — the same partitioning
  *    exact dedup already uses; the window adds no extra exchange.
  *  - shard packing: running sums are PER SOURCE (partitioned window),
  *    never a global single-partition sort — each source packs
  *    independently, which is how real corpora shard anyway.
  *  - mixture report: full-corpus scan collapses to |lang|×|source| rows
  *    with map-side partials before the tiny percent-of-total window.
  *  - SCD2: one shuffle on the entity key; lead() runs inside each
  *    partition.
  */
object Corpus {

  /** SCD2 interval build over (o_custkey, o_orderkey, o_orderdate):
    * validity [valid_from, valid_to) as ISO strings + is_current. Shared
    * by the batch history query and the streaming incremental upsert
    * (`stream_scd2_upsert`), which rebuilds ONLY touched customers with
    * this same function — incremental == batch by construction.
    */
  private[graft] def scd2Intervals(base: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    base.select(col("o_custkey"), col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
      date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd")
        .as("valid_to"),
      lead(col("o_orderdate"), 1).over(w).isNull.as("is_current"))
  }

  val defs: Seq[Q] = Seq(

    // Exact-dup groups keyed by md5(text) (the one hash both engines
    // compute identically); keep the longest doc per group, doc_id as the
    // deterministic tie-break. This is dedup as a pipeline actually ships
    // it: pick the best representative, don't just pick *a* row.
    Q("dedup_keep_best",
      """SELECT doc_id, grp_size, rn = 1 AS keep FROM (
        |  SELECT doc_id,
        |    count(*) OVER (PARTITION BY md5(text)) AS grp_size,
        |    row_number() OVER (PARTITION BY md5(text)
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val grp = Window.partitionBy(md5(col("text")))
      val rank = grp.orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          count(lit(1)).over(grp).as("grp_size"),
          row_number().over(rank).as("rn"))
        .select(col("doc_id"), col("grp_size"),
          (col("rn") === 1).as("keep"))
        .orderBy("doc_id")
    },

    // Token-budget shard packing: greedy contiguous fill of 4096-token
    // shards per source (whitespace tokens; the doc that straddles a
    // boundary starts the next shard's count but stays whole). Running
    // sums are per-source windows — no global order, no single-partition
    // bottleneck.
    Q("pack_token_shards",
      """SELECT source, doc_id, tokens,
        |  (cum - tokens) // 4096 AS shard
        |FROM (
        |  SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS tokens,
        |    CAST(sum(len(string_split(text, ' '))) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM documents)
        |ORDER BY source, doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
        .withColumn("cum", sum(col("tokens")).over(w))
        .select(col("source"), col("doc_id"), col("tokens"),
          expr("(cum - tokens) div 4096").as("shard"))
        .orderBy("source", "doc_id")
    },

    // Data-mixture report: the (lang × source) doc/token counts plus each
    // cell's share of total tokens — the artifact a pretraining data
    // recipe is specified against and audited with.
    Q("mix_report_sources",
      """SELECT lang, source, docs, tokens,
        |  round(CAST(tokens AS DOUBLE)
        |        / CAST(CAST(sum(tokens) OVER () AS BIGINT) AS DOUBLE)
        |        * 100, 6) AS pct_tokens
        |FROM (
        |  SELECT lang, source, count(*) AS docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY lang, source)
        |ORDER BY lang, source""".stripMargin) { (s, d) =>
      val cells = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      // percent-of-total over the aggregated cells (|lang|×|source| rows),
      // never over the raw corpus
      cells.withColumn("pct_tokens",
          round(col("tokens").cast("double")
            / sum(col("tokens")).over(Window.partitionBy()).cast("double")
            * 100, 6))
        .orderBy("lang", "source")
    },

    // SCD2 history build: each customer's order stream becomes validity
    // intervals [valid_from, valid_to) with an is_current flag — the
    // slowly-changing-dimension shape every warehouse load job produces.
    // One shuffle on the entity key; lead() is per-partition.
    Q("scd2_orders_history",
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  strftime(lead(o_orderdate) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    '%Y-%m-%d') AS valid_to,
        |  lead(o_orderdate) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |    IS NULL AS is_current
        |FROM orders WHERE o_custkey < 500
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin) { (s, d) =>
      scd2Intervals(Tables.orders(s, d).where(col("o_custkey") < 500))
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    },
  )
}
