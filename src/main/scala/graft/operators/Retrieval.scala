package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical retrieval + hybrid fusion — the other half of a RAG engine's
  * retrieval stack (the reference ships vector-only k-NN; production RAG
  * pairs it with BM25 and fuses the two rank lists).
  *
  * Scale shape: BM25 is two passes — one tiny corpus-stats aggregate
  * (N, Σdl, per-term df) broadcast back to a scan-side scoring
  * projection (per-term tf via HOF `filter`, no explode, no shuffle of
  * the corpus). RRF joins two bounded top-k lists.
  *
  * Oracle discipline for float parity (see Q scaladoc): the only
  * transcendental (ln in idf) is rounded to 8 decimals on BOTH engines
  * before use, making every downstream operand bit-identical; per-term
  * contributions are added in explicit fixed order; final scores round
  * to 6.
  */
object Retrieval {

  /** Query terms for the demo probe (corpus-vocabulary words). */
  private val Terms = Seq("stream", "window", "join")

  /** BM25(k1=1.2, b=0.75) score per doc for [[Terms]]. */
  private def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")))
    // per-term term frequency via HOF filter: scan-side, codegen'd
    val withTf = Terms.zipWithIndex.foldLeft(toks) { case (df, (t, i)) =>
      df.withColumn(s"tf$i", size(filter(col("toks"), x => x === lit(t))))
    }.drop("toks")
    // corpus statistics: ONE tiny row (N, sum dl, per-term df), broadcast
    val statCols =
      count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
        Terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val joined = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sdl").cast("double") / col("n")
    def contrib(i: Int): Column = {
      // idf rounded to 8 BEFORE use: ln is the one libm/JDK divergence
      // risk; after rounding, all arithmetic is IEEE-identical
      val idf = round(
        log((col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1), 8)
      val tf = col(s"tf$i").cast("double")
      idf * (tf * 2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    }
    joined.select(col("doc_id"),
      round(contrib(0) + contrib(1) + contrib(2), 6).as("score"))
  }

  private val OracleBm25 =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |         len(string_split(text, ' ')) AS dl
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, dl,
      |    len(list_filter(toks, x -> x = 'stream')) AS tf0,
      |    len(list_filter(toks, x -> x = 'window')) AS tf1,
      |    len(list_filter(toks, x -> x = 'join'))   AS tf2
      |  FROM d),
      |stats AS (
      |  SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sdl,
      |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
      |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
      |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      |  FROM tf),
      |scored AS (
      |  SELECT doc_id, round(
      |      round(ln((n - df0 + 0.5) / (df0 + 0.5) + 1), 8)
      |        * (CAST(tf0 AS DOUBLE) * 2.2)
      |        / (CAST(tf0 AS DOUBLE)
      |           + 1.2 * (0.25 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n)))
      |    + round(ln((n - df1 + 0.5) / (df1 + 0.5) + 1), 8)
      |        * (CAST(tf1 AS DOUBLE) * 2.2)
      |        / (CAST(tf1 AS DOUBLE)
      |           + 1.2 * (0.25 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n)))
      |    + round(ln((n - df2 + 0.5) / (df2 + 0.5) + 1), 8)
      |        * (CAST(tf2 AS DOUBLE) * 2.2)
      |        / (CAST(tf2 AS DOUBLE)
      |           + 1.2 * (0.25 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n))),
      |    6) AS score
      |  FROM tf, stats)""".stripMargin

  val defs: Seq[Q] = Seq(

    // BM25 top-10 for a fixed query — the lexical retrieval arm.
    Q("text_bm25_topk",
      s"""$OracleBm25
         |SELECT doc_id, score FROM scored
         |WHERE score > 0
         |ORDER BY score DESC, doc_id
         |LIMIT 10""".stripMargin) { (s, d) =>
      bm25Scored(s, d)
        .where(col("score") > 0)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },

    // Hybrid retrieval: reciprocal-rank fusion (k=60) of the vector arm
    // (cosine vs the vec_id=0 probe) and the BM25 arm. Ranks are computed
    // on ROUNDED scores with id tiebreaks, so both engines rank
    // identically; 1/(60+rank) terms are exact-operand divisions added in
    // fixed order.
    Q("rag_hybrid_rrf",
      s"""$OracleBm25,
         |bm AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
         |    AS rb
         |  FROM scored WHERE score > 0
         |  ORDER BY score DESC, doc_id LIMIT 50),
         |vec AS (
         |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vs DESC, vec_id) AS rv
         |  FROM (
         |    SELECT vec_id,
         |      round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
         |        (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
         |         WHERE vec_id = 0)), 6) AS vs
         |    FROM embeddings WHERE vec_id <> 0)
         |  ORDER BY vs DESC, vec_id LIMIT 50)
         |SELECT COALESCE(vec.vec_id, bm.doc_id) AS doc_id,
         |  round(COALESCE(1.0 / (60 + rv), 0.0)
         |        + COALESCE(1.0 / (60 + rb), 0.0), 6) AS rrf
         |FROM vec FULL JOIN bm ON vec.vec_id = bm.doc_id
         |ORDER BY rrf DESC, doc_id
         |LIMIT 10""".stripMargin) { (s, d) =>
      import graft.functions.cosine_sim
      import org.apache.spark.sql.expressions.Window
      // Rank AFTER the top-50 cut, never before: limit-then-rank plans the
      // cut as TakeOrderedAndProject (per-partition heaps, no global sort)
      // and the unpartitioned row_number window — a single-partition
      // Exchange by construction — only ever sees the 50-row frame, not
      // the scored corpus. Ranks are identical either way: the top-50 by
      // an ordering hold ranks 1..50 under that same ordering.
      val wAll = Window.orderBy(col("vs").desc, col("vec_id"))
      val vec = Tables.embeddings(s, d).where(col("vec_id") =!= 0)
        .crossJoin(broadcast(Tables.embeddings(s, d)
          .where(col("vec_id") === 0).select(col("embedding").as("probe"))))
        .select(col("vec_id"),
          round(cosine_sim(col("embedding"), col("probe")), 6).as("vs"))
        .orderBy(col("vs").desc, col("vec_id")).limit(50)
        .withColumn("rv", row_number().over(wAll))
        .select(col("vec_id"), col("rv"))
      val wBm = Window.orderBy(col("score").desc, col("doc_id"))
      val bm = bm25Scored(s, d).where(col("score") > 0)
        .orderBy(col("score").desc, col("doc_id")).limit(50)
        .withColumn("rb", row_number().over(wBm))
        .select(col("doc_id"), col("rb"))
      vec.join(bm, col("vec_id") === col("doc_id"), "full_outer")
        .select(coalesce(col("vec_id"), col("doc_id")).as("doc_id"),
          round(coalesce(lit(1.0) / (lit(60) + col("rv")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0)), 6)
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
  )
}
