package graft.operators

import graft.{Q, Tables}
import graft.functions._
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY.md §2.2 "Aggregations").
  *
  * Money sums follow the decimal-exact discipline (Q scaladoc): partial
  * aggregation (map-side combine) still applies — decimal sum is
  * associative, so the two-phase HashAggregate plan is unchanged.
  */
object Aggregations {

  private val modeDefs: Seq[Q] = Seq(
    // Statistical mode with a DETERMINISTIC tie-break (max count, then
    // min value) — engines' native mode() functions break ties
    // arbitrarily, so both sides use the same explicit rank formulation.
    Q("agg_mode_deterministic",
      """SELECT o_orderstatus, o_orderpriority AS mode_prio, cnt FROM (
        |  SELECT o_orderstatus, o_orderpriority, cnt,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY cnt DESC, o_orderpriority) AS rn
        |  FROM (
        |    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |    FROM orders GROUP BY 1, 2))
        |WHERE rn = 1
        |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_prio"),
          col("cnt"))
        .orderBy("o_orderstatus")
    },
  )

  /** sum(cast(x as decimal(12,2))) cast back to double — engine-exact. */
  private def dsum(c: String) = sum(col(c).cast("decimal(12,2)")).cast("double")

  /** Winsorized robust statistics kernel (re-exported as
    * `graft.api.Graft.winsorizedStats`): clip each group's values to its
    * [loQ, hiQ] interpolated-percentile band, then aggregate. Exact
    * percentiles per group on one shuffle (swap in `approx_percentile`
    * at 100 TB — the clip is band-insensitive to sketch error), bounds
    * broadcast back, clipped aggregate map-side combinable. Bounds are
    * rounded to 6 decimals BEFORE the clip and clipped values summed as
    * DECIMAL(18,6), so the result is a pure function of the data, not of
    * partitioning or fold order. Returns (group, lo, hi, n, wmean).
    */
  private[graft] def winsorizedStatsOf(df0: org.apache.spark.sql.DataFrame,
      groupCol: String, valueCol: String,
      loQ: Double = 0.05, hiQ: Double = 0.95)
      : org.apache.spark.sql.DataFrame = {
    // NULL values are EXCLUDED, not clipped: percentile already ignores
    // them, and greatest/least skip NULL arguments — without this filter
    // a NULL row would silently contribute the LOWER BOUND to the sum
    // and inflate n, disagreeing with the bounds' own population
    val df = df0.where(col(valueCol).isNotNull)
    val p = df.groupBy(groupCol)
      .agg(round(expr(s"percentile($valueCol, $loQ)"), 6).as("lo"),
        round(expr(s"percentile($valueCol, $hiQ)"), 6).as("hi"))
    df.join(broadcast(p), groupCol)
      .groupBy(groupCol, "lo", "hi")
      .agg(count(lit(1)).as("n"),
        (sum(least(greatest(col(valueCol), col("lo")), col("hi"))
          .cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as("wmean"))
  }

  val defs: Seq[Q] = Seq(

    // TPC-H Q1 shape: tiny key space ⇒ map-side partials reduce ~all rows
    // before the shuffle; final agg is 6 groups regardless of scale.
    Q("agg_hash_group",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_price"),
          (dsum("l_quantity") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // High-cardinality group (one group per order): partials barely reduce;
    // exercises hash-agg spill / sort-agg fallback. At 100 TB this is the
    // shape to watch for skew — keys here are uniform.
    Q("agg_sort_fallback",
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("l_orderkey")
    },

    // Exact distinct: Expand + two-phase agg in Spark.
    Q("agg_count_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag")
    },

    // EXACT distinct counting via segment bitmaps (Spark 4 bitmap_*
    // aggregates): keys bucket into fixed 32k-bit segments, each
    // (group, bucket) folds to ONE bitmap with map-side partials, and
    // the distinct count is the sum of per-segment popcounts. Unlike
    // count(DISTINCT) — whose expand+reshuffle carries every distinct
    // key — the shuffled state here is bounded by key-range/32k bitmaps
    // per group, and unlike HLL it is exact. The pre-aggregated bitmaps
    // are also mergeable across partitions/days (bitmap_or_agg), the
    // incremental-MV form of distinct.
    Q("agg_bitmap_distinct",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_part
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          expr("bitmap_bucket_number(l_partkey)").as("bkt"))
        .agg(expr("bitmap_count(bitmap_construct_agg(" +
          "bitmap_bit_position(l_partkey)))").as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("cnt")).cast("bigint").as("n_part"))
        .orderBy("l_returnflag")
    },

    // Winsorized robust statistics — the standard outlier-tamed prep for
    // feature/reward columns in a training pipeline: clip each value to
    // its group's [p5, p95] band, then aggregate. Two passes: exact
    // interpolated percentiles per group (one shuffle; at 100 TB swap in
    // approx_percentile — the clip is band-insensitive to sketch error),
    // bounds broadcast back, and the clipped aggregate is map-side
    // combinable. Float parity: bounds rounded to 6 BEFORE the clip so
    // both engines compare against identical doubles; clipped values
    // cast to DECIMAL(18,6) so the sum is order-independent; the final
    // mean division is one double op on identical operands.
    Q("agg_winsorized_stats",
      """WITH ev AS (SELECT event_type, value FROM events
        |            WHERE value IS NOT NULL),
        |p AS (
        |  SELECT event_type, round(quantile_cont(value, 0.05), 6) AS lo,
        |         round(quantile_cont(value, 0.95), 6) AS hi
        |  FROM ev GROUP BY event_type)
        |SELECT e.event_type, p.lo, p.hi, count(*) AS n,
        |  CAST(sum(CAST(LEAST(GREATEST(e.value, p.lo), p.hi)
        |    AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS wmean
        |FROM ev e JOIN p ON e.event_type = p.event_type
        |GROUP BY e.event_type, p.lo, p.hi
        |ORDER BY e.event_type""".stripMargin) { (s, d) =>
      winsorizedStatsOf(Tables.events(s, d), "event_type", "value")
        .orderBy("event_type")
    },

    // LISTAGG (SQL:2023, new in Spark 4) — ordered string aggregation
    // WITHIN GROUP, the report-friendly "concatenate the group's values"
    // surface. DISTINCT + an explicit ORDER BY make the result a pure
    // function of the group's value set (never of partitioning), which
    // is the only way a string agg can be oracled cross-engine.
    Q("agg_listagg",
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, '|'
        |    ORDER BY o_orderpriority) AS priorities,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_listagg")
      s.sql(
        """SELECT o_orderstatus,
          |  listagg(DISTINCT o_orderpriority, '|')
          |    WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
          |  count(*) AS n
          |FROM orders_listagg
          |GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin)
    },

    // approx_top_k (Spark 4 frequent-items sketch, DataSketches
    // frequent-strings under the hood): ONE pass, fixed memory, mergeable
    // partials (approx_top_k_accumulate/_combine are the cross-segment
    // MV form) — the heavy-hitters surface as a built-in, next to the
    // hand-built Misra-Gries pair (`agg_heavy_hitters*`). ORACLED
    // because the sketch is EXACT whenever the tracked-item budget
    // exceeds the distinct count (3 return flags ≪ the default 10k
    // capacity) — the same exactness argument the oracle relies on.
    Q("agg_approx_topk",
      """SELECT l_returnflag AS item, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY cnt DESC, item""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("li_approx_topk")
      s.sql(
        """SELECT t.item AS item, t.count AS cnt FROM (
          |  SELECT explode(approx_top_k(l_returnflag, 3)) AS t
          |  FROM li_approx_topk)
          |ORDER BY cnt DESC, item""".stripMargin)
    },

    // The MERGEABLE form of the frequent-items sketch: per-source
    // accumulate → combine → estimate, the incremental-MV pattern that
    // computes a global top-k from per-segment sketch states WITHOUT
    // rescanning raw rows (the frequency analog of hll_sketch_merge).
    // Exactness argument as above, and the estimate's cutoff (100) also
    // sits far above the language domain, so BOTH truncation points are
    // clear of any realistic fixture drift — the merged estimate equals
    // the true counts, all of them.
    Q("agg_topk_sketch_merge",
      """SELECT lang AS item, count(*) AS cnt
        |FROM documents GROUP BY lang
        |ORDER BY cnt DESC, item""".stripMargin) { (s, d) =>
      Tables.documents(s, d).createOrReplaceTempView("docs_topk_merge")
      s.sql(
        """SELECT t.item AS item, t.count AS cnt FROM (
          |  SELECT explode(approx_top_k_estimate(
          |    approx_top_k_combine(sk), 100)) AS t
          |  FROM (SELECT approx_top_k_accumulate(lang) AS sk
          |        FROM docs_topk_merge GROUP BY source))
          |ORDER BY cnt DESC, item""".stripMargin)
    },

    // HLL sketch — no oracle (sketches differ across engines); FunctionSpec
    // asserts ±5% of exact. The 100 TB answer to count-distinct: fixed
    // memory, one pass, mergeable partials.
    Q.noOracle("agg_approx_distinct") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")
    },

    Q("agg_rollup",
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    Q("agg_cube",
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum("l_quantity").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    Q("agg_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
          |  count(*) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY g_status, g_prio,
          |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    // Deterministic list aggregation rendered as a string (array text forms
    // differ across engines; the joined string is engine-neutral).
    Q("agg_collect_sorted",
      """SELECT c_mktsegment,
        |  string_agg(c_name, '|' ORDER BY c_name) AS names
        |FROM (SELECT c_mktsegment, c_name FROM customer WHERE c_custkey <= 200)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .where(col("c_custkey") <= 200)
        .groupBy("c_mktsegment")
        // native listagg (Spark 4): the WITHIN GROUP sort happens inside
        // the aggregate's buffer merge — no collect_list array
        // materialization per group
        .agg(expr("listagg(c_name, '|') WITHIN GROUP (ORDER BY c_name)")
          .as("names"))
        .orderBy("c_mktsegment")
    },

    // Vector centroid per label via the engine's UDAF surface — oracled
    // against DuckDB list aggregation, with per-element rounding.
    Q("agg_vector_centroid",
      """SELECT label,
        |  round(CAST(CAST(sum(embedding[1]) / count(*) AS FLOAT) AS DOUBLE), 4) AS c0,
        |  round(CAST(CAST(sum(embedding[2]) / count(*) AS FLOAT) AS DOUBLE), 4) AS c1,
        |  count(*) AS n
        |FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS embedding
        |      FROM embeddings)
        |GROUP BY label
        |ORDER BY label""".stripMargin) { (s, d) =>
      // vector_avg computes the full 64-dim centroid; the oracled
      // projection checks the first two components (rounded).
      Tables.embeddings(s, d)
        .groupBy("label")
        .agg(vector_avg(col("embedding")).as("centroid"),
          count(lit(1)).as("n"))
        .select(col("label"),
          round(element_at(col("centroid"), 1).cast("double"), 4).as("c0"),
          round(element_at(col("centroid"), 2).cast("double"), 4).as("c1"),
          col("n"))
        .orderBy("label")
    },

    // Fixed-width value histogram per series — the profiling partner of
    // the percentile sketch (a histogram is mergeable by construction:
    // per-partition bin counts sum). One combiner-friendly shuffle on
    // (type, bin); bin ids are exact integer floor(value/50), so the
    // oracle needs no float tolerance at all.
    Q("agg_histogram_fixed_bins",
      """SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
        |FROM events
        |GROUP BY event_type, bin
        |ORDER BY event_type, bin""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"),
          floor(col("value") / 50).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
        .orderBy("event_type", "bin")
    },
  ) ++ modeDefs
}
