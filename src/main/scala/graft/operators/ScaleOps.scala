package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-technique operators: the three remaining 100 TB patterns not yet
  * exercised by the inventory — static partition pruning, dynamic
  * partition pruning (DPP), and salted two-phase aggregation for skewed
  * keys. Each is oracled (the technique must not change the answer) and
  * plan-asserted in PlanSpec.
  */
object ScaleOps {

  /** events re-written partitioned by event_type, once per (JVM, sfDir) —
    * the layout that turns a key predicate into directory pruning.
    */
  private val partDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def partitionedEvents(s: SparkSession, d: String): String =
    partDirs.computeIfAbsent(d, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft_events_part_")
        .toString
      Tables.events(s, d).write.mode("overwrite")
        .partitionBy("event_type").parquet(s"$dir/fact")
      // a parquet-backed dim: a filter over a file scan survives into the
      // optimized plan, which the DPP rule requires (an inline VALUES dim
      // constant-folds to a pre-filtered LocalRelation — no Filter, no DPP)
      import s.implicits._
      Seq(("click", 1), ("purchase", 2), ("view", 2), ("error", 3),
        ("signup", 3))
        .toDF("et", "w").write.mode("overwrite").parquet(s"$dir/dim")
      dir
    })

  val defs: Seq[Q] = Seq(

    // Static partition pruning: the IN-list reaches the directory listing
    // (PartitionFilters in the scan, PlanSpec-asserted) — only 2 of 5
    // partitions are read.
    Q("scan_partition_pruned",
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
        |FROM events
        |WHERE event_type IN ('click', 'view')
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      s.read.parquet(s"${partitionedEvents(s, d)}/fact")
        .where(col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
        .orderBy("event_type")
    },

    // Dynamic partition pruning: the partition filter is only known after
    // the dim side is evaluated at runtime — the classic star-schema scan
    // reducer.
    Q("join_dpp_partitioned",
      """SELECT e.event_type, count(*) AS n
        |FROM events e
        |JOIN (VALUES ('click', 1), ('purchase', 2), ('view', 2),
        |      ('error', 3), ('signup', 3)) AS dim(et, w)
        |  ON e.event_type = dim.et
        |WHERE dim.w = 1
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val base = partitionedEvents(s, d)
      val dim = s.read.parquet(s"$base/dim").where(col("w") === 1)
      s.read.parquet(s"$base/fact")
        .join(dim, col("event_type") === col("et"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // Salted two-phase aggregation: hot grouping keys are split across 16
    // salt buckets (phase 1: map-side-friendly partial agg on (key, salt)),
    // then recombined (phase 2). The answer is identical to the direct
    // group-by — that equality IS the oracle.
    Q("agg_salted_skew",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val salted = Tables.lineitem(s, d)
        .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("l_quantity").cast("decimal(12,2)")).as("pq"))
      salted.groupBy("l_returnflag")
        .agg(sum(col("pn")).as("n"),
          sum(col("pq")).cast("double").as("qty"))
        .orderBy("l_returnflag")
    },
  )
}
