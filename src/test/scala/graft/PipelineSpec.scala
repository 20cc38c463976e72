package graft

import graft.functions.VectorKernels
import org.apache.spark.sql.functions._

/** Table-maintenance / pipeline ops (operators/Pipeline.scala). The
  * oracled queries (cdc, gapfill, zorder, compaction content) are gated by
  * the DuckDB compare; these tests pin the properties the oracle cannot
  * express: sketch accuracy, the Z-curve locality guarantee, and that
  * compaction actually collapses the file count.
  */
class PipelineSpec extends SparkSuite {

  test("agg_hll_sketch_merge estimates within 5% of exact, incl. merge") {
    val est = SparkEntry.queries("agg_hll_sketch_merge")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactPer = Tables.documents(spark, sf)
      .groupBy("source").agg(countDistinct("doc_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.documents(spark, sf)
      .select("doc_id").distinct().count()
    (exactPer + ("__all__" -> exactAll)).foreach { case (src, exact) =>
      val e = est(src)
      assert(math.abs(e - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"hll $src: est $e vs exact $exact")
    }
    assert(est.keySet == exactPer.keySet + "__all__")
  }

  test("agg_cms_frequency: estimates never underestimate, within eps*N") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("agg_cms_frequency")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    val totalToks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "").count()
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"CMS underestimated $tok: $est < $exact")
      assert(est - exact <= (0.001 * totalToks).toLong + 1,
        s"CMS error for $tok beyond eps*N: $est vs $exact (N=$totalToks)")
    }
    // deterministic: the seeded sketch gives identical estimates per run
    val again = SparkEntry.queries("agg_cms_frequency")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq)
  }

  test("agg_approx_percentile_sketch within tolerance of exact percentiles") {
    val est = SparkEntry.queries("agg_approx_percentile_sketch")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // GK's actual guarantee is on RANK, not value (a sparse tail can put
    // adjacent ranks far apart in value space — at sf0.001 the 'signup'
    // p99 neighbors differ by 6%): assert each estimate sits at a
    // quantile position within eps of its target, eps = sketch rank error
    // (1/accuracy) + discreteness slack for small groups (2/n)
    val ev = Tables.events(spark, sf)
    def checkRank(df: org.apache.spark.sql.DataFrame, src: String): Unit = {
      val n = df.count().toDouble
      val eps = 1e-4 + 2.0 / n
      val e = est(src)
      Seq((e._1, 0.50, "p50"), (e._2, 0.95, "p95"), (e._3, 0.99, "p99"))
        .foreach { case (got, q, name) =>
          val atOrBelow = df.where(col("value") <= got).count() / n
          val below = df.where(col("value") < got).count() / n
          assert(below <= q + eps && atOrBelow >= q - eps,
            s"$src $name: value $got sits at ($below, $atOrBelow], target $q ± $eps")
        }
    }
    val types = ev.select("event_type").distinct().collect().map(_.getString(0))
    types.foreach(t => checkRank(ev.where(col("event_type") === t), t))
    checkRank(ev, "__all__")
    assert(est.keySet == types.toSet + "__all__")
  }

  test("zorder_key: 2^m-aligned boxes are single contiguous key ranges") {
    // The Z-curve guarantee that makes file-level min/max pruning work:
    // every aligned 2^m × 2^m box covers EXACTLY the keys
    // [zkey(x0,y0), zkey(x0,y0) + 4^m) — one contiguous range.
    for (m <- Seq(1, 2, 3); x0 <- Seq(0, 4, 8, 64); y0 <- Seq(0, 4, 16)) {
      val side = 1 << m
      val bx = x0 - (x0 % side); val by = y0 - (y0 % side)
      val keys = for (x <- bx until bx + side; y <- by until by + side)
        yield VectorKernels.interleave16(x, y)
      val lo = VectorKernels.interleave16(bx, by)
      assert(keys.min == lo && keys.max == lo + (1L << (2 * m)) - 1 &&
        keys.toSet.size == side * side,
        s"box ($bx,$by) side $side not one range")
    }
    // Bit-exact vs the naive per-bit definition (the oracle's 32-term sum).
    for (x <- 0 until 256 by 17; y <- 0 until 256 by 13) {
      val naive = (0 until 16).map { i =>
        (((x >> i) & 1).toLong << (2 * i)) | (((y >> i) & 1).toLong << (2 * i + 1))
      }.sum
      assert(VectorKernels.interleave16(x, y) == naive)
    }
  }

  test("compactParquet collapses a 64-shard write and preserves content") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_t")
    try {
      val in = s"$base/small"; val out = s"$base/compacted"
      val src = Tables.events(spark, sf).select("event_id", "value")
      src.repartition(64).write.parquet(in)
      val (before, after) =
        operators.Pipeline.compactParquet(spark, in, out, 8L << 20)
      assert(before == 64, s"expected 64 shards, got $before")
      assert(after < before && after >= 1, s"no collapse: $before -> $after")
      // ~170 KB of data at sf0.001 vs an 8 MB target => exactly one file.
      assert(after == 1, s"8 MB target should yield 1 file, got $after")
      val a = spark.read.parquet(out).orderBy("event_id").collect()
      val b = src.orderBy("event_id").collect()
      assert(a.sameElements(b), "compaction changed content")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("cdc_snapshot_diff classes are exhaustive and consistent") {
    val rows = SparkEntry.queries("cdc_snapshot_diff")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (change, oldN, newN) = (r.getString(1), r.getLong(2), r.getLong(3))
      change match {
        case "added"   => assert(oldN == 0 && newN > 0)
        case "removed" => assert(newN == 0 && oldN > 0)
        case "changed" => assert(oldN > 0 && newN > 0 && oldN != newN,
          s"changed row with equal counts must differ in total: $r")
        case other => fail(s"unknown class $other")
      }
    }
    // Snapshots are cumulative filters of one table: nothing can vanish.
    assert(!rows.exists(_.getString(1) == "removed"))
  }

  test("layout_range_sort: files cover disjoint sec ranges (zone-map-prunable)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_rangesort_test_").toString
    try {
      Tables.events(spark, sf)
        .select(col("event_id"),
          expr("unix_timestamp(date_trunc('second', ts))").as("sec"))
        .repartitionByRange(4, col("sec"))
        .sortWithinPartitions("sec", "event_id")
        .write.mode("overwrite").parquet(tmp)
      val ranges = spark.read.parquet(tmp)
        .groupBy(input_file_name().as("f"))
        .agg(min("sec").as("lo"), max("sec").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(ranges.length > 1)
      ranges.sliding(2).foreach {
        case Array(a, b) => assert(a._2 <= b._1, s"overlap: $a vs $b")
        case _ => ()
      }
      // the layout write plans a RangePartitioning exchange
      val p = Tables.events(spark, sf)
        .select(expr("unix_timestamp(date_trunc('second', ts))").as("sec"))
        .repartitionByRange(4, col("sec"))
        .queryExecution.executedPlan.toString
      assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
        p.take(1500))
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }

  test("referential integrity: intact fixture, independent recount") {
    val rows = SparkEntry.queries("dq_referential_integrity")(spark, sf)
      .collect()
    assert(rows.length == 7, "seven FK edges in the star schema")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_child") > 0)
      assert(r.getAs[Long]("n_orphans") == 0,
        s"${r.getString(0)}: fixture must be referentially intact")
      assert(r.getAs[Double]("orphan_rate") == 0.0)
    }
    // independent recount of one edge: child total minus inner-join
    // matches must equal the reported orphans
    val li = Tables.lineitem(spark, sf)
    val matched = li.join(Tables.orders(spark, sf),
      col("l_orderkey") === col("o_orderkey")).count()
    val edge = rows.find(_.getString(0) == "lineitem.l_orderkey->orders")
      .get
    assert(edge.getAs[Long]("n_child") - matched ==
      edge.getAs[Long]("n_orphans"))
  }

  test("ts_gapfill_ffill emits the full grid with zeros filled forward") {
    val out = SparkEntry.queries("ts_gapfill_ffill")(spark, sf)
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    val days = out.select("day").distinct().count()
    assert(out.count() == types * days, "grid must be complete")
    assert(out.where(col("n") === 0).count() > 0,
      "fixture should have gap days at the >480 threshold")
  }
}
