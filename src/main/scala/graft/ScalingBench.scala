package graft

import org.apache.spark.sql.SparkSession

/** SCALING-CURVE bench (r17 verdict ask #1): run the heaviest kernels at
  * sf0.1 / sf0.5 / sf1.0 and fit per-query growth exponents, answering
  * "would it survive 100×?" with measurements instead of plan-shape
  * arguments. sf0.5/sf1.0 are ScaleGen amplifications of the driver's
  * sf0.1 fixtures (5× and 10× structurally-independent shards — see
  * ScaleGen's scaladoc for why that is the right scaling shape).
  *
  * The exponent is the least-squares slope of log(wall) on log(scale)
  * over the three points. Interpretation at fixture scale: a
  * scan-bound linear kernel fits ≈1; per-job fixed overhead (streaming
  * init, k-means seeding, round scheduling) COMPRESSES the exponent
  * below 1 (the "amortizes at data scale" claim, now measured); any
  * fit meaningfully above ~1.3 means super-linear work the plan-shape
  * audit missed. ScalingGuardSpec pins the committed curve.
  *
  * Usage: `runMain graft.ScalingBench [outJson]` with the optional env
  * `SPARK_GRAFT_SCALE_DIR` (defaults to `target/scaling`) holding the
  * generated fixture dirs. Prints one JSON line and writes SCALING.json.
  */
object ScalingBench {

  /** The scaling set: the committed denominator's heaviest kernels plus
    * every iterative-graph / dedup / streaming-state family head the
    * SURVEY argues "amortizes at data scale" for.
    */
  private[graft] val scaleQueries: Seq[String] = Seq(
    "graph_ppr_seeded",
    "graph_connected_components",
    "graph_label_propagation",
    "graph_shortest_cost",
    "graph_kcore_decompose",
    "graph_pagerank_copurchase",
    "dedup_band_recall_curve",
    "dedup_minhash_lsh",
    "dedup_collapse_logn",
    "dedup_shared_ngram_window",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_stream_full_outer",
    "stream_stream_left_semi",
    "pipeline_pretrain_corpus",
    "text_bpe_train",
    "text_hapax_ratio",
    "orders_basket_triples",
    "events_retention_triangle",
    "stats_bootstrap_ci")

  /** Least-squares slope of ln(wall) on ln(scale). */
  private[graft] def fitExponent(points: Seq[(Double, Double)]): Double = {
    val xs = points.map(p => math.log(p._1))
    val ys = points.map(p => math.log(p._2))
    val n = points.size.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    (n * sxy - sx * sy) / (n * sxx - sx * sx)
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SCALING.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scaleRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "target/scaling")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scale points: (relative scale, fixture dir); sf0.1 is the
    // driver-generated original, the rest are ScaleGen amplifications
    val src = "/root/testdata/sf0.1"
    val points: Seq[(String, Double, String)] = Seq(
      ("sf0.1", 1.0, src),
      ("sf0.5", 5.0, s"$scaleRoot/sf0.5"),
      ("sf1.0", 10.0, s"$scaleRoot/sf1.0"))
    for ((name, f, dir) <- points if f > 1.0) {
      System.err.println(s"[scaling] ensuring $name at $dir (${f.toInt}x)")
      ScaleGen.generate(spark, src, dir, f.toInt)
    }
    // the same warm-up discipline as Bench: JVM/codegen/streaming init
    // must not land on the first timed kernel
    try {
      spark.read.parquet(s"$src/lineitem.parquet").limit(100).count()
      val w = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "10").load()
        .groupBy("value").count()
      graft.streaming.Streams.runToTable(w, "complete", 2).count()
    } catch { case t: Throwable =>
      System.err.println(s"[scaling-warmup] $t") }
    val queries = SparkEntry.all.filter(q => scaleQueries.contains(q.name))
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // per (query, scale): min of 2 runs (transient-stall discipline)
    val walls: Seq[(String, Seq[(String, Double, Double, Long)])] =
      queries.map { q =>
        var baseRows = -1L
        val per = points.map { case (pn, f, dir) =>
          var rows = -1L
          def once(): Double = {
            val t0 = System.nanoTime()
            rows = q.fn(spark, dir).count()
            (System.nanoTime() - t0) / 1e9
          }
          // a zero-row result at a SCALED point when the base point had
          // rows is a BROKEN FIXTURE PATH (r18: a relative symlink
          // target read as an empty stream and the collapsed wall looked
          // like a speedup), never a measurement — fail the point
          // instead of fitting it. A query whose base result is itself
          // empty (a dedup family with no matches at this sf) keeps its
          // walls: the fixture path is proven by the base sf elsewhere.
          val t = try {
            val m = math.min(once(), once())
            if (rows == 0 && baseRows > 0) {
              System.err.println(
                s"[scaling] ${q.name} @ $pn returned 0 rows — " +
                  "fixture path broken, discarding the wall")
              Double.NaN
            } else m
          } catch { case e: Throwable =>
            System.err.println(s"[scaling] ${q.name} @ $pn failed: $e")
            Double.NaN
          }
          if (baseRows < 0) baseRows = rows
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.err.println(
            s"[scaling] ${q.name} @ $pn (${f}x): ${sec(t)} s, $rows rows")
          (pn, f, t, rows)
        }
        (q.name, per)
      }
    val rows = walls.map { case (name, per) =>
      val ok = per.filterNot(_._3.isNaN)
      val exp =
        if (ok.size < 2) Double.NaN
        else fitExponent(ok.map(p => (p._2, p._3)))
      val wallsJson = per
        .map { case (pn, _, t, _) =>
          "\"" + pn + "\":" + (if (t.isNaN) "null" else sec(t)) }
        .mkString("{", ",", "}")
      val rowsJson = per
        .map { case (pn, _, _, r) => "\"" + pn + "\":" + r }
        .mkString("{", ",", "}")
      s""""$name":{"walls":$wallsJson,"rows":$rowsJson,"exponent":${
        if (exp.isNaN) "null" else sec(exp)}}"""
    }
    val json = rows.mkString(
      s"""{"metric":"scaling","unit":"sec","scales":[1,5,10],""" +
        s""""sf_base":"sf0.1","queries":{""",
      ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
