package graft

import org.apache.spark.sql.functions._

/** Pins the ScaleGen growing-skew semantics the scaling curve's skew
  * axis rests on: held hot parts gain factor× ABSOLUTE mass (their
  * copies keep the key), everything else amplifies into independent
  * shards (a non-held key's mass is scale-invariant), and referential
  * integrity survives (held parts exist in the part dimension's
  * copy 0).
  */
class ScaleGenSpec extends SparkSuite {

  test("growing-skew amplification: held hot parts gain factor× mass, " +
      "non-held keys stay per-copy, dimension integrity holds") {
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prevNanos = spark.conf.getOption(nanosKey)
    val out = java.nio.file.Files
      .createTempDirectory("graft_scalegen_skew_").toString
    try {
      ScaleGen.generate(spark, sf, out, factor = 2, holdHotParts = 3)
    } finally prevNanos match {
      // generate() flips the nanos flag for the events copy — restore so
      // sibling suites read the fixtures unchanged
      case Some(v) => spark.conf.set(nanosKey, v)
      case None    => spark.conf.unset(nanosKey)
    }
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
    val amp = spark.read.parquet(s"$out/lineitem.parquet")
    assert(amp.count() == 2 * base.count(), "amplified row count")
    // the held set, by ScaleGen's own selection order (distinct-order
    // count desc, key asc)
    val hot = base.select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_partkey")).limit(3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hot.nonEmpty)
    for ((p, n) <- hot) {
      val na = amp.select("l_orderkey", "l_partkey").distinct()
        .where(col("l_partkey") === p).count()
      assert(na == 2 * n,
        s"held part $p co-purchases $na distinct orders, expected ${2 * n}" +
          " — hot-key mass must grow with the factor")
    }
    // a NON-held key keeps exactly its base mass: its copies shifted
    // away (shifted keys exceed the power-of-10 offset, so no collision
    // can inflate it either)
    val hotSet = hot.map(_._1).toSet
    val cold = base.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .where(!col("l_partkey").isInCollection(hotSet))
      .orderBy(col("n").desc, col("l_partkey")).limit(1).head
    assert(amp.where(col("l_partkey") === cold.getLong(0)).count()
      == cold.getLong(1), "non-held key mass must be scale-invariant")
    // referential integrity: every held part resolves in the part dim
    val parts = spark.read.parquet(s"$out/part.parquet")
    assert(parts.where(col("p_partkey").isInCollection(hotSet))
      .select("p_partkey").distinct().count() == hotSet.size,
      "held parts must exist in the amplified part dimension")
  }

  test("growing hot-user amplification: held users gain factor× event " +
      "mass at verbatim timestamps, non-held users stay per-copy") {
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prevNanos = spark.conf.getOption(nanosKey)
    val out = java.nio.file.Files
      .createTempDirectory("graft_scalegen_hotuser_").toString
    try {
      ScaleGen.generate(spark, sf, out, factor = 2, holdHotUsers = 2)
      spark.conf.set(nanosKey, "true")
      val base = spark.read.parquet(s"$sf/events.parquet")
      val amp = spark.read.parquet(s"$out/events.parquet")
      assert(amp.count() == 2 * base.count(), "amplified row count")
      val hot = ScaleGen.hotUserHead(spark, sf, 2)
      assert(hot.size == 2 && hot.forall(_ < 100),
        "held users must come from the sub-bound (< 100) id range")
      for (u <- hot) {
        val n = base.where(col("user_id") === u).count()
        assert(amp.where(col("user_id") === u).count() == 2 * n,
          s"held user $u must gain factor× event mass")
        // timestamps copy VERBATIM: the held copies land in the same
        // session gaps / join bands (distinct ts set is unchanged,
        // every ts just doubles its multiplicity)
        val bTs = base.where(col("user_id") === u)
          .select("ts").distinct().count()
        assert(amp.where(col("user_id") === u)
          .select("ts").distinct().count() == bTs,
          s"held user $u timestamps must copy verbatim")
      }
      // a NON-held sub-bound user keeps exactly its base mass (its
      // copy shifted to a new id above the power-of-10 offset)
      val cold = base.where(col("user_id") < 100 &&
          !col("user_id").isInCollection(hot))
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id")).limit(1).head
      assert(amp.where(col("user_id") === cold.getLong(0)).count()
        == cold.getLong(1),
        "non-held user mass must be scale-invariant")
    } finally prevNanos match {
      case Some(v) => spark.conf.set(nanosKey, v)
      case None    => spark.conf.unset(nanosKey)
    }
  }
}
