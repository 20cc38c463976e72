package graft

/** Sampling/split/scrub ops: determinism is the contract — the same rows
  * must be selected on every run (content-hash, not RNG).
  */
class SamplingSpec extends SparkSuite {

  test("sample_hash_bernoulli is deterministic and near its 1/8 rate") {
    val q = SparkEntry.queries("sample_hash_bernoulli")
    val a = q(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = q(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash sample must be identical across runs")
    val total = Tables.documents(spark, sf).count().toDouble
    val rate = a.size / total
    assert(rate > 0.05 && rate < 0.22, s"rate $rate far from 2/16")
  }

  test("sample_stratified_topk caps every stratum at 20") {
    val per = SparkEntry.queries("sample_stratified_topk")(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(per.nonEmpty && per.forall(_._2 <= 20), per.mkString(","))
  }

  test("split_train_valid_test partitions the whole corpus") {
    val rows = SparkEntry.queries("split_train_valid_test")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "valid", "test"), rows.toString)
    assert(rows.values.sum == Tables.documents(spark, sf).count())
    // 12/16 of the mass should be train (loose gate: 16 hash buckets)
    assert(rows("train") > rows("valid") && rows("train") > rows("test"))
  }

  test("text_pii_redact scrubs emails and phones, leaves clean rows alone") {
    val rows = SparkEntry.queries("text_pii_redact")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).toSeq == Seq(2L, 1L, 0L, 2L), rows.mkString("|"))
    assert(rows.filter(_._3 > 0).forall(r =>
      r._2.contains("[EMAIL]") || r._2.contains("[PHONE]")))
    assert(rows(2)._2 == "No personal data in this row at all")
    assert(!rows.exists(r => r._2.contains("@") ||
      r._2.matches(".*\\d{3}[-. ]\\d{3}[-. ]\\d{4}.*")))
  }
}
