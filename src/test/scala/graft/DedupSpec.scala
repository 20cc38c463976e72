package graft

import org.apache.spark.sql.functions._

/** Dedup + ANN behavioral checks on sf0.001 and constructed fixtures. */
class DedupSpec extends SparkSuite {

  test("dedup_minhash_lsh finds the pairs exact ngram-jaccard rates >= 0.5") {
    val byName = SparkEntry.queries
    val lsh = byName("dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth on the same corpus, full pair space via the oracle block
    // is doc_id < 200 — recompute exact pairs >= 0.5 there
    val exact = byName("dedup_ngram_jaccard")(spark, sf)
      .where(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup docs")
    val found = exact.intersect(lsh)
    assert(found.size.toDouble / exact.size >= 0.8,
      s"LSH recall ${found.size}/${exact.size} below 0.8")
  }

  test("dedup_simhash: hamming<=6 pairs include high-jaccard duplicates") {
    val sim = SparkEntry.queries("dedup_simhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .where(col("jac") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // recall >= 0.7: pairs beyond Hamming 6 are outside the sketch's
    // design radius (measured: one jac-0.91 pair sits at Hamming 10)
    val recall = exact.intersect(sim).size.toDouble / exact.size
    assert(recall >= 0.7, s"simhash recall $recall on jac>=0.9 pairs")
  }

  test("ann_lsh_topk and ann_ivf_topk recall vs exact brute force") {
    val exact = operators.Rag.knnTopK(spark, sf, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = SparkEntry.queries("ann_lsh_topk")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val ivf = SparkEntry.queries("ann_ivf_topk")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // OR-amplified (3 signature tables): expected recall ~0.97, gate 0.9
    assert(exact.intersect(lsh).size >= 9,
      s"LSH recall ${exact.intersect(lsh).size}/10")
    assert(exact.intersect(ivf).size >= 3,
      s"IVF recall ${exact.intersect(ivf).size}/10")
  }

  test("dedup_exact is idempotent") {
    val q = SparkEntry.queries("dedup_exact")
    val once = q(spark, sf)
    assert(once.count() == once.distinct().count())
  }
}
