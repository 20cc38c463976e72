package graft

import org.apache.spark.sql.functions._

/** Lexical + hybrid retrieval sanity on sf0.001 (hash parity with DuckDB
  * is covered by the oracle gate; these pin the semantics).
  */
class RetrievalSpec extends SparkSuite {

  test("text_bm25_topk returns docs that actually contain query terms") {
    val top = SparkEntry.queries("text_bm25_topk")(spark, sf)
    val rows = top.collect()
    assert(rows.length == 10)
    // scores non-increasing in returned order
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, scores.toString)
    // every hit contains at least one of the query terms
    val withText = top.join(Tables.documents(spark, sf), Seq("doc_id"))
      .select("text").collect().map(_.getString(0))
    assert(withText.length == 10)
    assert(withText.forall(t => Seq("stream", "window", "join")
      .exists(term => t.split(" ").contains(term))))
  }

  test("rag_hybrid_rrf fuses both arms deterministically") {
    val q = SparkEntry.queries("rag_hybrid_rrf")
    val a = q(spark, sf).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = q(spark, sf).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq, "fusion must be deterministic")
    assert(a.length == 10)
    // rrf bounds: a doc ranked 1 in BOTH arms scores 2/61; any doc in at
    // least one top-50 scores >= 1/110
    val max = BigDecimal(2.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(a.forall { case (_, s) => s > 0 && s <= max.toDouble + 1e-9 })
    // fusion is not just one arm: the fused ranking must differ from the
    // pure vector top-10 (BM25 evidence moved something)
    val vecTop = operators.Rag.knnTopK(spark, sf, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(a.map(_._1).toSeq != vecTop, "fusion identical to vector arm")
  }
}
