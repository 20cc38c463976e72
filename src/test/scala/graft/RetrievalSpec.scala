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

  test("rag_mmr_rerank replays the greedy exactly; first pick is top-1") {
    val got = SparkEntry.queries("rag_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.length == 5)
    // independent replay: candidates = exact top-20 with embeddings
    val probe = Tables.embeddings(spark, sf).where(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val cand = Tables.embeddings(spark, sf).crossJoin(broadcast(probe))
      .where(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"),
        graft.functions.cosine_sim(col("embedding"), col("probe")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(20)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(c => (-c._3, c._1))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / na / nb
    }
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    val used = scala.collection.mutable.Set.empty[Long]
    (1 to 5).foreach { r =>
      // same tie-break as mmrSelect: iterate in (rel desc, id asc) order
      // (cand is already sorted that way) and keep the FIRST strict
      // maximum — a maxBy((score, -id)) would break exact-score ties by
      // id instead of pool order and flake on a tie across rel values
      val (id, emb, score) = cand.filterNot(c => used(c._1)).map { c =>
        val div = if (chosen.isEmpty) 0.0 else chosen.map(p => cos(c._2, p._2)).max
        (c._1, c._2, 0.7 * c._3 - 0.3 * div)
      }.reduceLeft((best, c) => if (c._3 > best._3) c else best)
      used += id; chosen += ((id, emb))
      assert(got(r - 1)._2 == id, s"rank $r expected $id, got ${got(r - 1)._2}")
      assert(math.abs(got(r - 1)._3 - math.rint(score * 1e6) / 1e6) < 1e-9,
        s"rank $r score")
    }
    // rank 1 must be the plain exact top-1
    assert(got.head._2 == operators.Rag.knnTopK(spark, sf, 1)
      .collect().head.getLong(0))
  }
}
