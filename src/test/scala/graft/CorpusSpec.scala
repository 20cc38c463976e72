package graft

import org.apache.spark.sql.functions._

/** Corpus-curation ops: the invariants a pipeline depends on (one keeper
  * per dup group, shard budgets, mixture shares summing to 100, SCD2
  * interval chaining) — the oracle proves value parity, these prove the
  * *shape* contracts.
  */
class CorpusSpec extends SparkSuite {

  test("dedup_keep_best keeps exactly one doc per md5 group, the longest") {
    val rows = SparkEntry.queries("dedup_keep_best")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // keepers count == number of distinct texts
    val distinctTexts = Tables.documents(spark, sf)
      .select(md5(col("text"))).distinct().count()
    assert(rows.count(_._3) == distinctTexts)
    // every doc is in a group of size >= 1 and group sizes are consistent
    assert(rows.forall(_._2 >= 1))
  }

  test("pack_token_shards: shards are contiguous and respect the budget") {
    val rows = SparkEntry.queries("pack_token_shards")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val byShard = docs.groupBy(_._4)
      // shard ids are contiguous from 0
      val ids = byShard.keySet
      assert(ids == (0L until ids.size).toSet, s"non-contiguous: $ids")
      // a shard's tokens stay within budget + one straddling doc
      byShard.foreach { case (shard, ss) =>
        val tot = ss.map(_._3).sum
        val maxDoc = ss.map(_._3).max
        assert(tot < 4096 + maxDoc, s"shard $shard over budget: $tot")
      }
    }
  }

  test("mix_report_sources: token shares sum to ~100 and cover all cells") {
    val rows = SparkEntry.queries("mix_report_sources")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val nCells = Tables.documents(spark, sf)
      .select("lang", "source").distinct().count()
    assert(rows.length == nCells)
    val pctSum = rows.map(_._5).sum
    assert(math.abs(pctSum - 100.0) < 1e-3, s"pct sum $pctSum")
    assert(rows.map(_._3).sum == Tables.documents(spark, sf).count())
  }

  test("scd2_orders_history: intervals chain and one current row per key") {
    val rows = SparkEntry.queries("scd2_orders_history")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ck, hist) =>
      // exactly one open-ended current version per customer
      assert(hist.count(_._5) == 1, s"custkey $ck current rows != 1")
      // rows are emitted in validity order; each valid_to equals the next
      // row's valid_from (contiguous history, no gaps/overlaps)
      val sorted = hist.sortBy(h => (h._3, h._2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"custkey $ck: ${a._4} != next valid_from ${b._3}")
        case _ => ()
      }
      assert(sorted.last._4.isEmpty, s"custkey $ck last row must be open")
    }
  }

  test("ann_range_search returns all-and-only vectors above the floor") {
    val got = SparkEntry.queries("ann_range_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // recompute exactly via the engine's own cosine on one probe
    val e = Tables.embeddings(spark, sf)
    val probe = e.where(col("vec_id") === 0).select(col("embedding").as("pe"))
    val expect0 = e.crossJoin(probe)
      .select(col("vec_id"),
        round(graft.functions.cosine_sim(col("embedding"), col("pe")), 4)
          .as("c"))
      .where(col("c") >= 0.3 && col("vec_id") =!= 0)
      .collect().map(r => (0L, r.getLong(0))).toSet
    assert(got.filter(_._1 == 0L) == expect0)
  }

  test("mergeScd2Batch: incremental == batch after every batch; untouched rows carried") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("scd2_test_").toString
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
      def scd2Of(rows: Seq[(Long, Long, java.sql.Timestamp)]) =
        operators.Corpus.scd2Intervals(
          rows.toDF("o_custkey", "o_orderkey", "o_orderdate"))
          .orderBy("o_custkey", "valid_from", "o_orderkey")
          .collect().map(_.toSeq).toSeq
      def storeNow() = graft.streaming.Streams.storeRead(spark, store)
        .orderBy("o_custkey", "valid_from", "o_orderkey")
        .collect().map(_.toSeq).toSeq

      val b1 = Seq((1L, 10L, ts("1995-01-01")), (1L, 11L, ts("1996-01-01")),
        (2L, 20L, ts("1995-06-01")))
      operators.Streaming.mergeScd2Batch(
        b1.toDF("o_custkey", "o_orderkey", "o_orderdate"), store)
      assert(storeNow() == scd2Of(b1))

      // batch 2: new order for existing customer 1 (its chain must
      // re-close), brand-new customer 3, and a REDELIVERY of order 20
      // (must stay idempotent); customer 2 untouched-by-rebuild
      val b2 = Seq((1L, 12L, ts("1997-01-01")), (3L, 30L, ts("1996-06-01")),
        (2L, 20L, ts("1995-06-01")))
      operators.Streaming.mergeScd2Batch(
        b2.toDF("o_custkey", "o_orderkey", "o_orderdate"), store)
      assert(storeNow() == scd2Of(b1 ++ Seq(b2(0), b2(1))))
      // customer 1's 1996 row is now closed by the 1997 order
      val c1 = storeNow().filter(_.head == 1L)
      assert(c1.count(r => r(4) == true) == 1)
      assert(c1.exists(r => r(2) == "1996-01-01" && r(3) == "1997-01-01"))
    } finally {
      val root = java.nio.file.Paths.get(store)
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(root))(
        _.iterator().asScala.toSeq).reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("fn_regex counts agree with a direct split-based recount") {
    val rows = SparkEntry.queries("fn_regex")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, firstS, nS, redactedLen, _) =>
      if (nS > 0) assert(firstS.startsWith("s"))
      else assert(firstS.isEmpty)
      assert(redactedLen >= 0)
    }
    // replace is GLOBAL: every 's[a-z]+' run collapses to '#', so a doc
    // with n matches of total length L has redacted_len = len - L + n
    val doc = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pat = "s[a-z]+".r
    rows.take(50).foreach { case (id, _, nS, redactedLen, _) =>
      val text = doc(id)
      val ms = pat.findAllIn(text).toSeq
      assert(ms.size == nS, s"doc $id regex count")
      assert(redactedLen == text.length - ms.map(_.length).sum + ms.size,
        s"doc $id redacted length")
    }
  }

  test("contamination_ngram: eval docs excluded, flag == frac >= 0.05") {
    val rows = SparkEntry.queries("contamination_ngram")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 % 97 != 0), "eval docs must not be scored")
    rows.foreach { case (id, nGrams, nHit, frac, flag) =>
      assert(nHit <= nGrams && nGrams > 0, s"doc $id counts")
      // round(x, 4) is HALF_UP in Spark — compare within half an ulp of
      // the 4-decimal grid rather than re-deriving the rounding mode
      assert(math.abs(frac - nHit.toDouble / nGrams) <= 5.001e-5,
        s"doc $id frac")
      assert(flag == (nHit.toDouble / nGrams >= 0.05), s"doc $id flag")
    }
  }

  test("quality_filter_rules: keep is exactly the rule conjunction") {
    val rows = SparkEntry.queries("quality_filter_rules")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { case (id, rLen, rWord, rStop, rRep, keep) =>
      assert(keep == (rLen && rWord && rStop && rRep), s"doc $id keep")
    }
  }

  test("corpus_mix_rebalance: min lang keeps all, others downsample toward it") {
    val rows = SparkEntry.queries("corpus_mix_rebalance")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val nLangs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(rows.length == nLangs)
    val minDocs = rows.map(_._2).min
    rows.foreach { case (lang, docs, rate, kept) =>
      assert(kept <= docs, s"$lang kept > docs")
      if (docs == minDocs) assert(kept == docs, s"min lang $lang must keep all")
      // md5 coin is uniform: kept ≈ docs*rate within a binomial bound
      val expect = docs * rate
      val tol = 4 * math.sqrt(expect max 1.0) + 1
      assert(math.abs(kept - expect) <= tol, s"$lang kept=$kept expect=$expect")
    }
  }

  test("corpus_mix_temperature: T=2 rates are sqrt(min/n), tempered not truncated") {
    val rows = SparkEntry.queries("corpus_mix_temperature")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val nLangs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(rows.length == nLangs)
    val minDocs = rows.map(_._2).min
    rows.foreach { case (lang, docs, rate, kept) =>
      // bit-exact closed form: one division + one IEEE sqrt
      assert(rate == math.sqrt(minDocs.toDouble / docs), s"$lang rate")
      // temperature keeps MORE than equalization: sqrt(r) >= r for r in [0,1]
      assert(rate >= minDocs.toDouble / docs, s"$lang tempered below uniform")
      assert(kept <= docs, s"$lang kept > docs")
      if (docs == minDocs) assert(kept == docs, s"min lang $lang must keep all")
      val expect = docs * rate
      val tol = 4 * math.sqrt(expect max 1.0) + 1
      assert(math.abs(kept - expect) <= tol, s"$lang kept=$kept expect=$expect")
    }
  }

  test("tfidf top terms == brute-force recomputation per source") {
    val docs = Tables.documents(SparkSpec.spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, src, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (id, src, t))
    }
    val n = toks.map(_._1).distinct.length.toLong
    val df = toks.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.length.toLong).toMap
    val tf = toks.groupBy(t => (t._2, t._3)).view
      .mapValues(_.length.toLong).toMap
    val expected = tf.keys.groupBy(_._1).toSeq.flatMap { case (src, keys) =>
      keys.toSeq
        .map { case (s2, term) =>
          (s2, term, (tf((s2, term)) * n).toDouble / df(term))
        }
        .sortBy { case (_, term, score) => (-score, term) }
        .take(5)
    }.map { case (s2, term, score) => (s2, term) -> score }.toMap
    val got = SparkEntry.queries("corpus_tfidf_topterms")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(got.keySet == expected.keySet,
      s"sym-diff: ${(got.keySet diff expected.keySet).take(3)} / " +
        s"${(expected.keySet diff got.keySet).take(3)}")
    got.foreach { case (k, v) => assert(expected(k) == v, s"$k") }
  }

  test("BPE training reproduces the hand-computed merge sequence (golden)") {
    // The Sennrich-et-al. worked example: dict {low:5, lower:2, newest:6,
    // widest:3}. Hand-computed pair counts give merges, with the kernel's
    // documented tie-break (max count, then lexical (left, right)):
    //   1. (e,s)  9   (ties (s,t) 9 -> 'e' < 's')
    //   2. (es,t) 9
    //   3. (l,o)  7   (ties (o,w) 7 -> 'l' < 'o')
    //   4. (lo,w) 7
    //   5. (e,w)  6   (ties (n,e)/(w,est) 6 -> 'e' smallest left)
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = operators.Text.trainBpeOn(dict, nMerges = 5)
    assert(merges == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L)), merges.toString)
    // exhaustion: a single-word dict runs out of pairs before nMerges
    // and must stop rather than loop
    val tiny = operators.Text.trainBpeOn(Seq(("ab", 1L)), nMerges = 5)
    assert(tiny == Seq((1L, "a", "b", 1L)), tiny.toString)
  }

  test("dsir weights: target-language docs score above the raw average") {
    import org.apache.spark.sql.functions._
    val w = SparkEntry.queries("corpus_dsir_weights")(spark, sf)
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val joined = w.join(docs, "doc_id")
      .select(col("lang") === "en", col("weight_scaled"),
        col("n_tokens"))
      .collect()
    assert(joined.length == 500, s"one weight per doc, got ${joined.length}")
    // per-token mean weight: en (the target) must beat the rest — the
    // defining property of an importance weight toward the target
    def mean(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getLong(1).toDouble).sum /
        math.max(1.0, rows.map(_.getLong(2).toDouble).sum)
    val (en, rest) = joined.partition(_.getBoolean(0))
    assert(en.nonEmpty && rest.nonEmpty)
    assert(mean(en) > mean(rest),
      s"en per-token weight ${mean(en)} must exceed raw ${mean(rest)}")
  }

  test("waterfill: spends the budget up to integer remainder, caps whole") {
    val rows = SparkEntry.queries("corpus_token_waterfill")(spark, sf)
      .collect()
    assert(rows.length == 20, "one allocation per source")
    val budget = rows.map(_.getLong(2)).distinct
    assert(budget.length == 1 && budget.head > 0)
    val spent = rows.map(_.getLong(4)).sum
    val nUncapped = rows.count(!_.getBoolean(3))
    assert(spent <= budget.head,
      s"allocation $spent must never overshoot the budget ${budget.head}")
    assert(spent > budget.head - math.max(nUncapped, 1),
      s"undershoot beyond the division remainder: $spent vs ${budget.head}")
    // capped sources are taken whole; uncapped sources share one level
    rows.filter(_.getBoolean(3)).foreach(r =>
      assert(r.getLong(4) == r.getLong(1), "capped must take the inventory"))
    val levels = rows.filter(!_.getBoolean(3)).map(_.getLong(4)).distinct
    assert(levels.length <= 1, s"uncapped must share one level: $levels")
  }

  test("js divergence: all pairs, bounded by ln 2, near-zero on self-mix") {
    val rows = SparkEntry.queries("corpus_js_divergence")(spark, sf)
      .collect()
    // 20 sources -> C(20,2) ordered pairs, each exactly once with a < b
    assert(rows.length == 190, s"expected 190 pairs, got ${rows.length}")
    assert(rows.forall(r => r.getString(0) < r.getString(1)),
      "pairs must be ordered source_a < source_b")
    val ln2 = math.log(2.0)
    rows.foreach { r =>
      val js = r.getAs[Double]("js_divergence")
      // floor-quantized micro-logs can dip a hair under 0; ln 2 is the
      // hard JS ceiling
      assert(js > -1e-4 && js < ln2 + 1e-4,
        s"js(${r.getString(0)},${r.getString(1)})=$js out of [0, ln2]")
    }
    // the fixture sources share one generator, so every divergence must
    // sit far from the ln2 disjoint-support ceiling
    val worst = rows.map(_.getAs[Double]("js_divergence")).max
    assert(worst < 0.5 * ln2,
      s"same-generator sources should not approach ln2: worst=$worst")
  }

  test("tokenizer fertility: cross-gated against the per-doc BPE encode") {
    val fert = SparkEntry.queries("corpus_tokenizer_fertility")(spark, sf)
      .collect()
    assert(fert.nonEmpty)
    fert.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"),
        "BPE can only split words, never merge across them")
      assert(r.getAs[Double]("fertility") ==
        r.getAs[Long]("n_tokens").toDouble / r.getAs[Long]("n_words"))
      assert(r.getAs[Double]("chars_per_token") > 0.0)
    }
    // the per-language rollup must reproduce text_bpe_encode's per-doc
    // counts exactly (same trained merges, same fold)
    val perDoc = SparkEntry.queries("text_bpe_encode")(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "lang"),
        "doc_id")
      .groupBy("lang")
      .agg(sum("n_tokens").as("t"), sum("n_words").as("w"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    fert.foreach { r =>
      val (t, w) = perDoc(r.getString(0))
      assert(r.getAs[Long]("n_tokens") == t && r.getAs[Long]("n_words") == w,
        s"${r.getString(0)}: rollup disagrees with the per-doc encode")
    }
  }

  test("dsir resample: exact global quota, per-source accounting") {
    val rows = SparkEntry.queries("corpus_dsir_resample")(spark, sf)
      .collect()
    assert(rows.length == 20, "one row per source")
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == 500)
    assert(rows.map(_.getAs[Long]("n_selected")).sum == nDocs / 4,
      "the keep quota is exactly the global top quarter")
    rows.foreach { r =>
      assert(r.getAs[Long]("tokens_selected") <=
        r.getAs[Long]("tokens_total"))
      val share = r.getAs[Double]("doc_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("heaps law: cumulative curves monotone, beta in the sublinear band") {
    val rows = SparkEntry.queries("text_heaps_law")(spark, sf).collect()
    assert(rows.length == 10, s"ten checkpoints, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (1L to 10L))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    val voc = rows.map(_.getAs[Long]("vocab_cum"))
    assert(toks.sliding(2).forall { case Array(a, b) => b > a
      case _ => true }, "token curve must strictly grow")
    assert(voc.sliding(2).forall { case Array(a, b) => b >= a
      case _ => true }, "vocab curve must be nondecreasing")
    assert(voc.zip(toks).forall { case (v, t) => v <= t },
      "vocabulary can never exceed tokens read")
    val beta = rows.map(_.getAs[Double]("heaps_beta")).distinct
    assert(beta.length == 1, "beta must be one global constant")
    // new vocabulary must keep arriving (beta > 0) but sublinearly
    // (beta < 1) on any natural-ish corpus
    assert(beta.head > 0.0 && beta.head < 1.0, s"beta=${beta.head}")
  }

  test("yule k: nonnegative, K identity from exact moments per lang") {
    val rows = SparkEntry.queries("text_yule_k")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val v = r.getAs[Long]("n_types")
      assert(v >= 1 && n >= v)
      val k = r.getAs[Double]("yule_k")
      // K = 0 iff every type occurs once; repetitive corpora are > 0
      assert(k >= 0.0, s"${r.getString(0)}: K=$k")
      // upper pole: a single type repeated n times gives 1e4*(n-1)/n
      assert(k <= 10000.0, s"${r.getString(0)}: K=$k")
    }
  }

  test("word burstiness: top-20 by frequency, Fano nonnegative") {
    val rows = SparkEntry.queries("text_word_burstiness")(spark, sf)
      .collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val freqs = rows.map(_.getAs[Long]("n_tokens"))
    assert(freqs.sameElements(freqs.sortBy(-_)), "must be ranked")
    val nDocs = Tables.documents(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_freq") <= nDocs)
      assert(r.getAs[Long]("doc_freq") >= 1)
      assert(r.getAs[Double]("fano") >= 0.0)
    }
  }

  test("topk coverage: monotone to 1.0, checkpoints past vocab drop") {
    val rows = SparkEntry.queries("text_topk_coverage")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val ks = rows.map(_.getAs[Long]("top_k"))
    assert(ks.sameElements(ks.sorted))
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.sameElements(cov.sorted), "coverage must be monotone")
    assert(cov.forall(c => c > 0.0 && c <= 1.0))
    val vocab = rows.head.getAs[Long]("n_types")
    // exact row-count check: exactly the checkpoints within the
    // vocabulary survive, so a vocab < 50 provably drops the
    // out-of-range checkpoints (the old <= bound was vacuous)
    val expected = Seq(1L, 2L, 5L, 10L, 20L, 50L).count(_ <= vocab)
    assert(rows.length == expected,
      s"expected $expected checkpoints within vocab=$vocab, " +
        s"got ${rows.length}")
    assert(ks.forall(_ <= vocab),
      "checkpoints beyond the vocabulary must drop out")
  }
}
