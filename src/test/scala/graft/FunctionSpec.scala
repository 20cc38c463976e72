package graft

import graft.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit + property coverage of the custom expression surface. */
class FunctionSpec extends SparkSuite {

  private def vec(xs: Float*) = xs.toArray

  private def df1(a: Array[Float], b: Array[Float]) = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
  }

  private def cos(a: Array[Float], b: Array[Float]): Double =
    df1(a, b).select(cosine_sim(col("a"), col("b"))).head().getDouble(0)

  test("cosine_sim: self similarity is 1") {
    assert(math.abs(cos(vec(1f, 2f, 3f), vec(1f, 2f, 3f)) - 1.0) < 1e-12)
  }

  test("cosine_sim: symmetry and range") {
    val (a, b) = (vec(1f, 0f, -2f, 4f), vec(-3f, 1f, 0.5f, 2f))
    val ab = cos(a, b); val ba = cos(b, a)
    assert(ab == ba)
    assert(ab >= -1.0 - 1e-12 && ab <= 1.0 + 1e-12)
  }

  test("cosine_sim: orthogonal vectors score 0; zero vector scores 0") {
    assert(cos(vec(1f, 0f), vec(0f, 1f)) == 0.0)
    assert(cos(vec(0f, 0f), vec(1f, 1f)) == 0.0)
  }

  test("cosine_sim: dimension mismatch fails loudly") {
    val ex = intercept[Exception] { cos(vec(1f, 2f), vec(1f, 2f, 3f)) }
    assert(ex.getMessage != null)
  }

  test("try_cosine_sim: null on dimension mismatch, else same as cosine_sim") {
    // dirty-data semantics: a bad row scores NULL instead of killing the job
    val mismatch = df1(vec(1f, 2f), vec(1f, 2f, 3f))
      .select(try_cosine_sim(col("a"), col("b"))).head()
    assert(mismatch.isNullAt(0))
    val (a, b) = (vec(1f, 0f, -2f, 4f), vec(-3f, 1f, 0.5f, 2f))
    val same = df1(a, b)
      .select(try_cosine_sim(col("a"), col("b")),
        cosine_sim(col("a"), col("b"))).head()
    assert(same.getDouble(0) == same.getDouble(1))
    // null input propagates as null (not an error)
    import spark.implicits._
    val withNull = Seq((Option(vec(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(try_cosine_sim(col("a"), col("b"))).head()
    assert(withNull.isNullAt(0))
  }

  test("vector_dot / vector_norm / l2_distance agree with hand math") {
    val r = df1(vec(3f, 4f), vec(1f, 2f))
      .select(vector_dot(col("a"), col("b")), vector_norm(col("a")),
        l2_distance(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - math.sqrt(4 + 4)) < 1e-12)
  }

  test("feature_hash_embed: deterministic, unit-norm, bag-of-words") {
    import spark.implicits._
    val df = Seq("spark filters rows fast", "fast rows filters spark", "other")
      .toDF("t")
      .select(feature_hash_embed(col("t"), 64).as("e"))
    val rows = df.select(vector_norm(col("e"))).collect().map(_.getDouble(0))
    rows.foreach(n => assert(math.abs(n - 1.0) < 1e-6))
    val es = df.collect().map(_.getSeq[Float](0))
    assert(es(0) == es(1), "token order must not matter")
    assert(es(0) != es(2))
  }

  test("chunks: reassembly covers the text; overlap is honored") {
    import spark.implicits._
    val text = "abcdefghijklmnopqrstuvwxyz0123456789"
    val cs = Seq(text).toDF("t")
      .select(chunks(col("t"), 10, 3).as("c"))
      .head().getSeq[String](0)
    assert(cs.head == text.substring(0, 10))
    // stride = 7: each chunk repeats the prior chunk's last 3 chars
    cs.sliding(2).foreach { case Seq(p, n) => assert(p.takeRight(3) == n.take(3))
      case _ => () }
    assert(cs.map(_.drop(3)).mkString.length >= text.length - 3)
    assert(cs.last.takeRight(1) == text.takeRight(1))
  }

  test("word_ngrams: matches the HOF split formulation, keeps duplicates") {
    import spark.implicits._
    val texts = Seq("a b c d e", "x y", "one", "dup dup dup dup", "a  b c")
    val df = texts.toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val kernel = df.select(word_ngrams(col("text"), n).as("g"))
        .collect().map(_.getSeq[String](0).toList)
      val hof = df.selectExpr(
        s"""CASE WHEN size(split(text, ' ')) < $n THEN array()
           |ELSE transform(sequence(1, size(split(text, ' ')) - ${n - 1}),
           |  i -> array_join(slice(split(text, ' '), i, $n), ' ')) END AS g"""
            .stripMargin)
        .collect().map(_.getSeq[String](0).toList)
      assert(kernel.toSeq == hof.toSeq, s"n=$n")
    }
    // duplicates preserved in document order
    val g2 = Seq("dup dup dup").toDF("text")
      .select(word_ngrams(col("text"), 2)).head().getSeq[String](0)
    assert(g2 == Seq("dup dup", "dup dup"))
  }

  test("simhash64: identical texts collide; near texts are close; far are far") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val near = base.replace("lazy", "sleepy")
    val far = "completely different content about spark catalyst planning " * 8
    val hs = Seq(base, base, near, far).toDF("t")
      .select(simhash64(col("t"))).collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(0) == hs(1))
    assert(ham(hs(0), hs(2)) <= 12)
    assert(ham(hs(0), hs(3)) > 12)
  }

  test("winnow_fingerprint: near-dup docs share most fingerprints") {
    import spark.implicits._
    val base = "spark catalyst optimizes logical plans into physical plans " * 6
    val near = base + "tail edit"
    val fps = Seq(base, near).toDF("t")
      .select(winnow_fingerprint(col("t"), 8, 16).as("f"))
      .collect().map(_.getSeq[Long](0).toSet)
    val jac = fps(0).intersect(fps(1)).size.toDouble / fps(0).union(fps(1)).size
    assert(jac > 0.7, s"winnow jaccard $jac")
  }

  test("lsh_bucket: deterministic and in range") {
    import spark.implicits._
    val v = vec(Array.tabulate(64)(i => math.sin(i).toFloat): _*)
    val b = Seq((v, v)).toDF("a", "b")
      .select(lsh_bucket(col("a"), 12), lsh_bucket(col("b"), 12)).head()
    assert(b.getInt(0) == b.getInt(1))
    assert(b.getInt(0) >= 0 && b.getInt(0) < (1 << 12))
  }

  test("vector_avg: centroid of opposite vectors is zero") {
    import spark.implicits._
    val df = Seq(vec(2f, -4f), vec(-2f, 4f)).toDF("v")
    val c = df.agg(vector_avg(col("v"))).head().getSeq[Float](0)
    assert(c == Seq(0f, 0f))
  }

  test("sql registration: expr('cosine_sim(a, b)') works") {
    import spark.implicits._
    functions.registerAll(spark)
    val r = Seq((vec(1f, 0f), vec(1f, 0f))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS c").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
