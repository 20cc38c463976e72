package graft

import org.apache.spark.sql.functions._

/** Closed-form fixtures for the Stats family kernels (Welch t, KS,
  * Benford digits, Gini, Zipf slope) and the resource-allocation link
  * predictor — each statistic checked against a hand/NumPy-computed
  * value on a fixture small enough to verify on paper.
  */
class StatsSpec extends SparkSuite {

  import operators.{Analytics, Stats}

  private def decs(xs: Seq[Double], grp: String) = {
    import spark.implicits._
    xs.map(x => (grp, BigDecimal(x).setScale(2))).toDF("grp", "x")
      .select(col("grp"), col("x").cast("decimal(12,2)").as("x"))
  }

  test("welch t matches the closed form on a two-sample fixture") {
    val g = decs(Seq(10.00, 12.00, 9.50, 11.25, 10.75), "a")
      .unionAll(decs(Seq(20.00, 19.00, 21.50, 18.25), "b"))
    val r = Stats.welchT(g, "a", "b").collect()(0)
    assert(r.getAs[Long]("n1") == 5 && r.getAs[Long]("n2") == 4)
    assert(math.abs(r.getAs[Double]("mean1") - 10.7) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_stat") - -10.821720881180333) < 1e-9,
      s"t=${r.getAs[Double]("t_stat")}")
    assert(math.abs(r.getAs[Double]("welch_df") - 5.2390980609584) < 1e-9,
      s"df=${r.getAs[Double]("welch_df")}")
  }

  test("KS statistic: 0 on identical samples, 1 on disjoint supports") {
    import spark.implicits._
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("grp", "x")
    val ks0 = Stats.ksStatistic(same, "a", "b")
      .select("ks_stat").distinct().collect()(0).getDouble(0)
    assert(ks0 == 0.0, s"identical samples gave ks=$ks0")
    val disj = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("grp", "x")
    val ks1 = Stats.ksStatistic(disj, "a", "b")
      .select("ks_stat").distinct().collect()(0).getDouble(0)
    assert(ks1 == 1.0, s"disjoint supports gave ks=$ks1")
  }

  test("benford digits: extraction, shares, and Benford expectation") {
    import spark.implicits._
    // digits: 123.45→1, 1.00→1, 9876.50→9, 20.10→2; 0.99 filtered (<1)
    val df = Seq(123.45, 1.00, 9876.50, 20.10, 0.99).toDF("v")
    val rows = Stats.benfordDigits(df, "v").collect()
    val byDigit = rows.map(r => r.getInt(0) ->
      (r.getLong(1), r.getAs[Double]("observed"),
        r.getAs[Double]("expected"))).toMap
    assert(byDigit.keySet == Set(1, 2, 9))
    assert(byDigit(1)._1 == 2 && byDigit(2)._1 == 1 && byDigit(9)._1 == 1)
    assert(byDigit(1)._2 == 0.5)
    assert(byDigit(1)._3 == 0.3010299956639812)
    assert(byDigit(9)._3 == 0.04575749056067514)
  }

  test("gini: 0 for equal shares, (n-1)/n for single-owner concentration") {
    import spark.implicits._
    val cr = (Seq(("eq", 1L, 25.0), ("eq", 2L, 25.0), ("eq", 3L, 25.0),
        ("eq", 4L, 25.0)) ++
      Seq(("one", 1L, 0.0), ("one", 2L, 0.0), ("one", 3L, 0.0),
        ("one", 4L, 10.0)))
      .toDF("seg", "ck", "rev0")
      .select(col("seg"), col("ck"),
        col("rev0").cast("decimal(18,2)").as("rev"))
    val got = Stats.giniBySegment(cr).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(got("eq") == 0.0, s"equal shares gave ${got("eq")}")
    assert(got("one") == 0.75, s"single owner gave ${got("one")}")
  }

  test("zipf slope ≈ -1 on a synthetic 1000/rank frequency table") {
    import spark.implicits._
    // token k appears round(1000/k) times, k = 1..50: exact Zipf up to
    // rounding, so the fitted log-log slope sits within a few percent
    // of -1 (quantization + rounding noise, deterministic).
    val toks = (1 to 50).flatMap(k =>
      Seq.fill(math.round(1000.0 / k).toInt)(f"tok$k%03d"))
    val slope = Stats.zipfSlope(toks.toDF("t"), topN = 50)
      .collect()(0).getAs[Double]("zipf_slope")
    assert(math.abs(slope - -1.0) < 0.05, s"slope=$slope")
  }

  test("chi-square matches the closed form on a 2x2 contingency fixture") {
    import spark.implicits._
    // table [[10,20],[30,40]] → χ² = 0.79365079…, V = sqrt(χ²/(100·1));
    // the nano-unit quantization bounds the total's error by 4e-9
    val obs = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val rows = Stats.chiSquare(obs.toDF("a", "b")).collect()
    assert(rows.length == 4)
    val chi = rows.head.getAs[Double]("chi_square")
    assert(math.abs(chi - 0.7936507936507936) < 1e-6, s"chi2=$chi")
    val v = rows.head.getAs[Double]("cramers_v")
    assert(math.abs(v - math.sqrt(chi / 100.0)) < 1e-12, s"v=$v")
    // the o=10 cell: E = 30*40/100 = 12, contrib = 4/12
    val c11 = rows.find(r => r.getAs[String]("a") == "r1"
      && r.getAs[String]("b") == "c1").get
    assert(c11.getAs[Long]("o") == 10 && c11.getAs[Double]("e") == 12.0)
  }

  test("mann-whitney: tie-averaged ranks give the textbook U on a fixture") {
    import spark.implicits._
    // a = [1,2,2,3], b = [2,4,5]: R1 = 12 (avg rank of the 2-tie = 3),
    // U1 = R1 − n1(n1+1)/2 = 2, U2 = n1·n2 − U1 = 10
    val df = (Seq(1.0, 2.0, 2.0, 3.0).map(("A", _)) ++
      Seq(2.0, 4.0, 5.0).map(("R", _))).toDF("grp", "x")
    val r = Stats.mannWhitney(df, "A", "R").collect()(0)
    assert(r.getAs[Long]("n1") == 4 && r.getAs[Long]("n2") == 3)
    assert(r.getAs[Double]("u1") == 2.0, s"u1=${r.getAs[Double]("u1")}")
    assert(r.getAs[Double]("u2") == 10.0, s"u2=${r.getAs[Double]("u2")}")
    val z = r.getAs[Double]("z_stat")
    assert(z < 0 && !z.isNaN && !z.isInfinite, s"z=$z")
  }

  test("spearman: 1.0 on monotone data, tie-averaged textbook value on " +
      "a tied fixture") {
    import spark.implicits._
    // strictly monotone (no ties): rho = 1 exactly
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 70.0))
      .toDF("x", "y")
    val r1 = Stats.spearman(mono, "x", "y").collect()(0)
    assert(r1.getAs[Long]("n_rows") == 4)
    assert(r1.getAs[Double]("spearman_rho") == 1.0,
      s"rho=${r1.getAs[Double]("spearman_rho")}")
    // anti-monotone: rho = -1 exactly
    val anti = Seq((1.0, 9.0), (2.0, 7.0), (3.0, 3.0)).toDF("x", "y")
    assert(Stats.spearman(anti, "x", "y").collect()(0)
      .getAs[Double]("spearman_rho") == -1.0)
    // tied fixture x=[1,2,2,3], y=[1,1,2,3]: avg ranks
    // rx=[1,2.5,2.5,4], ry=[1.5,1.5,3,4] → Pearson(rx,ry) =
    // cov/sd·sd = 3.25/sqrt(4.5·4.25) ≈ 0.743294146...; with the ×2
    // integer ranks both engines compute the same double — pin to the
    // closed form evaluated the same way
    val tied = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (3.0, 3.0))
      .toDF("x", "y")
    val rho = Stats.spearman(tied, "x", "y").collect()(0)
      .getAs[Double]("spearman_rho")
    val expected = {
      val n = 4.0
      // doubled ranks: rx2=[2,5,5,8], ry2=[3,3,6,8]
      val rx = Seq(2.0, 5.0, 5.0, 8.0); val ry = Seq(3.0, 3.0, 6.0, 8.0)
      val sx = rx.sum; val sy = ry.sum
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    assert(math.abs(rho - expected) < 1e-12, s"rho=$rho expected=$expected")
  }

  test("resource allocation: exact 1/deg(w) integer scoring, adjacency excluded") {
    import spark.implicits._
    // path-ish graph: edges (1,2),(2,3),(2,4),(3,4); degrees 1:1 2:3
    // 3:2 4:2. Non-adjacent pairs with common neighbors: (1,3) via {2},
    // (1,4) via {2} → both score 1/3 exactly (floor(1e12/3)); adjacent
    // (3,4) shares {2} too but must be excluded.
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val got = Analytics.resourceAllocationOf(edges, topN = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == Set((1L, 3L, 333333333333L), (1L, 4L, 333333333333L)),
      got.mkString(", "))
  }

  test("benjamini-hochberg: step-up rejections are a prefix of the p-order") {
    val rows = SparkEntry.queries("stats_benjamini_hochberg")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // output is already in k order; p-values must be sorted and in (0,1)
    val ps = rows.map(_.getDouble(4))
    assert(ps.sameElements(ps.sorted), "rows must arrive in p-rank order")
    assert(ps.forall(p => p > 0.0 && p <= 1.0), ps.mkString(", "))
    // THE BH structural invariant: the rejection set is a prefix of the
    // rank order — a significant k above a non-significant k' < k would
    // violate step-up
    val sig = rows.map(_.getBoolean(6))
    assert(!sig.sliding(2).exists { case Array(a, b) => !a && b
      case _ => false },
      "rejections must be a prefix of the p-order")
    // every rejected k satisfies its own BH bound's transitive closure:
    // p_(k) <= kmax*q/m for the largest rejected kmax
    val m = rows.length
    val kmax = sig.count(identity)
    if (kmax > 0)
      assert(rows(kmax - 1).getDouble(4) <= kmax.toDouble * 0.1 / m)
  }

  test("brown-forsythe: F over median deviations is finite and positive") {
    val r = SparkEntry.queries("stats_brown_forsythe")(spark, sf).head()
    assert(r.getLong(0) == 5, "five priority groups expected")
    val n = Tables.orders(spark, sf).count()
    assert(r.getLong(1) == n, s"n_total must be the order count $n")
    val f = r.getDouble(2)
    assert(!f.isNaN && !f.isInfinite && f >= 0.0, s"f_stat=$f")
  }

  test("kendall tau-b: sign/bounds, pair accounting, and one fact scan") {
    val df = SparkEntry.queries("stats_kendall_tau")(spark, sf)
    val r = df.head()
    val n = r.getAs[Long]("n_rows")
    assert(n == Tables.lineitem(spark, sf).count())
    val conc = r.getAs[Long]("concordant")
    val disc = r.getAs[Long]("discordant")
    assert(conc >= 0 && disc >= 0 && conc + disc <= n * (n - 1) / 2,
      s"conc=$conc disc=$disc n=$n")
    val tau = r.getAs[Double]("kendall_tau_b")
    assert(tau >= -1.0 && tau <= 1.0, s"tau=$tau")
    // closed form on a perfectly concordant fixture: tau-b = 1
    import spark.implicits._
    val mono = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0))
      .toDF("a", "b")
    val tm = Stats.kendallTau(mono, "a", "b").head()
    assert(tm.getAs[Long]("concordant") == 6 &&
      tm.getAs[Long]("discordant") == 0 &&
      tm.getAs[Double]("kendall_tau_b") == 1.0)
    // all five cell-frame consumers must land on ONE scan of the fact
    // table via canonical exchange reuse — the claim the 100 TB plan
    // rests on
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    val reused = plan.contains("ReusedExchange")
    assert(reused || scans <= 1,
      s"expected exchange reuse over the cell frame; scans=$scans")
  }

  test("kruskal-wallis: H bounds and tie correction direction") {
    val r = SparkEntry.queries("stats_kruskal_wallis")(spark, sf).head()
    val nLines = Tables.lineitem(spark, sf).count()
    assert(r.getAs[Long]("n_total") == nLines)
    val h = r.getAs[Double]("h_stat")
    val hc = r.getAs[Double]("h_tie_corrected")
    assert(h >= 0.0, s"h=$h")
    // ties factor is in (0,1], so the corrected H can only grow
    assert(hc >= h, s"h=$h hc=$hc")
    // H is bounded by n-1 (attained when every group is a distinct block)
    assert(hc <= nLines.toDouble, s"hc=$hc")
  }

  test("ols two-factor: recovers an exact linear law with r2 = 1") {
    import spark.implicits._
    // y = 3 + 2*x1 - 5*x2 exactly, in cent units (x100)
    val rows = for (a <- 1 to 5; b <- 1 to 4) yield {
      val y = 3.0 + 2.0 * a - 5.0 * b
      ("k", (a * 100).toLong, (b * 100).toLong, math.round(y * 100))
    }
    val fit = Stats.olsTwoFactor(
      rows.toDF("p_brand", "x1", "x2", "y"), "p_brand").head()
    assert(math.abs(fit.getAs[Double]("beta_qty") - 2.0) < 1e-9)
    assert(math.abs(fit.getAs[Double]("beta_disc") - -5.0) < 1e-9)
    assert(math.abs(fit.getAs[Double]("intercept") - 3.0) < 1e-6)
    assert(math.abs(fit.getAs[Double]("r_squared") - 1.0) < 1e-12)
    // and on the real tables: every brand's r2 in [0, 1], det nonzero
    val real = SparkEntry.queries("stats_ols_two_factor")(spark, sf)
      .collect()
    assert(real.length == 25)
    assert(real.forall { r =>
      val r2 = r.getAs[Double]("r_squared")
      !r2.isNaN && r2 >= -1e-12 && r2 <= 1.0 + 1e-12
    })
  }

  test("permutation test: p-value lattice and label accounting") {
    val r = SparkEntry.queries("stats_permutation_test")(spark, sf).head()
    val (na, nr) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_r"))
    val nAR = Tables.lineitem(spark, sf)
      .where(col("l_returnflag").isin("A", "R")).count()
    assert(na + nr == nAR, s"$na + $nr != $nAR")
    assert(r.getAs[Long]("b_replicas") == 50)
    val ne = r.getAs[Long]("n_extreme")
    assert(ne >= 0 && ne <= 50)
    // the add-one p-value is exactly (1 + ne) / 51 — a 51-point lattice
    val p = r.getAs[Double]("p_value")
    assert(p == (1.0 + ne) / 51.0, s"p=$p ne=$ne")
    assert(p > 0.0 && p <= 1.0)
  }

  test("decision stump: impurity recomputation and argmin flag") {
    val rows = SparkEntry.queries("stats_decision_stump")(spark, sf)
      .collect()
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    val pTot = li.where(col("l_returnflag") === "R").count()
    assert(rows.length == 49, "50-value domain -> 49 proper splits")
    val nls = rows.map(_.getAs[Long]("n_left"))
    assert(nls.sliding(2).forall { case Array(a, b) => b > a
      case _ => true }, "cumulative left size must strictly grow")
    // recompute weighted Gini from the output's own counts
    rows.foreach { r =>
      val nl = r.getAs[Long]("n_left"); val pl = r.getAs[Long]("pos_left")
      val nr = n - nl; val pr = pTot - pl
      val exp = ((nl - (pl.toDouble * pl + (nl - pl).toDouble * (nl - pl))
        / nl) + (nr - (pr.toDouble * pr + (nr - pr).toDouble * (nr - pr))
        / nr)) / n
      assert(math.abs(r.getAs[Double]("gini") - exp) < 1e-12,
        s"t=${r.get(0)}: ${r.getAs[Double]("gini")} vs $exp")
    }
    val minG = rows.map(_.getAs[Double]("gini")).min
    val best = rows.filter(_.getAs[Boolean]("is_best"))
    assert(best.nonEmpty &&
      best.forall(_.getAs[Double]("gini") == minG),
      "is_best must flag exactly the argmin rows")
  }

  test("sample size: closed-form power analysis from exact moments") {
    val r = SparkEntry.queries("stats_sample_size")(spark, sf).head()
    val n = r.getAs[Long]("n_per_arm")
    assert(n >= 1, s"n_per_arm=$n")
    // recompute from the output's own delta and pooled variance
    val z = 1.9599639845400545 + 0.8416212335729143
    val d = r.getAs[Double]("delta"); val v = r.getAs[Double]("var_pooled")
    assert(v > 0.0 && d != 0.0)
    assert(n == math.ceil(2.0 * v * z * z / (d * d)).toLong,
      s"formula mismatch: $n")
    // a bigger effect needs fewer samples: sanity lower bound
    assert(n.toDouble >= 2.0 * v * z * z / (d * d))
  }

  test("tost: one-sided pair geometry and the equivalence verdict") {
    val r = SparkEntry.queries("stats_tost_equivalence")(spark, sf).head()
    val (tl, tu) = (r.getAs[Double]("t_lower"), r.getAs[Double]("t_upper"))
    val se = r.getAs[Double]("se")
    // (diff + 1)/se + (1 - diff)/se collapses to 2/se
    assert(math.abs(tl + tu - 2.0 / se) < 1e-9, s"$tl + $tu vs ${2 / se}")
    val p = r.getAs[Double]("p_tost")
    def pOne(t: Double) = 0.5 * (1 - t / math.sqrt(t * t + math.Pi / 2))
    assert(math.abs(p - math.max(pOne(tl), pOne(tu))) < 1e-12)
    assert(p > 0.0 && p < 1.0)
    assert(r.getAs[Boolean]("equivalent") == (p <= 0.05))
  }

  test("runs test: run-count bounds and the exact mean formula") {
    val r = SparkEntry.queries("stats_runs_test")(spark, sf).head()
    val n1 = r.getAs[Long]("n_above"); val n2 = r.getAs[Long]("n_below")
    val runs = r.getAs[Long]("n_runs")
    assert(n1 > 0 && n2 > 0)
    // a run sequence over two symbols is bounded by [2, n] (given both
    // symbols occur) and by the alternation cap 2*min+1
    assert(runs >= 2 && runs <= n1 + n2)
    assert(runs <= 2 * math.min(n1, n2) + 1)
    val mu = r.getAs[Double]("mu_runs")
    assert(mu == 1.0 + (2.0 * n1 * n2) / (n1 + n2), s"mu=$mu")
    val z = r.getAs[Double]("z_stat")
    assert(!z.isNaN && !z.isInfinite)
  }

  test("anova f: partitioned sums of squares and the F/eta identities") {
    val r = SparkEntry.queries("stats_anova_f")(spark, sf).head()
    assert(r.getAs[Long]("n_total") == Tables.orders(spark, sf).count())
    assert(r.getAs[Long]("k_groups") == 5)
    val ssb = r.getAs[Double]("ss_between")
    val ssw = r.getAs[Double]("ss_within")
    assert(ssb >= 0.0 && ssw > 0.0)
    val f = r.getAs[Double]("f_stat")
    assert(f >= 0.0 && !f.isInfinite)
    assert(r.getAs[Double]("eta_sq") == ssb / (ssb + ssw))
  }

  test("jarque-bera: moment bounds and the JB closed form") {
    val r = SparkEntry.queries("stats_jarque_bera")(spark, sf).head()
    val n = r.getAs[Long]("n")
    assert(n == Tables.lineitem(spark, sf).count())
    val mu = r.getAs[Double]("mean_qty")
    assert(mu >= 1.0 && mu <= 50.0)
    val sk = r.getAs[Double]("skewness")
    val ku = r.getAs[Double]("kurtosis_excess")
    // a bounded uniform-ish domain: near-zero skew, platykurtic
    assert(math.abs(sk) < 1.0 && ku < 0.0, s"skew=$sk kurt=$ku")
    assert(r.getAs[Double]("jb_stat") ==
      n.toDouble / 6.0 * (sk * sk + ku * ku / 4.0))
  }

  test("cohens d: hedges shrinkage identity and sign agreement") {
    val r = SparkEntry.queries("stats_cohens_d")(spark, sf).head()
    val n = r.getAs[Long]("n_a") + r.getAs[Long]("n_r")
    val d = r.getAs[Double]("cohens_d")
    val g = r.getAs[Double]("hedges_g")
    assert(g == d * (1.0 - 3.0 / (4.0 * n - 9.0)))
    assert(math.abs(g) < math.abs(d), "g must shrink d toward 0")
    assert(math.signum(g) == math.signum(d))
    assert((r.getAs[Double]("mean_a") - r.getAs[Double]("mean_r"))
      .sign == d.sign)
  }

  test("point-biserial: correlation bounds and cell accounting") {
    val r = SparkEntry.queries("stats_point_biserial")(spark, sf).head()
    assert(r.getAs[Long]("n_returned") + r.getAs[Long]("n_kept")
      == r.getAs[Long]("n"))
    val rpb = r.getAs[Double]("r_pb")
    assert(rpb >= -1.0 && rpb <= 1.0)
    // sign must follow the mean difference
    assert(math.signum(rpb) == math.signum(
      r.getAs[Double]("mean_returned") - r.getAs[Double]("mean_kept")))
  }

  test("mcnemar halves: 2x2 accounting and the corrected chi-square") {
    val r = SparkEntry.queries("stats_mcnemar_halves")(spark, sf).head()
    val cells = Seq("n_both", "n_h1_only", "n_h2_only", "n_neither")
      .map(r.getAs[Long])
    assert(cells.forall(_ >= 0))
    assert(cells.sum == Tables.customer(spark, sf).count(),
      "cells must partition the customer base")
    val b = r.getAs[Long]("n_h1_only"); val c = r.getAs[Long]("n_h2_only")
    if (b + c > 0) {
      val chi = r.getAs[Double]("chi2_cc")
      val e = math.abs(b - c) - 1.0
      assert(chi == e * e / (b + c))
    }
  }

  test("mood median: balanced split accounting and one global chi2") {
    val rows = SparkEntry.queries("stats_mood_median")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val chi = rows.map(_.getAs[Double]("chi2_stat")).distinct
    assert(chi.length == 1 && chi.head >= 0.0)
    val above = rows.map(_.getAs[Long]("n_above")).sum
    val below = rows.map(_.getAs[Long]("n_below")).sum
    val total = Tables.lineitem(spark, sf).count()
    assert(above + below <= total, "median ties must only DROP rows")
    assert(above > 0 && below > 0)
    // expected counts preserve each group's row total
    rows.foreach { r =>
      val o = r.getAs[Long]("n_above") + r.getAs[Long]("n_below")
      val e = r.getAs[Double]("e_above") + r.getAs[Double]("e_below")
      assert(math.abs(e - o) < 1e-6, s"row-total drift: $e vs $o")
    }
  }

  test("cochran q: era totals bounded by subjects, Q nonnegative") {
    val r = SparkEntry.queries("stats_cochran_q")(spark, sf).head()
    val n = r.getAs[Long]("n_customers")
    val cs = Seq("n_era1", "n_era2", "n_era3").map(r.getAs[Long])
    assert(cs.forall(c => c >= 0 && c <= n))
    // every counted customer ordered at least once in some era
    assert(cs.sum >= n)
    val q = r.getAs[Double]("q_stat")
    assert(q >= 0.0 && !q.isInfinite, s"q=$q")
  }

  test("theil-sen: complete pair lattice, slope within the count range") {
    val r = SparkEntry.queries("ts_theil_sen_weekly")(spark, sf).head()
    val nw = r.getAs[Long]("n_weeks")
    assert(r.getAs[Long]("n_pairs") == nw * (nw - 1) / 2,
      "every week pair must contribute exactly one slope")
    val s = r.getAs[Double]("sen_slope")
    assert(!s.isNaN && !s.isInfinite)
    // a median weekly-count slope cannot exceed the count range per week
    assert(math.abs(s) < 1e6)
  }

  test("cohen kappa: confusion cells partition the corpus and kappa " +
      "matches the exact BIGINT closed form") {
    val r = SparkEntry.queries("stats_cohen_kappa")(spark, sf).head()
    val n = r.getAs[Long]("n_docs")
    val (n11, n10, n01, n00) = (r.getAs[Long]("n11"),
      r.getAs[Long]("n10"), r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n11 + n10 + n01 + n00 == n,
      "confusion cells must partition the corpus")
    assert(n == Tables.documents(spark, sf).count())
    // the fixture raters disagree sometimes — all four cells live, so
    // kappa is measuring agreement, not a degenerate marginal
    assert(n10 + n01 > 0, "raters never disagree — degenerate fixture")
    assert(n11 > 0 && n00 > 0)
    val peNum = BigInt(n11 + n10) * BigInt(n11 + n01) +
      BigInt(n01 + n00) * BigInt(n10 + n00)
    val kappa = r.getAs[Double]("kappa")
    assert(kappa == (BigInt(n) * BigInt(n11 + n00) - peNum).toDouble
      / (BigInt(n) * BigInt(n) - peNum).toDouble,
      "kappa must be the one-division closed form of the exact cells")
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("psi drift: halves cover the stream, bins populated, psi " +
      "nonnegative up to quantization") {
    val r = SparkEntry.queries("stats_psi_drift")(spark, sf).head()
    val (nr, nc) = (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"))
    assert(nr > 0 && nc > 0, "both halves must be populated")
    assert(nr + nc == Tables.events(spark, sf).count(),
      "halves must cover the stream exactly")
    assert(r.getAs[Long]("n_bins") >= 2)
    // every true PSI term is >= 0 ((pa-pb) and ln(pa/pb) share sign);
    // the nano quantization can push a near-zero term one ulp under
    val psi = r.getAs[Double]("psi")
    assert(psi >= -1e-5, s"psi $psi materially negative")
    assert(psi < 25.0)
  }

  test("kmeans 1d: ordered centroids partition the price domain") {
    val rows = SparkEntry.queries("stats_kmeans_1d")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    val cents = rows.map(_.getDouble(2))
    assert(cents.sameElements(cents.sorted),
      s"centroids must be ordered after Lloyd rounds: ${cents.toSeq}")
    assert(rows.map(_.getLong(1)).sum ==
      Tables.orders(spark, sf).count(), "clusters must partition orders")
    val (mn, mx) = {
      val r = Tables.orders(spark, sf)
        .agg(min(col("o_totalprice")), max(col("o_totalprice"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    assert(cents.forall(c => c >= mn && c <= mx))
    assert(rows.forall(_.getDouble(3) >= 0.0), "inertia must be nonnegative")
  }
}
