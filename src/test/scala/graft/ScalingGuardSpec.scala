package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed scaling curve (SCALING.json, written by
  * ScalingBench over sf0.1/sf0.5/sf1.0): every heavy kernel's fitted
  * growth exponent must stay ≤ the near-linear gate, or be named in the
  * exception map with its reason. This is the BenchGuard discipline
  * applied to the scale axis — a plan regression that turns a banded
  * join into an all-pairs join shows up here as an exponent jump even
  * when the sf0.1 wall barely moves.
  */
class ScalingGuardSpec extends AnyFunSuite {

  /** Kernels allowed past the gate, each with the measured reason.
    * Empty today: every committed kernel fits ≤ the gate.
    */
  private val exceptions: Map[String, String] = Map.empty

  // linear×log over a 10× span fits ≈ 1 + ln(ln10)/ln10 ≈ 1.16 at the
  // 100 TB-relevant tail; 1.35 leaves room for cache effects between
  // the fixture sizes without admitting anything quadratic-ish (an
  // all-pairs regression on 10× data fits ≈ 2)
  private val maxExponent = 1.35

  private def committed(): String = {
    val p = new ProcessBuilder("git", "show", "HEAD:SCALING.json")
      .redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    assert(p.waitFor() == 0,
      "HEAD has no SCALING.json — run `runMain graft.ScalingBench` and " +
        "commit the curve")
    out
  }

  test("fitExponent recovers known slopes") {
    val lin = ScalingBench.fitExponent(
      Seq((1.0, 2.0), (5.0, 10.0), (10.0, 20.0)))
    assert(math.abs(lin - 1.0) < 1e-9, s"linear fit: $lin")
    val quad = ScalingBench.fitExponent(
      Seq((1.0, 3.0), (5.0, 75.0), (10.0, 300.0)))
    assert(math.abs(quad - 2.0) < 1e-9, s"quadratic fit: $quad")
    val const = ScalingBench.fitExponent(
      Seq((1.0, 1.5), (5.0, 1.5), (10.0, 1.5)))
    assert(math.abs(const) < 1e-9, s"flat fit: $const")
  }

  test("committed SCALING.json covers the scaling set with complete walls") {
    val s = committed()
    for (q <- ScalingBench.scaleQueries) {
      assert(s.contains("\"" + q + "\":{"), s"$q missing from the curve")
    }
    assert(!s.contains(":null"),
      "a committed scaling wall or exponent is null — a kernel failed " +
        "at some scale; re-run and re-commit from a clean pass")
  }

  test("committed curve covers the growing-skew set and the 20x top end") {
    val s = committed()
    for (q <- ScalingBench.skewQueries)
      assert(s.contains("\"" + q + "\":{"),
        s"$q missing from the skew section")
    assert(s.contains("\"skew\":{"), "skew section missing")
    // the three steepest kernels carry the fourth (20x) point
    for (q <- ScalingBench.topEndQueries) {
      val entry = ("\"" + q + "\":\\{\"walls\":\\{([^}]*)\\}").r
      val walls = entry.findFirstMatchIn(s)
        .getOrElse(fail(s"$q missing")).group(1)
      assert(walls.contains("\"sf2.0\":"),
        s"$q lacks the 20x point: $walls")
    }
    // the skew sweep carries its own 20x top end (r19 verdict ask #4:
    // the link-prediction family's hot-middle cap is otherwise pinned
    // only at fixture-scale hub degrees)
    for (q <- ScalingBench.skewQueries) {
      val entry = ("\"" + q + "\":\\{\"walls\":\\{([^}]*)\\}").r
      val walls = entry.findFirstMatchIn(s)
        .getOrElse(fail(s"$q missing")).group(1)
      assert(walls.contains("\"skew2.0\":"),
        s"$q lacks the skew 20x point: $walls")
    }
  }

  test("hot-user streaming-state axis: keyed-state kernels stay " +
      "near-linear while one key's state mass grows with the corpus") {
    val s = committed()
    assert(s.contains("\"ustate\":{"),
      "ustate section missing — the skewed-state-partition axis " +
        "(one hot key growing with the corpus) is unguarded")
    for (q <- ScalingBench.hotUserQueries) {
      val entry =
        ("\"" + q + "\":\\{\"walls\":\\{[^}]*\\},\"rows\":\\{[^}]*\\}," +
          "\"exponent\":(-?[0-9.]+)\\}").r
      val e = entry.findFirstMatchIn(s)
        .getOrElse(fail(s"$q missing from ustate")).group(1).toDouble
      assert(e <= maxExponent,
        s"$q fits x^$e on the hot-user corpus (gate $maxExponent) — " +
          "a skewed state partition is super-linear")
    }
    // the band join under a growing hot key: the held head's state
    // mass must genuinely grow ~linearly (else the axis regressed to
    // measuring nothing)...
    val hot = "\"hot_rows_exponent\":(-?[0-9.]+)".r
      .findFirstMatchIn(s)
      .getOrElse(fail("no hot_rows_exponent")).group(1).toDouble
    assert(hot > 0.5 && hot <= maxExponent,
      s"hot-key state-mass exponent $hot outside (0.5, $maxExponent]")
    // ...and the wall may grow only as fast as the OUTPUT the corpus
    // makes genuinely quadratic in that mass (copies share timestamps,
    // so cross-copy pairs of a held user are all in-band): wall-bound-
    // by-output is the correct behavior; wall ABOVE output is not
    val entry = ("\"stream_stream_band_hot_user\":\\{.*?" +
      "\"exponent\":(-?[0-9.]+),\"rows_exponent\":(-?[0-9.]+)").r
    val m = entry.findFirstMatchIn(s)
      .getOrElse(fail("no band_hot_user exponents"))
    val wallExp = m.group(1).toDouble
    val rowsExp = m.group(2).toDouble
    assert(wallExp <= math.max(maxExponent, rowsExp + 0.35),
      s"hot-key band join wall fits x^$wallExp but its output only " +
        s"x^$rowsExp — super-linear work beyond the output")
  }

  test("state axis: walls and state_rows both grow near-linearly") {
    val s = committed()
    assert(s.contains("\"stream_stream_band_state\":{"),
      "state-axis entry missing — the stream-stream join family's " +
        "state growth is unguarded")
    val stateExp = "\"state_exponent\":(-?[0-9.]+)".r
      .findFirstMatchIn(s).getOrElse(fail("no state_exponent")).group(1)
      .toDouble
    // state must actually GROW with the widened bound (an exponent
    // near 0 would mean the axis regressed to measuring job init) and
    // stay at-most-linear-ish (the watermark is advancing; nothing
    // accumulates beyond the keys the bound admits)
    assert(stateExp > 0.5 && stateExp <= maxExponent,
      s"state_rows exponent $stateExp outside (0.5, $maxExponent]")
    // the wall exponent is the entry's "exponent" key (it precedes
    // "state_exponent", and the lazy match cannot land on the latter —
    // its quote-prefixed form differs)
    val entry = "\"stream_stream_band_state\":\\{.*?\"exponent\":(-?[0-9.]+)".r
    val we = entry.findFirstMatchIn(s)
      .getOrElse(fail("no state wall exponent")).group(1).toDouble
    assert(we <= maxExponent,
      s"state-axis wall exponent $we exceeds the $maxExponent gate")
  }

  test("every committed exponent is near-linear or a named exception") {
    val s = committed()
    val entry =
      ("\"([a-z0-9_]+)\":\\{\"walls\":\\{[^}]*\\},\"rows\":\\{[^}]*\\}," +
        "\"exponent\":(-?[0-9.]+)\\}").r
    val exps = entry.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(exps.nonEmpty, "no exponents parsed from SCALING.json")
    val offenders = exps.filter { case (q, e) =>
      e > maxExponent && !exceptions.contains(q)
    }
    assert(offenders.isEmpty,
      offenders.map { case (q, e) => f"$q fits x^$e%.2f" }
        .mkString("super-linear kernels: ", "; ",
          s" (gate $maxExponent; add a named exception ONLY with the " +
            "measured reason)"))
    // exceptions must still exist in the artifact (no stale absolution)
    for ((q, why) <- exceptions)
      assert(exps.contains(q), s"stale exception for $q ($why)")
  }
}
