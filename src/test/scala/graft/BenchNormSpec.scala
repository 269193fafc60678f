package graft

import org.scalatest.funsuite.AnyFunSuite

/** The normalizer's spike rules, on synthetic records — no Spark needed.
  * The load-bearing case is the round-10 driver record: a 3.3× anchor spike
  * at the pass-2 boundary while pass-2 query times stayed ≈ pass-1, which
  * the old unconditional `nominal/anchor` factor turned into phantom ~2×
  * speedups. The normalized record must never read faster than the
  * un-spiked passes' own minimum.
  */
class BenchNormSpec extends AnyFunSuite {

  private val Nominal = 533.5 // HostAnchor.NominalParallelMs shape

  test("transient boundary anchor spike with flat query times normalizes to raw") {
    // two passes, identical raw times; pass-2 bracketing anchor spiked 3.3x
    val p1 = Seq("qA" -> 1.0, "qB" -> 2.0, "qC" -> 4.0)
    val p2 = Seq("qA" -> 1.0, "qB" -> 2.0, "qC" -> 4.0)
    val (norm, slowdowns) = BenchNorm.normalize(
      Seq(p1, p2), Seq(Nominal, Nominal * 3.3), Nominal)
    val rawBestTotal = 7.0
    val normTotal = norm.map(_._2).sum
    // the old normalizer produced ~0.47 * 7.0 = 3.3 here (phantom speedup);
    // the corroborated one must not undercut the un-spiked passes' min
    assert(normTotal >= rawBestTotal - 1e-9,
      s"norm total $normTotal undercuts raw best $rawBestTotal")
    assert(math.abs(normTotal - rawBestTotal) < 1e-6)
    // pass 2's claimed 3.3x slowdown was granted only the observed ~1.0
    assert(math.abs(slowdowns(1) - 1.0) < 1e-9)
  }

  test("genuine slow window (queries inflated AND anchor high) normalizes down") {
    // pass 2 genuinely 2x slower across the board, anchor corroborates 2.2x
    val p1 = Seq("qA" -> 1.0, "qB" -> 2.0)
    val p2 = Seq("qA" -> 2.0, "qB" -> 4.0)
    val (norm, slowdowns) = BenchNorm.normalize(
      Seq(p1, p2), Seq(Nominal, Nominal * 2.2), Nominal)
    // granted slowdown = min(anchor 2.2, observed 2.0) = 2.0
    assert(math.abs(slowdowns(1) - 2.0) < 1e-9)
    // pass-2 normalized times equal pass-1 raw — min is unchanged
    assert(math.abs(norm.map(_._2).sum - 3.0) < 1e-6)
  }

  test("one regressed query does not read as host slowness (median, not mean)") {
    // only qC regressed 10x in pass 2; the anchor spiked too — but the
    // MEDIAN inflation over {1.0, 1.0, 10.0} is 1.0, so no discount: the
    // regression stays visible in qC's own row instead of being normalized
    // away as a host effect
    val p1 = Seq("qA" -> 1.0, "qB" -> 1.0, "qC" -> 1.0)
    val p2 = Seq("qA" -> 1.0, "qB" -> 1.0, "qC" -> 10.0)
    val (norm, slowdowns) = BenchNorm.normalize(
      Seq(p1, p2), Seq(Nominal, Nominal * 3.0), Nominal)
    assert(math.abs(slowdowns(1) - 1.0) < 1e-9)
    assert(norm.toMap.apply("qC") === 1.0) // min(1.0 raw-p1, 10.0 p2)
  }

  test("host faster than nominal scales raw up (anchor trusted when <= 1)") {
    val p1 = Seq("qA" -> 1.0)
    val (norm, slowdowns) = BenchNorm.normalize(
      Seq(p1), Seq(Nominal * 0.9), Nominal)
    assert(math.abs(slowdowns(0) - 0.9) < 1e-9)
    assert(math.abs(norm.head._2 - 1.0 / 0.9) < 1e-9)
  }

  test("whole-suite code regression is NOT normalized away (anchor caps the grant)") {
    // every query 2x slower in pass 2 but the anchor reads nominal: the
    // code did it — granted slowdown must stay 1.0 (anchorRatio <= 1 path)
    val p1 = Seq("qA" -> 1.0, "qB" -> 2.0)
    val p2 = Seq("qA" -> 2.0, "qB" -> 4.0)
    val (_, slowdowns) = BenchNorm.normalize(
      Seq(p1, p2), Seq(Nominal, Nominal), Nominal)
    assert(math.abs(slowdowns(1) - 1.0) < 1e-9)
  }

  test("run-wide slow window: the common anchor floor is granted without " +
    "in-run corroboration") {
    // EVERY pass ran inside a sustained 2x contention window: all anchors
    // read 2x nominal, and because the passes are equally slow, raw/best
    // inflation is ~1.0 — the in-run evidence CANNOT corroborate a
    // run-wide slowdown (there is no fast reference inside the run). The
    // anchors' common floor must be granted directly, or the record reads
    // a phantom 2x whole-suite regression.
    val p1 = Seq("qA" -> 2.0, "qB" -> 4.0)
    val p2 = Seq("qA" -> 2.0, "qB" -> 4.0)
    val (norm, slowdowns) = BenchNorm.normalize(
      Seq(p1, p2), Seq(Nominal * 2.0, Nominal * 2.0), Nominal)
    assert(slowdowns.forall(s => math.abs(s - 2.0) < 1e-9))
    assert(math.abs(norm.map(_._2).sum - 3.0) < 1e-9) // raw best 6.0 / 2
    // and a spike ABOVE the floor still needs corroboration: floor 2x
    // granted, the extra 1.5x on pass 2 is not (its queries stayed flat)
    val (_, sd2) = BenchNorm.normalize(
      Seq(p1, p2), Seq(Nominal * 2.0, Nominal * 3.0), Nominal)
    assert(math.abs(sd2(0) - 2.0) < 1e-9)
    assert(math.abs(sd2(1) - 2.0) < 1e-9)
  }

  test("median: empty input reads as no inflation; even/odd lengths") {
    assert(BenchNorm.median(Nil) === 1.0)
    assert(BenchNorm.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(BenchNorm.median(Seq(1.0, 2.0, 3.0, 10.0)) === 2.5)
  }

  test("passValid with in-pass samples: a mid-pass slow window degrades " +
    "the pass even when both bracketing anchors read clean") {
    // the r15 probe shape: boundaries 572/634 ms (≤1.2x nominal) around a
    // pass whose second half ran in a sustained contention window — the
    // pooled median carries the evidence the boundaries missed
    val b = (Nominal * 1.1, Nominal * 1.1)
    val clean = Seq.fill(8)(Nominal)
    val midWindow = Seq.fill(3)(Nominal) ++ Seq.fill(5)(Nominal * 1.5)
    val valid = BenchNorm.passValid(
      Seq(b, b, b), Seq(clean, midWindow, Seq.empty), Nominal)
    assert(valid === Seq(true, false, true)) // empty samples: boundary-only
    // a single blip among 8 samples is the transient min-of-3 absorbs —
    // it must NOT degrade the pass (median, not max)
    val oneBlip = Seq.fill(7)(Nominal) :+ Nominal * 3.0
    assert(BenchNorm.passValid(Seq((Nominal, Nominal)), Seq(oneBlip), Nominal)
      === Seq(true))
  }

  test("passValid: one spiked boundary cannot invalidate two clean passes " +
    "whose in-pass samples all read nominal (review r15)") {
    // HostAnchor.parallel is a single un-repeated run; r10 measured a real
    // transient 3.3x boundary spike. The spiked measurement sits in BOTH
    // adjacent passes' boundary pairs — pooled with ~8 clean in-pass
    // samples each, neither pass's median moves, so neither is degraded
    // and min-of-3 keeps all three passes.
    val clean = Seq.fill(8)(Nominal)
    val valid = BenchNorm.passValid(
      Seq((Nominal, Nominal * 3.3), (Nominal * 3.3, Nominal),
        (Nominal, Nominal)),
      Seq(clean, clean, clean), Nominal)
    assert(valid === Seq(true, true, true))
    // but without in-pass evidence a spiked boundary DOES degrade its
    // pass relative to a clean sibling (the boundary-only fallback)
    assert(BenchNorm.passValid(
      Seq((Nominal, Nominal * 3.3), (Nominal, Nominal)),
      Seq(Seq.empty, Seq.empty), Nominal)
      === Seq(false, true))
  }

  test("passValid: ambient drift does not eat passes — a pass over the " +
    "absolute gate but indistinguishable from its siblings stays valid") {
    // the r15 closing-run shape: the host sat ~1.17x nominal ALL session
    // (pooled medians 1.17/1.16/1.21x) — pass 3 tips the absolute gate by
    // 0.6% while being within 4% of the run's best pass. Nothing
    // distinguishes it; dropping it just degrades min-of-3 to min-of-2.
    val drift = Seq.fill(8)(Nominal * 1.17)
    val valid = BenchNorm.passValid(
      Seq((Nominal * 1.14, Nominal * 1.08), (Nominal * 1.08, Nominal * 1.20),
        (Nominal * 1.20, Nominal * 1.10)),
      Seq(drift, drift, drift.map(_ * 1.04)), Nominal)
    assert(valid === Seq(true, true, true))
    // while the r14 graded shape (passes 1-2 in a REAL window, pass 3
    // clean) still degrades exactly those two — the historical boundary
    // case: pass 2 reads 1.1036x vs the clean pass, clearing the STRICT
    // >1.1 relative gate by 0.4%
    val r14 = BenchNorm.passValid(
      Seq((1245.0, 678.0), (678.0, 867.0), (867.0, 533.0)),
      Seq(Seq.empty, Seq.empty, Seq.empty), 533.5)
    assert(r14 === Seq(false, false, true))
  }

  test("minPreferringValid: the graded min never silently comes from a " +
    "degraded pass") {
    // qA's all-pass min (1.0) sits in degraded pass 1; the record must
    // take the clean-pass 1.4 instead. qB's min is already clean.
    val p1 = Seq("qA" -> 1.0, "qB" -> 9.0)   // degraded
    val p2 = Seq("qA" -> 1.5, "qB" -> 3.0)   // valid
    val p3 = Seq("qA" -> 1.4, "qB" -> 3.2)   // valid
    val (rows, fellBack) = BenchNorm.minPreferringValid(
      Seq(p1, p2, p3), Seq(false, true, true))
    assert(rows.toMap === Map("qA" -> 1.4, "qB" -> 3.0))
    assert(fellBack.isEmpty)
    // a stage row whose build only triggered in the degraded pass falls
    // back to it — and is NAMED, so the record can say which mins are
    // host-window-tainted
    val p1b = p1 :+ ("stage:build" -> 4.0)
    val (rows2, fellBack2) = BenchNorm.minPreferringValid(
      Seq(p1b, p2, p3), Seq(false, true, true))
    assert(rows2.toMap.apply("stage:build") === 4.0)
    assert(fellBack2 === Set("stage:build"))
    // every pass degraded: all rows fall back (min over all passes), all
    // named — the record degrades loudly instead of dropping data
    val (rows3, fellBack3) = BenchNorm.minPreferringValid(
      Seq(p1, p2, p3), Seq(false, false, false))
    assert(rows3.toMap === Map("qA" -> 1.0, "qB" -> 3.0))
    assert(fellBack3 === Set("qA", "qB"))
  }

  test("windowSuspects: flags >1.25x monotone-tail rows with clean mins, " +
    "skips degraded-min rows and stage rows, scores clustering") {
    val allValid = Seq(true, true, true)
    def passesOf(rows: (String, Seq[Double])*): Seq[Map[String, Double]] =
      (0 to 2).map(i => rows.map { case (n, vs) => n -> vs(i) }.toMap)
    // qA grows 5x pass1->pass3 (the r15 q20 signature), min in pass 1
    // (valid) — flagged; qB flat — not flagged; qC grows only 1.2x — under
    // the threshold; stage rows never flagged (they execute inside their
    // trigger query, not at their own suite slot)
    val p = passesOf(
      "qA" -> Seq(0.63, 0.67, 3.23),
      "qB" -> Seq(1.0, 1.0, 1.0),
      "qC" -> Seq(1.0, 1.1, 1.2),
      "stage:build" -> Seq(1.0, 1.5, 2.0))
    val (flagged, _) = BenchNorm.windowSuspects(p, allValid)
    assert(flagged === Seq("qA"))

    // a row whose MIN fell in a degraded pass is degraded_fallback
    // territory, not a window suspect — no double-reporting
    val (flagged2, _) = BenchNorm.windowSuspects(
      passesOf("qA" -> Seq(0.63, 0.67, 3.23)),
      Seq(false, true, true))
    assert(flagged2.isEmpty)

    // clustering: adjacent flagged rows read stall-shaped (1.0); a lone
    // flagged row has no score
    val (f3, c3) = BenchNorm.windowSuspects(passesOf(
      "q01" -> Seq(1.0, 2.0, 3.0),
      "q02" -> Seq(1.0, 2.0, 3.0),
      "q03" -> Seq(1.0, 1.0, 1.0)), allValid)
    assert(f3 === Seq("q01", "q02") && c3 === Some(1.0))
    val (f4, c4) = BenchNorm.windowSuspects(passesOf(
      "q01" -> Seq(1.0, 2.0, 3.0),
      "q02" -> Seq(1.0, 1.0, 1.0)), allValid)
    assert(f4 === Seq("q01") && c4 === None)

    // a row missing from a pass (e.g. a build that didn't re-trigger)
    // cannot be classified — never flagged
    val missing = Seq(Map("qA" -> 1.0), Map.empty[String, Double],
      Map("qA" -> 3.0))
    assert(BenchNorm.windowSuspects(missing, allValid)._1.isEmpty)
  }
}
