package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Opt-in continuous reproduction of the north rule's scaling-efficiency
 * evidence (BASELINE.md): the same dedup job at N/4 and N cores on the
 * same input must scale at ≥ 0.7 efficiency. Measured at 2→8 cores —
 * the regime where this host's memory bandwidth scales with threads
 * (the in-sandbox model of adding executors; 8→32 is capped by the
 * single shared memory controller, see BENCH/BASELINE.md).
 *
 * Opt-in (SPARK_GRAFT_SCALING_SPEC=1) because a full measurement costs
 * minutes; the steal/bandwidth canary gates CANCEL the test loudly in
 * contended host windows instead of recording a corrupted number.
 */
class ScalingSpec extends AnyFunSuite {

  test("N/4->N dedup scaling efficiency >= 0.7 " +
    "(opt-in: SPARK_GRAFT_SCALING_SPEC=1, canary-gated)") {
    assume(sys.env.get("SPARK_GRAFT_SCALING_SPEC").contains("1"),
      "opt-in scaling gate skipped — set SPARK_GRAFT_SCALING_SPEC=1 to run")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // EXACTLY the bench's measured configuration (374.6k docs total):
    // at this corpus the 2-core leg is stable across windows (min
    // 144.9-151.3 s over three independent runs) and the 2→8 pair
    // reproduced 0.92 twice; a smaller corpus shifts the floor/work
    // ratio and measured 0.5 even in clean windows — the gate asserts
    // the SAME quantity BASELINE.md records, not a scaled-down proxy
    val docs = sys.env.get("SPARK_GRAFT_SCALING_SPEC_DOCS")
      .map(_.toInt).getOrElse(330000)
    val hi = 8
    val lo = 2
    def parts(c: Int) = math.max(c, docs / 100000)

    Bench.timeDedup(hi, parts(hi), sfDir, 2000) // JIT warmup
    Bench.canaryGbps() // canary JIT warmup
    // quality baseline = best RUN-MEAN bandwidth PER LEVEL (the in-run
    // sampler; endpoint-only canaries miss mid-run collapses, and the
    // in-run reading is depressed by the measured job's own memory
    // traffic, so levels are only comparable to themselves). Attempts
    // ALTERNATE between levels and cleanliness is re-evaluated against
    // the GROWING baseline each round, so a degraded first sample that
    // trivially defined the baseline gets retried once a later attempt
    // reveals the level's real bandwidth.
    final case class S(n: Long, sec: Double, steal: Double, bw: Double)
    val samples = Map(hi -> scala.collection.mutable.ArrayBuffer.empty[S],
                      lo -> scala.collection.mutable.ArrayBuffer.empty[S])
    val bestMean = scala.collection.mutable.Map(hi -> 0.0, lo -> 0.0)
    def attempt(cores: Int): Unit = {
      val (n, sec, steal, bwMean, _) =
        Bench.timeDedup(cores, parts(cores), sfDir, docs)
      bestMean(cores) = math.max(bestMean(cores), bwMean)
      info(f"cores=$cores sec=$sec%.1f steal=$steal%.1f%% bwMean=$bwMean%.0f" +
        f"/${bestMean(cores)}%.0f GB/s")
      samples(cores) += S(n, sec, steal, bwMean)
    }
    // hybrid baseline: a level's own best run-mean, floored at 80% of
    // the other level's — 2- and 8-thread runs depress the canary
    // comparably (measured 64 vs 69 GB/s in one clean window), so the
    // other level's reading bounds this one's from below and catches a
    // level whose EVERY attempt ran degraded (its own baseline would
    // otherwise bless it: a bwMean-17 sample was once accepted while
    // the other level measured 56)
    // ... and floored at 80% of the ABSOLUTE cross-run reference (55
    // GB/s in-run-mean equivalent, see Bench): a session whose BOTH
    // levels sit in the same depressed window would otherwise bless
    // itself — the exact defect round 3's driver artifact recorded
    def baseline(cores: Int): Double =
      math.max(bestMean(cores),
        0.8 * math.max(55.0, bestMean(if (cores == hi) lo else hi)))
    // 1.15, tighter than Bench's 1.3: the asserted ratio tolerates at
    // most ~±15% window asymmetry between the two levels — a sample at
    // 1.25 slowdown once passed a 1.3 gate while being ~45% inflated
    // (the mean can hide a front-loaded collapse), failing the assert
    // in a window where a faithful pair measures 0.88-0.92
    def cleanMin(cores: Int): Option[S] =
      samples(cores).filter(s => s.steal <= 5.0 &&
        (s.bw > 0 && baseline(cores) / s.bw <= 1.15)).sortBy(_.sec).headOption
    var round = 0
    while (round < 4 && (cleanMin(hi).isEmpty || cleanMin(lo).isEmpty)) {
      if (cleanMin(hi).isEmpty) attempt(hi)
      if (cleanMin(lo).isEmpty) attempt(lo)
      round += 1
    }
    assume(cleanMin(hi).nonEmpty && cleanMin(lo).nonEmpty,
      "CONTENDED HOST WINDOW (steal/run-mean-bandwidth gates failed on " +
        "every attempt at a level, judged against the final baseline) — " +
        "scaling gate skipped; re-run in a clean window")
    // Bench's estimator: min over ALL samples per level — contention
    // only inflates wall time, so the fastest sample is the most
    // faithful; cleanliness gated the skip/run decision above
    val S(nH, sH, _, _) = samples(hi).minBy(_.sec)
    val S(nL, sL, _, _) = samples(lo).minBy(_.sec)
    val eff = (nH / sH) / (4.0 * (nL / sL))
    info(f"thr@$hi=${nH / sH}%.0f docs/s thr@$lo=${nL / sL}%.0f docs/s " +
      f"efficiency=$eff%.3f")
    assert(eff >= 0.7, f"$lo->$hi scaling efficiency $eff%.3f < 0.7")
  }
}
