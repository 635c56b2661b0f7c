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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // sized so data-parallel work dominates the fixed driver floor at
    // both levels (floor ~15-20 s poisons the ratio below ~150k docs)
    val docs = sys.env.get("SPARK_GRAFT_SCALING_SPEC_DOCS")
      .map(_.toInt).getOrElse(200000)
    val hi = 8
    val lo = 2
    def parts(c: Int) = math.max(c, docs / 100000)

    Bench.timeDedup(hi, parts(hi), sfDir, 2000) // JIT warmup
    Bench.canaryGbps() // canary JIT warmup
    // quality baseline = best RUN-MEAN bandwidth across attempts (the
    // in-run sampler; endpoint-only canaries miss mid-run collapses)
    var bestMean = 0.0

    /** One clean (steal + run-mean-bandwidth gated) sample, ≤3 attempts. */
    def measure(cores: Int): Option[(Long, Double, Double)] = {
      var best: Option[(Long, Double, Double)] = None
      var tries = 0
      while (tries < 3 && best.isEmpty) {
        val (n, sec, steal, bwMean, _) =
          Bench.timeDedup(cores, parts(cores), sfDir, docs)
        bestMean = math.max(bestMean, bwMean)
        val slow = if (bwMean > 0) bestMean / bwMean else 99.0
        info(f"cores=$cores sec=$sec%.1f steal=$steal%.1f%% " +
          f"bwMean=$bwMean%.0f slowdown=$slow%.2f")
        if (steal <= 5.0 && slow <= 1.3) best = Some((n, sec, bwMean))
        tries += 1
      }
      best
    }

    val hiM = measure(hi)
    val loM = measure(lo)
    // post-hoc recheck: a later attempt can raise the baseline and
    // reveal an earlier "clean" sample as window-degraded
    def stillClean(s: Option[(Long, Double, Double)]) =
      s.exists(v => bestMean / v._3 <= 1.3)
    assume(hiM.nonEmpty && loM.nonEmpty && stillClean(hiM) && stillClean(loM),
      "CONTENDED HOST WINDOW (steal/run-mean-bandwidth gates failed, or " +
        "an accepted sample went stale against the final baseline) — " +
        "scaling gate skipped; re-run in a clean window")
    val (nH, sH, _) = hiM.get
    val (nL, sL, _) = loM.get
    val eff = (nH / sH) / (4.0 * (nL / sL))
    info(f"thr@$hi=${nH / sH}%.0f docs/s thr@$lo=${nL / sL}%.0f docs/s " +
      f"efficiency=$eff%.3f")
    assert(eff >= 0.7, f"$lo->$hi scaling efficiency $eff%.3f < 0.7")
  }
}
