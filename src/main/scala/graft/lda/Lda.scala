package graft.lda

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.hash.HashKernels.mix64

/**
 * Latent Dirichlet Allocation by SCVB0 — Stochastic Collapsed
 * Variational Bayes (Foulds et al. 2013, arXiv:1305.2452) — the same
 * algorithm family as the reference (SURVEY §2.6 R5;
 * `/root/reference/lda.go:68-542`), re-shaped for Spark:
 *
 *  - The reference fans goroutines over minibatches and merges each
 *    minibatch's sufficient statistics into the shared nPhi/nZ under
 *    mutexes (`lda.go:501-528`, `:303-317`). Here one training
 *    iteration = one partition-parallel pass: every partition computes
 *    its documents' statistics against the BROADCAST global state, the
 *    per-partition (n̂Phi, n̂Z) partials reduce to one update, and the
 *    driver applies Eqn. 7/8 once per pass. Updates are therefore
 *    deterministic (no merge races, no update order), at the cost of
 *    coarser stochasticity — the standard distributed SCVB0 trade
 *    (MLlib's OnlineLDAOptimizer makes the same one).
 *  - Per-document state nTheta lives WITH the document in a persisted
 *    Dataset, localCheckpoint'ed per iteration (the CC-loop lineage
 *    pattern); global state is vocab-bounded (W×K), never corpus-sized.
 *  - All "random" initialisation is counter-based (splitmix64 streams),
 *    so fits are bit-reproducible across runs and partitionings —
 *    the reference seeds a PRNG for the same purpose in its tests
 *    (`lda_test.go:16-89`).
 *
 * Update equations (reference line refs):
 *  Eqn 5  γ_k ∝ (nPhi[w,k]+η)(nTheta[d,k]+α)/(nZ[k]+ηW)   `lda.go:236,279`
 *  Eqn 9  nTheta = (1−ρθ)^cnt·nTheta + (1−(1−ρθ)^cnt)·wc·γ `lda.go:247,289`
 *  Eqn 7  nPhi   = (1−ρφ)·nPhi + ρφ·n̂Phi                   `lda.go:303-310`
 *  Eqn 8  nZ     = (1−ρφ)·nZ   + ρφ·n̂Z                     `lda.go:313-317`
 *  ρ(t) = s/(τ+t)^κ (LearningSchedule, `lda.go:14-32`).
 */
final case class LdaConfig(
  k: Int,
  vocab: Int,
  iterations: Int = 100,
  burnInPasses: Int = 1,          // lda.go:145 default
  transformationPasses: Int = 20, // bounded variant of lda.go:146 (500 w/ tol)
  alpha: Double = 0.1,            // lda.go:151
  eta: Double = 0.01,             // lda.go:152
  sPhi: Double = 10, tauPhi: Double = 1000, kappaPhi: Double = 0.9,   // lda.go:153-157
  sTheta: Double = 1, tauTheta: Double = 10, kappaTheta: Double = 0.9, // lda.go:158-162
  // perplexity early-stop (`lda.go:72-79`, defaults `lda.go:162-163`,
  // loop `lda.go:530-539`): every `perplexityEvaluationFrequency`
  // iterations evaluate corpus perplexity against the CURRENT state;
  // stop when the change falls below `perplexityTolerance`. Frequency
  // <= 0 disables evaluation and runs all `iterations` passes.
  perplexityTolerance: Double = 1e-2,
  perplexityEvaluationFrequency: Int = 30,
  seed: Long = 0,
  // > 0 pins the doc-state partitioning (hash on docId + in-partition
  // sort): fits become bit-identical ACROSS sessions with different
  // parallelism, not just within one — required by the golden-oracle
  // query. 0 = cluster parallelism (within-session determinism only).
  partitions: Int = 0,
  // Term-axis granularity of the sufficient-stats partials: each
  // partition emits (slice, sliceTerms×k values) rows for TOUCHED
  // slices only, instead of one dense vocab×k array, so the first
  // merge round shuffles Σ_p touched(p)·slice bytes rather than
  // P·W·K — the win at production shape, where a partition's docs
  // touch a fraction of a 2^18+ vocabulary. Results are bit-identical
  // for ANY value (omitting an all-zero slice is an IEEE-754 no-op
  // and the per-element merge order is fixed by the pid tree alone);
  // <= 0 means one dense slice (the pre-slicing layout).
  sliceTerms: Int = 512)

/** Fitted model: unnormalised topic-word statistics (vocab-bounded).
  * `itersRun` records how many training passes actually executed
  * (fewer than cfg.iterations when the perplexity early-stop fired). */
final class LdaModel(val nPhi: Array[Double], val nZ: Array[Double],
                     val cfg: LdaConfig, val itersRun: Int = 0)
  extends Serializable {

  /** K×W topic-over-word probability rows (`lda.go:normalisePhi`). */
  def topicsLocal: Array[Array[Double]] = Lda.normalisePhi(nPhi, cfg.k, cfg.vocab)

  /** (topic, term, prob) DataFrame face of [[topicsLocal]]. Emitted
    * DISTRIBUTED, like [[save]]: a driver-side strict collection of
    * K×W boxed tuples is ~2.5-3 GB of Tuple3 objects at the production
    * shape this file documents (W = 2^18, K = 100) — a driver OOM for
    * a frame whose rows are a pure function of (term, broadcast). The
    * per-topic normaliser (the column sum Σ_w nPhi[w][k], exactly
    * [[Lda.normalisePhi]]'s — no smoothing term, reference parity) is
    * precomputed once on the driver (K doubles) so executors don't
    * each re-reduce the W×K array. */
  def topics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val K = cfg.k
    val W = cfg.vocab
    val colSum = new Array[Double](K)
    var i = 0
    while (i < nPhi.length) { colSum(i % K) += nPhi(i); i += 1 }
    val bc = spark.sparkContext.broadcast(nPhi)
    val bcSum = spark.sparkContext.broadcast(colSum)
    spark.range(0, W.toLong, 1, spark.sparkContext.defaultParallelism)
      .flatMap { w =>
        val phi = bc.value; val s = bcSum.value
        (0 until K).map { k => (k, w, phi(w.toInt * K + k) / s(k)) }
      }
      .toDF("topic", "term", "prob")
  }

  /** Posterior document-over-topic distributions for (possibly new)
    * docs: burn-in passes against the frozen model
    * (`lda.go:unNormalisedTransform` + normaliseTheta). Output:
    * (docIdCol, theta: array[k], rows sum to 1). */
  def transform(docs: DataFrame, docIdCol: String, entriesCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(this)
    Lda.docState(docs, docIdCol, entriesCol, cfg)
      .mapPartitions { it =>
        val m = bc.value
        it.map { d =>
          val theta = d.theta.clone()
          var pass = 1
          while (pass <= m.cfg.transformationPasses) {
            // the theta learning-rate clock CONTINUES from the post-fit
            // value, it does not restart: the reference's
            // unNormalisedTransform (`lda.go:420-431`) burns in with the
            // live rhoThetaT (= 1 + iterations executed — init at
            // `lda.go:183`, ++ per fit pass at `lda.go:502`) plus the
            // pass counter (`lda.go:224-231`). Restarting at 1 re-runs
            // the burn-in with the LARGE early-fit steps (defaults
            // s=1, tau=10: rho(2) ≈ 7× rho(102)) — posteriors that
            // drift from the reference's for any fitted model.
            Lda.burnInDoc(d, theta, m.nPhi, m.nZ, m.cfg,
              1.0 + m.itersRun + pass)
            pass += 1
          }
          var s = 0.0
          var k = 0
          while (k < m.cfg.k) { s += theta(k); k += 1 }
          k = 0
          while (k < m.cfg.k) { theta(k) /= s; k += 1 }
          (d.docId, theta)
        }
      }.toDF(docIdCol, "theta")
  }

  /** Persist as parquet + JSON manifest (atomic rename — the same
    * commit protocol as [[graft.dimred.DimRedModel.save]]; the
    * reference has no LDA Save/Load, this is the operational surface a
    * fit-once/transform-everywhere pipeline needs). The topic-word
    * stats ship as (term, vec[k]) rows — vocab-bounded, never
    * corpus-sized. */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val K = cfg.k
    // the WHOLE model dir (payload + manifest) is built under a staging
    // dir and swap-committed: a crash mid-re-save over an existing path
    // must not leave the old manifest next to a partial (or newer)
    // payload — load() would silently zero-fill the missing terms
    graft.ckpt.Fs.publishDir(path,
        spark.sparkContext.hadoopConfiguration) { staging =>
      // nPhi rides as a broadcast (one copy per executor), never in the
      // task closure — a W×K closure is ~200 MB per task at production
      // shape
      val bc = spark.sparkContext.broadcast(nPhi)
      try {
        spark.range(0, cfg.vocab.toLong, 1,
            spark.sparkContext.defaultParallelism)
          .map { w =>
            (w, bc.value.slice(w.toInt * K, w.toInt * K + K).toSeq)
          }
          .toDF("term", "vec")
          .write.mode("overwrite").parquet(s"$staging/nphi.parquet")
      } finally bc.destroy()
      graft.ckpt.Fs.writeStringAtomic(s"$staging/model.json",
        s"""{"k":$K,"vocab":${cfg.vocab},"iters":$itersRun,""" +
          s""""nz":[${nZ.mkString(",")}],""" +
          s""""cfg":{"alpha":${cfg.alpha},"eta":${cfg.eta},""" +
          s""""seed":${cfg.seed},"partitions":${cfg.partitions},""" +
          s""""transformationPasses":${cfg.transformationPasses},""" +
          // transform()'s full hyperparameter surface: burnInDoc reads
          // the theta schedule and burn-in passes too — a manifest
          // without them made a LOADED model silently infer different
          // thetas than the fitted one whenever the fit used
          // non-default values
          s""""burnInPasses":${cfg.burnInPasses},""" +
          s""""sTheta":${cfg.sTheta},"tauTheta":${cfg.tauTheta},""" +
          s""""kappaTheta":${cfg.kappaTheta}}}""",
        spark.sparkContext.hadoopConfiguration)
    }
  }

  /** Corpus perplexity against the fitted model (`lda.go:366-400`). */
  def perplexity(docs: DataFrame, docIdCol: String, entriesCol: String): Double = {
    val spark = docs.sparkSession
    import spark.implicits._
    val phi = topicsLocal
    // destroyed after the collect below — a W×K broadcast left to the
    // ContextCleaner accretes ~200 MB per call at production shape in a
    // perplexity-per-epoch monitoring loop (the same leak class
    // inFitPerplexity and the fit loop destroy eagerly)
    val bc = spark.sparkContext.broadcast(phi)
    val theta = transform(docs, docIdCol, entriesCol)
    val ex = docs.select(col(docIdCol).as("__doc"), explode(col(entriesCol)).as("e"))
      .select(col("__doc"), col("e.term").as("term"),
        col("e.weight").cast("double").as("cnt"))
      .join(theta.withColumnRenamed(docIdCol, "__doc"), "__doc")
    // pid-sorted partials (not reduce): arrival-order Double merges
    // made the reported perplexity run-to-run nondeterministic at ULP
    // level — inconsistent with inFitPerplexity, which sorts by pid
    val parts =
      try ex.select(col("term"), col("cnt"), col("theta"))
        .as[(Long, Double, Seq[Double])]
        .rdd.mapPartitionsWithIndex { (pid, it) =>
          val p = bc.value
          var lp = 0.0
          var wc = 0.0
          it.foreach { case (term, cnt, th) =>
            var dot = 0.0
            var k = 0
            while (k < p.length) { dot += p(k)(term.toInt) * th(k); k += 1 }
            lp += (math.log(dot) / math.log(2.0)) * cnt
            wc += cnt
          }
          Iterator((pid, lp, wc))
        }.collect().sortBy(_._1)
      finally bc.destroy()
    val logProb = parts.foldLeft(0.0)(_ + _._2)
    val words = parts.foldLeft(0.0)(_ + _._3)
    math.pow(2.0, -logProb / words)
  }
}

object Lda {

  /** Load a model previously written by [[LdaModel.save]]. The
    * collected nPhi is W×K — the model's own (bounded) size, the same
    * memory the fit's driver already holds. */
  def load(spark: SparkSession, path: String): LdaModel = {
    // complete a save() a crashed writer left mid-commit
    graft.ckpt.Fs.recoverPublish(path, spark.sparkContext.hadoopConfiguration)
    val json = graft.ckpt.Fs.readString(s"$path/model.json",
      spark.sparkContext.hadoopConfiguration)
    def num(k: String) =
      (s""""$k":(-?[0-9.eE+-]+)""").r.findFirstMatchIn(json).get.group(1)
    // absent in manifests written before the key existed → the
    // LdaConfig default (what those models were fitted with)
    def numOr(k: String, dflt: Double) =
      (s""""$k":(-?[0-9.eE+-]+)""").r.findFirstMatchIn(json)
        .map(_.group(1).toDouble).getOrElse(dflt)
    val k = num("k").toInt
    val vocab = num("vocab").toInt
    val nZ = """"nz":\[([^\]]*)\]""".r.findFirstMatchIn(json).get.group(1)
      .split(",").filter(_.nonEmpty).map(_.toDouble)
    val dflt = LdaConfig(k = k, vocab = vocab)
    val cfg = LdaConfig(k = k, vocab = vocab,
      alpha = num("alpha").toDouble, eta = num("eta").toDouble,
      seed = num("seed").toLong, partitions = num("partitions").toInt,
      transformationPasses = num("transformationPasses").toInt,
      burnInPasses = numOr("burnInPasses", dflt.burnInPasses).toInt,
      sTheta = numOr("sTheta", dflt.sTheta),
      tauTheta = numOr("tauTheta", dflt.tauTheta),
      kappaTheta = numOr("kappaTheta", dflt.kappaTheta))
    val nPhi = new Array[Double](vocab * k)
    spark.read.parquet(s"$path/nphi.parquet").collect().foreach { r =>
      val w = r.getLong(0).toInt
      val vec = r.getSeq[Double](1)
      var i = 0
      while (i < k) { nPhi(w * k + i) = vec(i); i += 1 }
    }
    new LdaModel(nPhi, nZ, cfg, num("iters").toInt)
  }

  /** Per-doc training state: entries + the doc's nTheta. */
  final case class DocState(docId: Long, terms: Array[Int], cnts: Array[Double],
                            wc: Double, theta: Array[Double])

  private[lda] def rho(s: Double, tau: Double, kappa: Double, t: Double): Double =
    s / math.pow(tau + t, kappa)

  /** nPhi → K×W row-normalised topic-word probabilities — the ONE
    * definition (`lda.go:normalisePhi`); both the model face
    * ([[LdaModel.topicsLocal]]) and the in-fit perplexity share it so a
    * normalisation fix cannot reach one and miss the other. Column sums
    * accumulate w-ascending per topic — the same IEEE-754 order both
    * former copies used, so fitted goldens are unmoved. */
  private[lda] def normalisePhi(nPhi: Array[Double], k: Int,
                                vocab: Int): Array[Array[Double]] = {
    val sums = new Array[Double](k)
    var w = 0
    while (w < vocab) {
      var t = 0
      while (t < k) { sums(t) += nPhi(w * k + t); t += 1 }
      w += 1
    }
    Array.tabulate(k)(t =>
      Array.tabulate(vocab)(w => nPhi(w * k + t) / sums(t)))
  }

  /** One burn-in sweep over a doc (Eqn 5 + 9; `lda.go:218-261`). */
  private[lda] def burnInDoc(d: DocState, theta: Array[Double],
                             nPhi: Array[Double], nZ: Array[Double],
                             cfg: LdaConfig, rhoThetaT: Double): Unit = {
    val K = cfg.k
    val gamma = new Array[Double](K)
    val rhoTheta = rho(cfg.sTheta, cfg.tauTheta, cfg.kappaTheta, rhoThetaT)
    var i = 0
    while (i < d.terms.length) {
      val w = d.terms(i)
      val cnt = d.cnts(i)
      var gs = 0.0
      var k = 0
      while (k < K) { // Eqn 5
        gamma(k) = (nPhi(w * K + k) + cfg.eta) * (theta(k) + cfg.alpha) /
          (nZ(k) + cfg.eta * cfg.vocab)
        gs += gamma(k)
        k += 1
      }
      val keep = math.pow(1.0 - rhoTheta, cnt)
      k = 0
      while (k < K) { // Eqn 9
        theta(k) = keep * theta(k) + (1.0 - keep) * d.wc * (gamma(k) / gs)
        k += 1
      }
      i += 1
    }
  }

  /** Deterministic uniform in [0,1) from a counter stream. */
  private def uni(key: Long, slot: Long): Double =
    (mix64(key ^ mix64(slot)) >>> 11) * 1.1102230246251565e-16

  private[lda] def docState(docs: DataFrame, docIdCol: String,
                            entriesCol: String, cfg: LdaConfig) = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(docIdCol).cast("long").as("docId"),
        col(entriesCol).as("es"))
      .select(col("docId"),
        transform(col("es"), e => e.getField("term").cast("int")).as("terms"),
        transform(col("es"), e => e.getField("weight").cast("double")).as("cnts"))
      .as[(Long, Seq[Int], Seq[Double])]
      .map { case (id, terms, cnts) =>
        val wc = cnts.sum
        // nTheta init: deterministic uniforms keyed by (docId, k)
        // (reference seeds a PRNG for the same purpose, lda.go:474-476)
        val theta = Array.tabulate(cfg.k)(k => uni(id ^ cfg.seed, 7000L + k))
        DocState(id, terms.toArray, cnts.toArray, wc, theta)
      }
  }

  /**
   * Fit by SCVB0. One iteration = one deterministic partition-parallel
   * pass (see class doc). Global state stays vocab-bounded; per-doc
   * state is checkpointed each round.
   */
  def fit(docs: DataFrame, docIdCol: String, entriesCol: String,
          cfg: LdaConfig): LdaModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    val K = cfg.k
    val W = cfg.vocab

    // init nPhi with deterministic uniforms (lda.go:193-206)
    var nPhi = new Array[Double](W * K)
    var nZ = new Array[Double](K)
    var i = 0
    while (i < W * K) {
      nPhi(i) = uni(cfg.seed, i)
      nZ(i % K) += nPhi(i)
      i += 1
    }

    var state = (
      if (cfg.partitions > 0)
        docState(docs, docIdCol, entriesCol, cfg)
          .repartition(cfg.partitions, col("docId"))
          .sortWithinPartitions("docId")
      else
        docState(docs, docIdCol, entriesCol, cfg)
          .repartition(spark.sparkContext.defaultParallelism)
      ).localCheckpoint()
    // pid-sorted partials, NOT reduce(): RDD.reduce merges partition
    // partials in task-COMPLETION order, and a Double sum associated
    // differently changes wordsInCorpus in the last ULP — which feeds
    // every sufficient stat (nv = wordsInCorpus*g/nDocs), so two
    // "identical" fits would diverge bit-by-bit on fractional entry
    // weights. Same discipline as the stats tree-merge and
    // inFitPerplexity (integer-valued counts masked this one: they
    // sum exactly in any order).
    val totals = state.rdd.mapPartitionsWithIndex { (pid, it) =>
      var wc = 0.0; var n = 0L
      it.foreach { d => wc += d.wc; n += 1 }
      Iterator((pid, wc, n))
    }.collect().sortBy(_._1)
    val wordsInCorpus = totals.foldLeft(0.0)(_ + _._2)
    val nDocs = totals.foldLeft(0L)(_ + _._3)

    var rhoThetaT = 1.0
    var rhoPhiT = 1.0
    var iter = 0
    var stopped = false
    var prevPerplexity = 0.0
    while (iter < cfg.iterations && !stopped) {
      rhoThetaT += 1.0
      val bcPhi = spark.sparkContext.broadcast(nPhi)
      val bcZ = spark.sparkContext.broadcast(nZ)
      val rtT = rhoThetaT
      val sliceT = if (cfg.sliceTerms > 0) math.min(cfg.sliceTerms, W) else W
      val nSlices = (W + sliceT - 1) / sliceT
      // one pass: update thetas, emit per-partition stats partials —
      // one (slice, values) row per TOUCHED vocab slice plus one n̂Z
      // row (slice −1), never a dense W×K array. The ACCUMULATOR is
      // per-slice and lazily allocated too (not a dense W×K Array —
      // that cost ~210 MB per concurrent task at W=2^18, K=100
      // regardless of how few slices the partition touches; per-slice
      // arrays cap task memory at touched×sliceT×K, and each element's
      // ADDITION ORDER is unchanged, so fits stay bit-identical).
      // Doc-state rows and the stats rows ride the same cached output.
      val next = state.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val phi = bcPhi.value
        val z = bcZ.value
        val phiSlices = new Array[Array[Double]](nSlices)
        val zHat = new Array[Double](K)
        val gamma = new Array[Double](K)
        val out = it.map { d =>
          var pass = 1
          while (pass <= cfg.burnInPasses) {
            burnInDoc(d, d.theta, phi, z, cfg, rtT + pass)
            pass += 1
          }
          val rhoTheta = rho(cfg.sTheta, cfg.tauTheta, cfg.kappaTheta,
            rtT + cfg.burnInPasses)
          var i = 0
          while (i < d.terms.length) {
            val w = d.terms(i)
            val cnt = d.cnts(i)
            val s = w / sliceT
            var ph = phiSlices(s)
            if (ph == null) {
              ph = new Array[Double](math.min(sliceT, W - s * sliceT) * K)
              phiSlices(s) = ph
            }
            val base = (w - s * sliceT) * K
            var gs = 0.0
            var k = 0
            while (k < K) { // Eqn 5
              gamma(k) = (phi(w * K + k) + cfg.eta) * (d.theta(k) + cfg.alpha) /
                (z(k) + cfg.eta * W)
              gs += gamma(k)
              k += 1
            }
            val keep = math.pow(1.0 - rhoTheta, cnt)
            k = 0
            while (k < K) {
              val g = gamma(k) / gs
              d.theta(k) = keep * d.theta(k) + (1.0 - keep) * d.wc * g // Eqn 9
              val nv = wordsInCorpus * g / nDocs // sufficient stats
              ph(base + k) += nv
              zHat(k) += nv
              k += 1
            }
            i += 1
          }
          (-1, d, 0, null: Array[Double])
        }
        // the slice rows are built via a lazy flatMap so the slice
        // accumulators are read only AFTER `out` has consumed every
        // document of the partition
        out ++ Iterator.single(()).flatMap { _ =>
          val slices = Iterator.range(0, nSlices)
            .filter(phiSlices(_) != null).map { s =>
              (pid, null: DocState, s, phiSlices(s))
            }
          slices ++ Iterator((pid, null: DocState, -1, zHat))
        }
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // deterministic merge: float addition is not associative, so the
      // partials are combined over a FIXED BINARY TREE keyed by
      // partition id (round r merges nodes 2i and 2i+1, pair summed in
      // id order) — the summation order is a function of the partition
      // count alone, never of task arrival (an arrival-order reduce()
      // made two identical fits diverge bit-by-bit, caught by LdaSpec's
      // determinism gate). Slices merge independently under the SAME
      // pid tree — key (slice, node) — so each element's summation
      // order is unchanged by the slicing, and an absent (untouched,
      // all-zero) slice contributes exactly what adding its zeros
      // would: nothing. The tree rounds run EXECUTOR-SIDE as log2(P)
      // shuffles of touched slice rows; the driver receives one root
      // row per touched slice — driver memory is ≤ O(W×K), never
      // P×(W×K) (the previous collect shipped every partition's full
      // partial to the driver: ~400 GB/iteration at W=2^18, K=100,
      // P=2000).
      val (phiHat, zHat) = treeMergePartials(
        next.filter(_._2 == null).map(r => (r._1, r._3, r._4)).rdd,
        next.rdd.getNumPartitions, W, K, sliceT)
      val newState = next.filter(_._2 != null).map(_._2).localCheckpoint()
      next.unpersist()
      // free the SUPERSEDED snapshot: unpersist is a no-op on
      // checkpointed frames and ContextCleaner waits for driver GC, so
      // without this every iteration pins another corpus-sized DocState
      // block set until the fit ends (same leak class as the CC label
      // frames; newState was materialised from `next`, never from the
      // old state, so nothing re-reads it)
      graft.ckpt.Checkpoints.free(state.toDF())
      state = newState

      val rhoPhi = rho(cfg.sPhi, cfg.tauPhi, cfg.kappaPhi, rhoPhiT)
      rhoPhiT += 1.0
      i = 0
      while (i < W * K) { // Eqn 7
        nPhi(i) = (1.0 - rhoPhi) * nPhi(i) + rhoPhi * phiHat(i)
        i += 1
      }
      i = 0
      while (i < K) { // Eqn 8
        nZ(i) = (1.0 - rhoPhi) * nZ(i) + rhoPhi * zHat(i)
        i += 1
      }
      bcPhi.destroy(); bcZ.destroy()
      iter += 1
      // perplexity early-stop against the CURRENT state (`lda.go:530-539`)
      if (cfg.perplexityEvaluationFrequency > 0 &&
          iter % cfg.perplexityEvaluationFrequency == 0 &&
          iter < cfg.iterations) {
        val p = inFitPerplexity(state, nPhi, cfg, wordsInCorpus)
        if (prevPerplexity != 0.0 &&
            math.abs(prevPerplexity - p) < cfg.perplexityTolerance)
          stopped = true
        prevPerplexity = p
      }
    }
    // the model is driver arrays; nothing re-reads the final snapshot
    graft.ckpt.Checkpoints.free(state.toDF())
    new LdaModel(nPhi, nZ, cfg, iter)
  }

  /** Fixed-topology pairwise merge of per-partition sufficient-stats
    * slice rows `(pid, slice, values)` (slice −1 = the n̂Z row): round
    * r merges tree nodes 2i and 2i+1 of each slice independently —
    * key (slice, pid >> 1), pair summed in pid order into a fresh
    * accumulator — so the float summation order of every element
    * depends only on the partition count, never on task arrival or
    * the slice granularity. Runs as executor-side shuffles of touched
    * slices only; one root row per touched slice is collected and
    * assembled into the dense (W×K, K) pair (untouched slices stay
    * zero, exactly as summing their zeros would leave them). */
  private def treeMergePartials(
      partials: org.apache.spark.rdd.RDD[(Int, Int, Array[Double])],
      width0: Int, w: Int, k: Int, sliceT: Int): (Array[Double], Array[Double]) = {
    val parallelism = partials.sparkContext.defaultParallelism
    var lvl = partials.map { case (pid, s, vs) => ((s, pid), vs) }
    var width = math.max(width0, 1)
    while (width > 1) {
      val nParts = math.max(1, math.min((width + 1) / 2, parallelism))
      lvl = lvl.map { case ((s, pid), v) => ((s, pid >> 1), (pid, v)) }
        .groupByKey(nParts)
        .map { case ((s, npid), items) =>
          val sorted = items.toArray.sortBy(_._1)
          val acc = new Array[Double](sorted(0)._2.length)
          sorted.foreach { case (_, vs) =>
            var i = 0
            while (i < acc.length) { acc(i) += vs(i); i += 1 }
          }
          ((s, npid), acc)
        }
      width = (width + 1) / 2
    }
    val phiHat = new Array[Double](w * k)
    val zHat = new Array[Double](k)
    val seen = scala.collection.mutable.Set.empty[Int]
    lvl.collect().foreach { case ((s, _), vs) =>
      require(seen.add(s), s"tree merge produced two roots for slice $s")
      if (s < 0) System.arraycopy(vs, 0, zHat, 0, k)
      else System.arraycopy(vs, 0, phiHat, s * sliceT * k, vs.length)
    }
    (phiHat, zHat)
  }

  /** In-fit corpus perplexity from the CURRENT doc thetas and topic
    * stats — the reference evaluates against live state, not a fresh
    * transform (`lda.go:530-534` normalises nPhi/nTheta in place).
    * Per-partition (pid, logProb) partials are summed in partition
    * order so the early-stop decision is deterministic. */
  private def inFitPerplexity(
      state: org.apache.spark.sql.Dataset[DocState], nPhi: Array[Double],
      cfg: LdaConfig, wordsInCorpus: Double): Double = {
    val spark = state.sparkSession
    import spark.implicits._
    val phiProb = normalisePhi(nPhi, cfg.k, cfg.vocab)
    val bc = spark.sparkContext.broadcast(phiProb)
    val parts = state.mapPartitions { it =>
      val p = bc.value
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var lp = 0.0
      it.foreach { d =>
        var ts = 0.0
        var k = 0
        while (k < p.length) { ts += d.theta(k); k += 1 }
        var t = 0
        while (t < d.terms.length) {
          val w = d.terms(t)
          var dot = 0.0
          k = 0
          while (k < p.length) { dot += p(k)(w) * (d.theta(k) / ts); k += 1 }
          lp += (math.log(dot) / math.log(2.0)) * d.cnts(t)
          t += 1
        }
      }
      Iterator((pid, lp))
    }.collect().sortBy(_._1)
    bc.destroy()
    val logProb = parts.foldLeft(0.0)(_ + _._2)
    math.pow(2.0, -logProb / wordsInCorpus)
  }

  def fitTransform(docs: DataFrame, docIdCol: String, entriesCol: String,
                   cfg: LdaConfig): (LdaModel, DataFrame) = {
    val m = fit(docs, docIdCol, entriesCol, cfg)
    (m, m.transform(docs, docIdCol, entriesCol))
  }
}
