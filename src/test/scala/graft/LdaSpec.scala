package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lda.{Lda, LdaConfig}
import graft.hash.HashKernels.mix64

/**
 * LDA/SCVB0 tests (SURVEY §2.6 R5). The reference's golden tests pin
 * expected distributions under ITS seeded PRNG (`lda_test.go:16-177`) —
 * not portable across RNGs — so the contract is checked the way the
 * reference's assertions are structured: rows sum to 1, the learnt
 * topics separate a corpus with known (planted) topic structure, the
 * model is deterministic for a fixed seed, and Transform after
 * FitTransform reproduces consistent doc-topic posteriors
 * (`lda_test.go:179-235`).
 */
class LdaSpec extends AnyFunSuite with SparkSpec {

  private val topics = 3
  private val wordsPerTopic = 30
  private val vocab = topics * wordsPerTopic
  private val docsPerTopic = 40
  private val tokensPerDoc = 40

  /** Deterministic corpus: doc d draws all tokens from its topic's
    * 30-word vocabulary block (counter-based draws). */
  private def corpus: DataFrame = {
    import spark.implicits._
    val rows = (0 until topics * docsPerTopic).map { d =>
      val topic = d % topics
      val counts = new Array[Int](vocab)
      for (t <- 0 until tokensPerDoc) {
        val u = (mix64(d * 100003L + t) >>> 11) * 1.1102230246251565e-16
        val w = topic * wordsPerTopic + (u * wordsPerTopic).toInt
        counts(w) += 1
      }
      val entries = counts.zipWithIndex.filter(_._1 > 0)
        .map { case (c, w) => (w.toLong, c.toDouble) }.toSeq
      (d.toLong, entries)
    }
    rows.toDF("doc_id", "raw").select(col("doc_id"),
      transform(col("raw"), e => struct(
        e.getField("_1").as("term"),
        e.getField("_2").as("weight"))).as("entries"))
  }

  private val cfg = LdaConfig(k = topics, vocab = vocab, iterations = 30,
    transformationPasses = 30, seed = 42)

  test("SCVB0 recovers planted topics; thetas sum to 1") {
    val (model, out) = Lda.fitTransform(corpus, "doc_id", "entries", cfg)
    val thetas = out.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    // every theta is a distribution
    thetas.values.foreach { th =>
      assert(math.abs(th.sum - 1.0) < 1e-9)
      th.foreach(p => assert(p >= 0 && p <= 1))
    }

    // docs of the same planted topic agree on their argmax topic, and
    // the three planted groups land on three DISTINCT learnt topics
    val argmax = (0 until topics).map { g =>
      val groupDocs = (0 until topics * docsPerTopic).filter(_ % topics == g)
      val tops = groupDocs.map(d => thetas(d.toLong).zipWithIndex.maxBy(_._1)._2)
      val majority = tops.groupBy(identity).maxBy(_._2.size)
      assert(majority._2.size >= tops.size * 9 / 10,
        s"group $g split: ${tops.groupBy(identity).view.mapValues(_.size).toMap}")
      majority._1
    }
    assert(argmax.distinct.size == topics, s"topics collapsed: $argmax")

    // the learnt topic for group g concentrates its mass on g's block
    val phi = model.topicsLocal
    for (g <- 0 until topics) {
      val k = argmax(g)
      val inBlock = (g * wordsPerTopic until (g + 1) * wordsPerTopic)
        .map(phi(k)(_)).sum
      assert(inBlock > 0.9, s"topic $k mass on block $g: $inBlock")
    }
  }

  test("fit is deterministic for a fixed seed") {
    val m1 = Lda.fit(corpus, "doc_id", "entries", cfg)
    val m2 = Lda.fit(corpus, "doc_id", "entries", cfg)
    assert(m1.nPhi.sameElements(m2.nPhi))
    assert(m1.nZ.sameElements(m2.nZ))
  }

  test("transform after fit gives consistent posteriors (lda_test.go:179-235)") {
    val (model, out1) = Lda.fitTransform(corpus, "doc_id", "entries", cfg)
    val out2 = model.transform(corpus, "doc_id", "entries")
    val a = out1.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val b = out2.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // both runs assign each doc the same dominant topic with close mass
    for (d <- a.keys) {
      assert(a(d).zipWithIndex.maxBy(_._1)._2 == b(d).zipWithIndex.maxBy(_._1)._2)
      for (k <- 0 until topics)
        assert(math.abs(a(d)(k) - b(d)(k)) < 0.15)
    }
  }

  test("perplexity early-stop: converged fixture stops early, posteriors " +
    "match the full run within tolerance (lda.go:530-539)") {
    // evaluate every 5 passes with a generous tolerance: the planted
    // corpus converges in well under 30 passes, so the stop must fire
    val esCfg = cfg.copy(perplexityEvaluationFrequency = 5,
      perplexityTolerance = 0.5)
    val full = cfg.copy(perplexityEvaluationFrequency = 0)
    val mEarly = Lda.fit(corpus, "doc_id", "entries", esCfg)
    val mFull = Lda.fit(corpus, "doc_id", "entries", full)
    assert(mFull.itersRun === cfg.iterations)
    assert(mEarly.itersRun < cfg.iterations,
      s"early stop never fired (ran ${mEarly.itersRun})")
    val a = mEarly.transform(corpus, "doc_id", "entries").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val b = mFull.transform(corpus, "doc_id", "entries").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for (d <- a.keys) {
      assert(a(d).zipWithIndex.maxBy(_._1)._2 === b(d).zipWithIndex.maxBy(_._1)._2)
      for (k <- 0 until topics) assert(math.abs(a(d)(k) - b(d)(k)) < 0.05)
    }
  }

  test("sufficient-stats slicing is bitwise-invariant: dense, even and " +
    "uneven slice widths give identical models") {
    // slices merge under the same pid-keyed tree, and omitted slices
    // are all-zero, so every element's float summation is unchanged —
    // the guarantee that keeps q_lda's golden hash stable across the
    // sparse-partials layout
    val pinned = cfg.copy(partitions = 8)
    val dense = Lda.fit(corpus, "doc_id", "entries", pinned.copy(sliceTerms = 0))
    val even = Lda.fit(corpus, "doc_id", "entries", pinned.copy(sliceTerms = 16))
    val uneven = Lda.fit(corpus, "doc_id", "entries", pinned.copy(sliceTerms = 7))
    assert(dense.nPhi.sameElements(even.nPhi))
    assert(dense.nZ.sameElements(even.nZ))
    assert(dense.nPhi.sameElements(uneven.nPhi))
    assert(dense.nZ.sameElements(uneven.nZ))
  }

  /** Total shuffle bytes written while `body` runs (listener events are
    * async — poll until the counter stabilises before reading it). */
  private def shuffleBytesDuring(body: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try body finally {
      var prev = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val cur = bytes.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      spark.sparkContext.removeSparkListener(listener)
    }
    bytes.get
  }

  test("sparse partials shuffle far fewer bytes than dense on a corpus " +
    "touching a fraction of the vocabulary, with an identical model") {
    import spark.implicits._
    // 60 docs over a 2^18-term vocabulary, every token in terms
    // [0,256): one of 256 slices touched, so the per-partition partial
    // shrinks from 2^18×k to 1024×k values. The vocabulary is sized so
    // that even under lz4 shuffle compression the dense layout's
    // zero-run overhead (~W/255 bytes per array — the floor production
    // pays too) dominates the shared nonzero content, making the drop
    // visible in the COMPRESSED bytes the task metrics record; the raw
    // (serialisation/memory) ratio is W/touched ≈ 1024×.
    val bigVocab = 1 << 18
    val rows = (0 until 60).map { d =>
      val entries = (0 until 10).map { t =>
        val u = (mix64(d * 7919L + t) >>> 11) * 1.1102230246251565e-16
        ((u * 256).toInt.toLong, 1.0 + t % 3)
      }.groupBy(_._1).map { case (w, es) => (w, es.map(_._2).sum) }.toSeq
      (d.toLong, entries)
    }
    val sparseCorpus = rows.toDF("doc_id", "raw").select(col("doc_id"),
      transform(col("raw"), e => struct(
        e.getField("_1").as("term"),
        e.getField("_2").as("weight"))).as("entries"))
    val base = LdaConfig(k = 4, vocab = bigVocab, iterations = 2,
      perplexityEvaluationFrequency = 0, seed = 42, partitions = 8)
    var mDense: graft.lda.LdaModel = null
    var mSparse: graft.lda.LdaModel = null
    val bDense = shuffleBytesDuring {
      mDense = Lda.fit(sparseCorpus, "doc_id", "entries", base.copy(sliceTerms = 0))
    }
    val bSparse = shuffleBytesDuring {
      mSparse = Lda.fit(sparseCorpus, "doc_id", "entries", base.copy(sliceTerms = 1024))
    }
    assert(mDense.nPhi.sameElements(mSparse.nPhi))
    assert(mDense.nZ.sameElements(mSparse.nZ))
    assert(bSparse < bDense / 2,
      s"sparse partials should halve shuffle volume at least: " +
        s"dense=$bDense sparse=$bSparse")
  }

  test("save/load round-trips the model bit-exactly (parquet nPhi + " +
    "json manifest, broadcast-shipped write)") {
    val m = Lda.fit(corpus, "doc_id", "entries", cfg)
    val dir = java.nio.file.Files.createTempDirectory("ldamodel").toString
    m.save(spark, s"$dir/m")
    val l = Lda.load(spark, s"$dir/m")
    assert(l.nPhi.sameElements(m.nPhi))
    assert(l.nZ.sameElements(m.nZ))
    assert(l.cfg.k === m.cfg.k && l.cfg.vocab === m.cfg.vocab &&
      l.cfg.seed === m.cfg.seed)
    val a = m.transform(corpus, "doc_id", "entries").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = l.transform(corpus, "doc_id", "entries").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a === b, "loaded model must transform identically")
  }

  test("save/load round-trips transform() under a NON-default theta " +
    "schedule (burnInPasses + sTheta/tauTheta/kappaTheta ride the " +
    "manifest — a loaded model inferring with default schedule would " +
    "silently produce different thetas)") {
    val hot = cfg.copy(iterations = 3, burnInPasses = 2,
      sTheta = 5.0, tauTheta = 50.0, kappaTheta = 0.8)
    val m = Lda.fit(corpus, "doc_id", "entries", hot)
    val dir = java.nio.file.Files.createTempDirectory("ldamodel2").toString
    m.save(spark, s"$dir/m")
    val l = Lda.load(spark, s"$dir/m")
    assert(l.cfg.burnInPasses === hot.burnInPasses &&
      l.cfg.sTheta === hot.sTheta && l.cfg.tauTheta === hot.tauTheta &&
      l.cfg.kappaTheta === hot.kappaTheta)
    val a = m.transform(corpus, "doc_id", "entries").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = l.transform(corpus, "doc_id", "entries").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a === b, "loaded model must transform identically under " +
      "the fitted schedule")
  }

  test("fit frees every iteration's superseded DocState checkpoint: " +
    "no retained RDDs survive the fit (direct library callers get no " +
    "releaseCaches sweep)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Lda.fit(corpus, "doc_id", "entries",
      cfg.copy(iterations = 5, transformationPasses = 2))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"fit retained ${leaked.size} RDD(s) past its return: " +
        leaked.map(spark.sparkContext.getPersistentRDDs(_).toString)
          .mkString("; "))
  }

  test("perplexity of the fitted model beats the uniform model") {
    val model = Lda.fit(corpus, "doc_id", "entries", cfg)
    val p = model.perplexity(corpus, "doc_id", "entries")
    // uniform word model perplexity = vocab size; topic structure must
    // compress much further (each doc uses a 30-word block)
    assert(p < wordsPerTopic * 1.5, s"perplexity $p")
    assert(p > 1.0)
  }
}
