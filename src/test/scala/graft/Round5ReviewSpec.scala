package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ckpt.{BatchStore, Fs}

/** Round-5 final-review contracts: the row-count rebuild never blocks
  * (or is blocked by) the writer lease, the ForestIndex geometry
  * manifest fails loudly when unreadable and guards compact() like
  * every other mutation, and IvfIndex.refit stamps DISTINCT identities
  * even when a batch re-states an id. */
/** A local filesystem whose `setTimes` is a silent no-op — the exact
  * behavior the base `FileSystem` (and s3a, which inherits it) ships:
  * lets the suite exercise [[graft.ckpt.Fs.touch]]'s rewrite fallback
  * without an object store. */
class NoOpTimesFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def setTimes(p: org.apache.hadoop.fs.Path,
                        mtime: Long, atime: Long): Unit = ()
  override def getScheme: String = "nooptimes"
  override def getUri: java.net.URI = java.net.URI.create("nooptimes:///")
}

class Round5ReviewSpec extends AnyFunSuite with SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-r5r-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def doc(p: String) = (1 to 60).map(i =>
    p + ('a' + i % 26).toChar.toString * (1 + i / 26)).mkString(" ")

  test("rowCount rebuild runs OUTSIDE the writer lease: a stale-manifest " +
    "recount neither fails nor is failed by a concurrent lease holder, " +
    "and defers its manifest persist to the next uncontended call") {
    import spark.implicits._
    val root = s"${freshDir()}/store"
    val st = new BatchStore(spark, root)
    st.writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    st.writeBatch(Seq((3L, "c")).toDF("id", "v"), 1L)
    // stale manifest + a live writer holding the lease (fresh mtime, so
    // it is not stale-broken): the old shape claimed the lease around
    // the full-store recount — a pure read API either failing loudly
    // here or, worse, starving a real writer for the recount's duration
    Fs.deleteIfExists(s"$root.rows", hconf)
    assert(Fs.createExclusive(s"$root.lock", "другой writer", hconf))
    try {
      assert(st.rowCount() === 3L,
        "a read-side recount must serve under a held writer lease")
      assert(!Fs.exists(s"$root.rows", hconf),
        "the persist is writer-guarded state: with the lease busy the " +
          "count is served unpersisted")
    } finally Fs.deleteIfExists(s"$root.lock", hconf)
    // uncontended call: rebuilds again and this time persists
    assert(st.rowCount() === 3L)
    assert(Fs.exists(s"$root.rows", hconf),
      "the next uncontended call persists the rebuilt manifest")
    // and the persisted manifest then serves job-free (existing
    // contract, re-checked against the new lease-free shape)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(st.rowCount() === 3L)
      Thread.sleep(1500)
      assert(jobs.get() === 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ForestIndex: an unreadable layout manifest (keys missing) fails " +
    "loudly instead of defaulting to the constructor geometry") {
    import spark.implicits._
    val dir = s"${freshDir()}/forest"
    val f = new graft.lsh.ForestIndex(spark, dir)
    f.put(Seq((1L, 0x1234L)).toDF("id", "sig"))
    // corrupt the manifest: keys renamed/absent — the old getOrElse
    // defaults made the geometry require trivially pass, silently
    // serving mis-pruned searches on a wrong-geometry reopen
    Fs.writeStringAtomic(s"$dir/layout.json", """{"v":2}""", hconf)
    val f2 = new graft.lsh.ForestIndex(spark, dir)
    val e = intercept[IllegalArgumentException] {
      f2.put(Seq((2L, 0x5678L)).toDF("id", "sig"))
    }
    assert(e.getMessage.contains("unreadable"))
  }

  test("ForestIndex.compact validates the stored geometry like every " +
    "other mutation: a mismatched reopen fails loudly instead of " +
    "compacting under wrong pruning maths") {
    import spark.implicits._
    val dir = s"${freshDir()}/forest"
    val f = new graft.lsh.ForestIndex(spark, dir) // prefixBits = 6
    f.put(Seq((1L, 0x1234L)).toDF("id", "sig"))
    f.putBatch(Seq((2L, 0x5678L)).toDF("id", "sig"), 1L)
    val f2 = new graft.lsh.ForestIndex(spark, dir, prefixBits = 5)
    val e = intercept[IllegalArgumentException] { f2.compact(1L) }
    assert(e.getMessage.contains("prefixBits"))
    // the original geometry still compacts fine
    new graft.lsh.ForestIndex(spark, dir).compact(1L)
    assert(new graft.lsh.ForestIndex(spark, dir).all().count() === 2L)
  }

  test("IvfIndex.refit stamps DISTINCT identities: a batch re-stating " +
    "an id must not inflate the fit size (and defer the next " +
    "distinct-id-triggered auto-refit) by its duplication factor") {
    import spark.implicits._
    val dir = s"${freshDir()}/ivf"
    def vec(i: Long) = graft.data.SyntheticVectors.vectorOf(i, 16).toSeq
    val ivf = new graft.ops.IvfIndex(spark, dir, nCells = 8)
    // 4 distinct ids, each stated 3 times IN THE SAME batch — all 12
    // rows share the batch, so latestBatchRows keeps every one
    ivf.put((1L to 4L).flatMap(i => Seq.fill(3)((i, vec(i))))
      .toDF("id", "vec"))
    ivf.refit()
    // the fit-size sentinel rides as the cell = -1 row of the codebook
    val stamped = spark.read.parquet(s"$dir/codebook")
      .filter(col("cell") === -1).select("centroid")
      .head().getSeq[Double](0)(0)
    assert(stamped === 4.0,
      s"refit must stamp 4 distinct ids, not 12 stored rows (got $stamped)")
  }

  test("zero-norm embeddings never rank as neighbors: Spark orders NaN " +
    "above every real double, so an unfiltered zero vector would " +
    "silently take rank 1 for EVERY query") {
    import spark.implicits._
    def vec(i: Long) = graft.data.SyntheticVectors.vectorOf(i, 16).toSeq
    val corpus = ((1L to 6L).map(i => (i, vec(i))) :+
      ((99L, Seq.fill(16)(0.0f.toFloat)))).toDF("id", "vec")
    val queries = Seq((1000L, vec(3L))).toDF("id", "vec")
    val bf = graft.ops.TrainingDataOps
      .bruteForceTopK(corpus, "id", "vec", queries, 3)
      .as[(Long, Long, Int)].collect()
    assert(!bf.exists(_._2 == 99L),
      s"the zero vector must not be a neighbor (got ${bf.mkString(",")})")
    assert(bf.map(_._3).sorted.toSeq === Seq(1, 2, 3))
    val lsh = graft.ops.TrainingDataOps
      .lshTopK(corpus, "id", "vec", queries, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(!lsh.exists(_._2 == 99L))
  }

  test("zero-norm contract holds on ivfTopK and cosineNearDup too: " +
    "ivfTopK stays ≡ bruteForceTopK at nProbe = nCells with a zero " +
    "vector planted, and cosineNearDup must not report two all-zero " +
    "rows as a near-dup pair (NaN >= tau is TRUE in Spark's ordering)") {
    import spark.implicits._
    def vec(i: Long) = graft.data.SyntheticVectors.vectorOf(i, 16).toSeq
    val zero = Seq.fill(16)(0.0f)
    val corpus = ((0L until 12L).map(i => (i, vec(i))) ++
      Seq((98L, zero), (99L, zero))).toDF("id", "vec")
    // zero vector as corpus member AND as query: neither may surface
    val queries = Seq((1000L, vec(3L)), (1001L, zero)).toDF("id", "vec")
    val ivf = graft.ops.Ivf
      .ivfTopK(corpus, "id", "vec", queries, 3, nCells = 4, nProbe = 4)
      .as[(Long, Long, Int)].collect()
    assert(!ivf.exists(r => r._2 == 98L || r._2 == 99L),
      s"zero vectors must not be neighbors (got ${ivf.mkString(",")})")
    assert(!ivf.exists(_._1 == 1001L),
      "a zero-norm query has no defined neighbors and must emit no rows")
    val bf = graft.ops.TrainingDataOps
      .bruteForceTopK(corpus, "id", "vec", queries, 3)
      .as[(Long, Long, Int)].collect()
    assert(ivf.toSet === bf.toSet,
      "nProbe = nCells equivalence must survive the zero-norm filter")
    // pin the semantics claim first: Spark routes double comparisons
    // through SQLOrderingUtil.compareDoubles (java.lang.Double.compare
    // ordering), so NaN >= τ is TRUE — a threshold filter does NOT
    // naturally exclude NaN pairs, unlike Java primitive `>=`
    assert(spark.range(1)
      .select((lit(Double.NaN) >= lit(0.9)).as("v"))
      .head().getBoolean(0),
      "expected Spark NaN ordering: NaN >= 0.9 must be TRUE")
    // two identical all-zero rows band-collide with certainty; their
    // cosine is NaN and NaN >= 0.9 evaluates TRUE under Spark's NaN
    // ordering — only the per-side filter keeps them out
    val pairs = graft.ops.TrainingDataOps
      .cosineNearDup(corpus, "id", "vec", 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(!pairs.exists(p =>
        p._1 == 98L || p._2 == 98L || p._1 == 99L || p._2 == 99L),
      s"undefined similarity is not a duplicate (got ${pairs.mkString(",")})")
    // the filter must not cost real pairs: planted partners (2j, 2j+1)
    // are near-identical and still all present
    assert((0L until 6L).forall(j => pairs.contains((2 * j, 2 * j + 1))),
      s"planted partners lost (got ${pairs.sorted.mkString(",")})")
  }

  test("degenerate measure inputs are NaN, not errors, and the angular " +
    "clamp preserves NaN: least(NaN, 1.0) is 1.0 under Spark's NaN " +
    "ordering, so the naive clamp read a zero vector as IDENTICAL to " +
    "everything; ANSI mode raises DIVIDE_BY_ZERO even on doubles, so " +
    "empty-set Jaccard must produce its NaN explicitly") {
    import graft.verify.Measures
    val row = spark.range(1).select(
      typedLit(Seq.empty[Long]).as("es"),
      typedLit(Seq(1L, 2L)).as("s"),
      typedLit(Seq.empty[Long]).as("esig"),
      typedLit(Seq(0.0, 0.0, 0.0)).as("zv"),
      typedLit(Seq(1.0, 2.0, 2.0)).as("v"))
    val got = row.select(
      Measures.jaccard(col("es"), col("es")).as("j_ee"),
      Measures.jaccard(col("es"), col("s")).as("j_es"),
      Measures.minhashSim(col("esig"), col("esig")).as("mh_e"),
      Measures.angularDist(col("zv"), col("v")).as("ad_z"),
      Measures.angularSim(col("zv"), col("v")).as("as_z"),
      Measures.angularDist(col("v"), col("v")).as("ad_same"),
      Measures.angularDist(col("v"),
        transform(col("v"), x => -x)).as("ad_anti")).head()
    assert(got.getDouble(0).isNaN, "jaccard([], []) must be NaN")
    assert(got.getDouble(1) === 0.0, "jaccard([], s) is a defined 0")
    assert(got.getDouble(2).isNaN, "minhashSim([], []) must be NaN")
    assert(got.getDouble(3).isNaN,
      "angular distance of a zero vector is undefined — NaN, not 0")
    assert(got.getDouble(4).isNaN, "angular similarity likewise")
    assert(got.getDouble(5) === 0.0, "identical vectors: distance 0")
    assert(math.abs(got.getDouble(6) - 1.0) < 1e-12,
      "antipodal vectors: clamp at -1 still works, distance 1")
    // an empty-text document (failed extraction) must score worst
    // quality, not raise DIVIDE_BY_ZERO on the alpha-ratio divide and
    // not emit a NaN that would PASS a min-quality gate
    import spark.implicits._
    val q = graft.ops.TrainingDataOps
      .qualityMetrics(Seq((1L, "")).toDF("doc_id", "text"), col("text"))
      .select("mean_tok_len", "stop_ratio", "alpha_ratio").head()
    assert(q.getDouble(0) === 0.0 && q.getDouble(1) === 0.0 &&
      q.getDouble(2) === 0.0,
      s"empty doc must score 0.0 on every ratio (got $q)")
  }

  test("rows with neither a doc_id nor a url fail LOUDLY: xxhash64(null) " +
    "would fold them all onto one shared identity the audit cannot see") {
    import spark.implicits._
    val pages = Seq((null.asInstanceOf[String], doc("aa")),
      (null.asInstanceOf[String], doc("bb")),
      ("u1", doc("cc"))).toDF("url", "text")
    val e = intercept[IllegalArgumentException] {
      DedupPipeline.run(pages)
    }
    assert(e.getMessage.contains("no identity"))
    // the index put path enforces the same contract
    val ix = new graft.ops.IncrementalIndex(spark, s"${freshDir()}/idx")
    val e2 = intercept[IllegalArgumentException] { ix.put(pages) }
    assert(e2.getMessage.contains("no identity"))
  }

  test("winnowCtx: the key stream is byte-identical to winnow's, and " +
    "two docs sharing a run carry a shared (key, skey) anchor — the " +
    "adjacency that lets chain pairing connect true substring dups " +
    "inside oversized buckets") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog again and again here"
    val a = common + " tail of document alpha with its own words"
    val b = common + " entirely different continuation for beta"
    val df = Seq((1L, a), (2L, b)).toDF("id", "t")
    val k = 8; val w = 23
    val plain = df.select(col("id"),
        graft.hash.HashFunctions.winnow(col("t"), k, w).as("ks"))
      .as[(Long, Seq[Long])].collect().toMap
    val ctx = df.select(col("id"), explode(
        graft.hash.HashFunctions.winnowCtx(col("t"), k, w)).as("kc"))
      .select(col("id"), col("kc.key"), col("kc.skey"))
      .as[(Long, Long, Long)].collect()
    // identical fingerprint stream (golden-pinned kernels share the
    // selection core)
    assert(ctx.filter(_._1 == 1L).map(_._2).toSeq === plain(1L))
    assert(ctx.filter(_._1 == 2L).map(_._2).toSeq === plain(2L))
    // at least one anchor inside the shared run carries an equal skey
    // in both docs (its 4 following chars are inside the run too)
    val pairsA = ctx.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet
    val pairsB = ctx.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet
    assert((pairsA intersect pairsB).nonEmpty,
      "shared-run anchors must agree on (key, skey) so the pair sorts " +
        "adjacent in an oversized bucket")
  }

  test("invalidate() matches dependents inside the inputs array only: " +
    "a stage named like a manifest JSON key ('bytes') is not a spurious " +
    "dependent of every committed stage") {
    import spark.implicits._
    val root = freshDir()
    val store = new graft.ckpt.ParquetStageStore(spark, root)
    // three stages: 'base' (no inputs), 'bytes' (depends on base — the
    // name collides with the partitions-array JSON key every manifest
    // carries), and 'other' (depends on base only)
    store.stage("base") { Seq(1, 2, 3).toDF("v") }
    store.stage("bytes", Seq("base")) { Seq(4).toDF("v") }
    store.stage("other", Seq("base")) { Seq(5).toDF("v") }
    assert(store.isCommitted("base") && store.isCommitted("bytes") &&
      store.isCommitted("other"))
    // invalidating 'bytes' must touch ONLY 'bytes': before the fix the
    // dependent scan substring-matched '"bytes"' against the manifest
    // tail after "inputs":, which includes the partitions stats — so
    // EVERY manifest matched and the whole committed store cascaded
    store.invalidate("bytes")
    assert(!store.isCommitted("bytes"))
    assert(store.isCommitted("base"),
      "an upstream stage must survive invalidating its dependent")
    assert(store.isCommitted("other"),
      "a sibling stage with no dependency on 'bytes' must stay committed")
    // the true cascade still works: invalidating base takes out other
    store.invalidate("base")
    assert(!store.isCommitted("base") && !store.isCommitted("other"))
  }

  test("an empty first put is a no-op on every index: no degenerate " +
    "corpus-stats publish, no zero-sample codebook fit, and the first " +
    "REAL batch fits normally") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("url", "text")
    // dedup index: before the guard this published CorpusStats(n=0,
    // empty idf) permanently — every later doc signed with all-zero
    // weights and no signal
    val idxPath = s"${freshDir()}/idx"
    val idx = new graft.ops.IncrementalIndex(spark, idxPath)
    idx.putBatch(empty, 0L)
    assert(idx.isEmpty, "empty putBatch must store nothing")
    assert(!Fs.exists(s"$idxPath/stats", hconf),
      "empty first put must NOT fit-and-publish corpus stats")
    idx.put(empty)
    assert(!Fs.exists(s"$idxPath/stats", hconf))
    // the first real batch then fits real stats and serves matches
    val a = doc("alpha")
    val real = Seq(("u1", a), ("u2", a + " tail"), ("u3", doc("zulu")))
      .toDF("url", "text")
    idx.putBatch(real, 1L)
    assert(Fs.exists(s"$idxPath/stats", hconf),
      "first NON-empty put fits stats")
    val m = idx.search(Seq(("q1", a)).toDF("url", "text"))
    assert(m.filter(col("match_url") === "u1").count() >= 1,
      "index built after an empty batch still matches near-dups")
    // IVF index: before the guard the zero-sample codebook fit threw,
    // killing the streaming query on its first empty trigger
    val ivfPath = s"${freshDir()}/ivf"
    val ivf = new graft.ops.IvfIndex(spark, ivfPath, nCells = 2)
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    ivf.putBatch(emptyVecs, 0L)
    ivf.put(emptyVecs)
    assert(!Fs.exists(s"$ivfPath/codebook", hconf),
      "empty first put must NOT fit a codebook")
    ivf.put(Seq((1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f))).toDF("id", "vec"))
    val r = ivf.search(Seq((10L, Array(1f, 0f))).toDF("id", "vec"), 1)
    assert(r.collect().map(_.getLong(1)).toSeq == Seq(1L),
      "index built after an empty batch serves correct neighbors")
  }

  test("VocabEncode emits term-sorted encodings: entry order is " +
    "deterministic, not shuffle-arrival order") {
    import spark.implicits._
    // enough terms per doc that an arrival-ordered collect_list is
    // overwhelmingly unlikely to coincide with sorted order
    val docs = Seq(
      (1L, (0 until 40).map(i => s"t${(i * 7) % 40}")),
      (2L, (0 until 40).map(i => s"t${(i * 11) % 40}"))
    ).toDF("doc_id", "tokens")
    val enc = new graft.pipeline.Pipeline(
      graft.pipeline.CountVectorise("tokens"),
      graft.pipeline.VocabEncode("doc_id", "entries"))
      .fitTransform(docs)._2
    enc.select(col("doc_id"), col("encoded")).collect().foreach { r =>
      val terms = r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
      assert(terms == terms.sorted,
        s"doc ${r.getLong(0)}: encoded terms must be ascending, got $terms")
      assert(terms.distinct.size == terms.size)
    }
  }

  test("SvdStage with derived dimensionality fails loudly (not an NPE) " +
    "when every document's entry array is empty") {
    import spark.implicits._
    val docs = Seq((1L, Seq.empty[String]), (2L, Seq.empty[String]))
      .toDF("doc_id", "tokens")
    val e = intercept[IllegalArgumentException] {
      new graft.pipeline.Pipeline(
        graft.pipeline.CountVectorise("tokens"),
        graft.pipeline.VocabEncode("doc_id", "entries"),
        graft.pipeline.SvdStage("doc_id", "encoded", k = 2)).fit(docs)
    }
    assert(e.getMessage.contains("cannot derive dimensionality"))
  }

  test("Multimodal.extractFeatures names a null doc id loudly instead " +
    "of dying on an opaque encoder NPE") {
    import spark.implicits._
    val rows = Seq((java.lang.Long.valueOf(1L), "ok".getBytes),
      (null.asInstanceOf[java.lang.Long], "bad".getBytes))
      .toDF("doc_id", "payload")
    val e = intercept[Exception] {
      graft.ops.Multimodal.extractFeatures(rows, "doc_id", "payload")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("identity-less media row")),
      s"expected the loud identity error, got: ${messages(e)}")
  }

  test("Fs.touch refreshes the lease stamp even where setTimes is a " +
    "no-op (s3a semantics): the heartbeat rewrite fallback") {
    hconf.set("fs.nooptimes.impl", classOf[NoOpTimesFs].getName)
    val local = s"${freshDir()}/lock"
    Fs.writeStringAtomic(local, "owner-token-42", hconf)
    // backdate the real file so the no-op setTimes leaves it stale
    val old = System.currentTimeMillis() - 60000
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(local),
      java.nio.file.attribute.FileTime.fromMillis(old))
    val viaNoop = s"nooptimes://$local"
    assert(Fs.modifiedMs(viaNoop, hconf).exists(_ <= old + 1000))
    val before = System.currentTimeMillis()
    Fs.touch(viaNoop, hconf)
    val after = Fs.modifiedMs(viaNoop, hconf).get
    assert(after >= before - 2000,
      s"touch must refresh the stamp via rewrite when setTimes no-ops " +
        s"(stamp $after vs now $before)")
    assert(Fs.readString(local, hconf) == "owner-token-42",
      "the rewrite must preserve the lock content (owner token)")
    // and it must never CREATE a missing lock (lease-loss contract)
    val missing = s"nooptimes://${freshDir()}/gone"
    Fs.touch(missing, hconf)
    assert(!Fs.exists(missing, hconf))
  }

  test("ForestIndex rejects tables that do not divide 64 at " +
    "construction, before any row or manifest is persisted") {
    val e = intercept[IllegalArgumentException] {
      new graft.lsh.ForestIndex(spark, s"${freshDir()}/f", tables = 3)
    }
    assert(e.getMessage.contains("divide 64"))
  }

  test("ForestIndex.search frees every snapshot on a failing query " +
    "batch (null id raise_error mid-materialisation)") {
    import spark.implicits._
    val fi = new graft.lsh.ForestIndex(spark, s"${freshDir()}/f")
    fi.put(Seq((1L, 7L), (2L, -9L)).toDF("id", "sig"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val bad = Seq((java.lang.Long.valueOf(10L), 7L),
      (null.asInstanceOf[java.lang.Long], 5L)).toDF("id", "sig")
    intercept[Exception] { fi.search(bad, 2) }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"a failed search must not leave pinned snapshots, leaked: $leaked")
    // the index still serves after the failed batch
    val ok = fi.search(Seq((10L, 7L)).toDF("id", "sig"), 1).collect()
    assert(ok.map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("LdaModel.topics emits distributed rows identical to topicsLocal " +
    "(no smoothing drift, no driver-side K×W materialisation)") {
    val k = 2; val vocab = 3
    // nPhi layout is w*k+t (term-major): w0=(1,3) w1=(2,1) w2=(7,6)
    val nPhi = Array(1.0, 3.0, 2.0, 1.0, 7.0, 6.0)
    val m = new graft.lda.LdaModel(nPhi, Array(10.0, 10.0),
      graft.lda.LdaConfig(k = k, vocab = vocab))
    val local = m.topicsLocal
    val rows = m.topics(spark).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.size == k * vocab)
    for (t <- 0 until k; w <- 0 until vocab)
      assert(math.abs(rows((t, w.toLong)) - local(t)(w)) < 1e-15,
        s"topic $t term $w: ${rows((t, w.toLong))} vs ${local(t)(w)}")
  }
}
