package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ckpt.{BatchStore, Fs}

/** Round-5 contracts: staging-completeness on swap recovery (a
  * mid-parquet crash can never be promoted to a committed batch), the
  * manifest-backed store row count (no full-store job per put), the
  * lease heartbeat + break-race verify, last-put-wins identity on all
  * three mutable indexes, empty-index search, and band-layout refit
  * repair. */
class Round5Spec extends AnyFunSuite with SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-r5-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def doc(p: String) = (1 to 60).map(i =>
    p + ('a' + i % 26).toChar.toString * (1 + i / 26)).mkString(" ")

  // ---- swap-recovery completeness (ADVICE: Fs.recoverSwap) ----

  test("a staging dir from a mid-parquet crash (no _SUCCESS, no aside) " +
    "is DROPPED on open, never promoted to a committed batch") {
    import spark.implicits._
    val root = s"${freshDir()}/store"
    val st = new BatchStore(spark, root)
    st.writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    // fabricate the crash: a partial staging dir for a NEW batch —
    // no batch=1 dir existed, so no aside was ever renamed
    Fs.mkdirs(s"$root/.batch-1.tmp", hconf)
    Fs.writeStringAtomic(s"$root/.batch-1.tmp/part-00000.parquet",
      "truncated mid-write", hconf)
    val st2 = new BatchStore(spark, root)
    assert(!Fs.exists(s"$root/batch=1", hconf),
      "a partial staging dir must never become a committed batch")
    assert(!Fs.exists(s"$root/.batch-1.tmp", hconf),
      "the never-committed staging leftover is dropped (the put never " +
        "returned success, so dropping it is the consistent recovery)")
    assert(st2.batchIds().toSet === Set(0L))
    assert(st2.all().count() === 2L)
  }

  test("a COMPLETE staged batch (Spark _SUCCESS marker present) that " +
    "crashed between write and swap is promoted on open") {
    import spark.implicits._
    val root = s"${freshDir()}/store"
    val st = new BatchStore(spark, root)
    st.writeBatch(Seq((1L, "a")).toDF("id", "v"), 0L)
    // fabricate a fully-written staging dir (df.write emits _SUCCESS)
    Seq((9L, "z")).toDF("id", "v").write.mode("overwrite")
      .parquet(s"$root/.batch-1.tmp")
    val st2 = new BatchStore(spark, root)
    assert(st2.batchIds().toSet === Set(0L, 1L),
      "a provably complete staged batch is recovered into service")
    assert(st2.all().count() === 2L)
  }

  // ---- manifest-backed row count ----

  test("rowCount: manifest tracks writes and idempotent overwrites, " +
    "serves with ZERO Spark jobs when consistent, and self-heals " +
    "after a rewrite") {
    import spark.implicits._
    val root = s"${freshDir()}/store"
    val st = new BatchStore(spark, root)
    st.writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    st.writeBatch(Seq((3L, "c")).toDF("id", "v"), 1L)
    assert(st.rowCount() === 3L)
    // idempotent overwrite of batch 1 replaces its count, not adds
    st.writeBatch(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), 1L)
    assert(st.rowCount() === 4L)
    // consistent manifest ⇒ no Spark job (the auto-refit poll must not
    // count a 10^9-row store on every streaming micro-batch)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(st.rowCount() === 4L)
      Thread.sleep(1500) // listener delivery is async; events arrive in ms
      assert(jobs.get() === 0,
        "rowCount() on a consistent manifest must run no Spark job")
    } finally spark.sparkContext.removeSparkListener(listener)
    // a rewrite changes per-batch counts: manifest invalidated, rebuilt
    st.rewrite(df => df.filter(col("id") =!= lit(1L)))
    assert(st.rowCount() === 3L)
    // a deleted manifest (advisory state) self-heals too
    Fs.deleteIfExists(s"$root.rows", hconf)
    assert(st.rowCount() === 3L)
  }

  test("rowCount manifest rebuild converges with an EMPTY batch present " +
    "(no perpetual re-count)") {
    import spark.implicits._
    val root = s"${freshDir()}/store"
    val st = new BatchStore(spark, root)
    st.writeBatch(Seq((1L, "a")).toDF("id", "v"), 0L)
    st.writeBatch(Seq.empty[(Long, String)].toDF("id", "v"), 1L) // rows-less trigger
    Fs.deleteIfExists(s"$root.rows", hconf) // lose the manifest
    assert(st.rowCount() === 1L) // rebuild must seed batch 1 with 0
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(st.rowCount() === 1L)
      Thread.sleep(1500)
      assert(jobs.get() === 0,
        "a rebuilt manifest missing the empty batch id would re-run " +
          "the full-store count on every later call")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("auto-refit is driven by DISTINCT identity growth: a re-put-heavy " +
    "stream does not refit an unchanged corpus, genuine growth still does") {
    import spark.implicits._
    val dir = s"${freshDir()}/idx"
    val idx = new graft.ops.IncrementalIndex(spark, dir,
      autoRefitGrowth = 2.0)
    val docs4 = (0 until 4).map(i =>
      (s"u$i", doc("a" + ('a' + i).toChar))).toDF("url", "text")
    idx.put(docs4)
    val statsAt = Fs.modifiedMs(s"$dir/stats", hconf).get
    Thread.sleep(1100) // mtime granularity
    // re-puts: rows grow 4 -> 16 while distinct docs stay 4 < 2x4
    (1 to 3).foreach(_ => idx.put(docs4))
    assert(Fs.modifiedMs(s"$dir/stats", hconf).get === statsAt,
      "re-puts of the same identities must not trigger a stats refit")
    // genuine growth: 16 fresh docs -> distinct 20 >= 8 (and rows pass
    // the geometric reconfirm backoff)
    idx.put((0 until 16).map(i =>
      (s"w$i", doc("b" + ('a' + i).toChar))).toDF("url", "text"))
    assert(Fs.modifiedMs(s"$dir/stats", hconf).get > statsAt,
      "genuine distinct growth past the threshold must refit")
  }

  test("IvfIndex auto-refit is driven by DISTINCT id growth too: " +
    "re-puts leave the codebook alone, genuine growth refits") {
    import spark.implicits._
    val dir = s"${freshDir()}/ivf"
    val idx = new graft.ops.IvfIndex(spark, dir, nCells = 4, nProbe = 2,
      autoRefitGrowth = 2.0)
    def vecs(n: Int, off: Long = 0L) = (0 until n).map(i =>
      (i + off, graft.data.SyntheticVectors.vectorOf(i + off, 16)))
      .toDF("id", "vec")
    idx.put(vecs(20))            // codebook fitted at n=20
    val bookAt = Fs.modifiedMs(s"$dir/codebook", hconf).get
    Thread.sleep(1100)           // mtime granularity
    // rows grow 20 -> 80 while distinct ids stay 20 < 2x20
    (1 to 3).foreach(_ => idx.put(vecs(20)))
    assert(Fs.modifiedMs(s"$dir/codebook", hconf).get === bookAt,
      "re-puts of the same ids must not refit the codebook")
    // genuine growth: 80 fresh ids -> distinct 100 >= 2x20, and rows
    // 160 >= 2x80 clear the geometric reconfirm backoff (the last
    // confirm ran at rows=80; a smaller growth batch would be DEFERRED
    // to the next put by design — the backoff trades at most one
    // growth factor of refit lag for not paying a distinct-count job
    // per re-put)
    idx.put(vecs(80, 20L))
    assert(Fs.modifiedMs(s"$dir/codebook", hconf).get > bookAt,
      "genuine distinct growth past the threshold must refit")
  }

  // ---- lease heartbeat + stale break ----

  test("the lease heartbeat keeps a mutation LONGER than the TTL alive " +
    "(a second writer still fails loudly), while a genuinely stale " +
    "lease is broken") {
    import spark.implicits._
    val root = s"${freshDir()}/store"
    val ttl = 1500L
    val st = new BatchStore(spark, root, leaseTtlMs = ttl)
    st.writeBatch(Seq((1L, "a")).toDF("id", "v"), 0L)
    val attacker = new BatchStore(spark, root, leaseTtlMs = ttl)
    st.withLease {
      Thread.sleep(3 * ttl) // hold far past the TTL; heartbeat refreshes
      val e = intercept[java.io.IOException](attacker.withLease(()))
      assert(e.getMessage.contains("another writer holds the lease"),
        "a live lease older than the TTL by wall-clock must NOT be " +
          "broken while its holder heartbeats")
    }
    // a genuinely stale lease (crashed holder: file exists, mtime old,
    // nobody heartbeating) is broken and the store stays mutable
    Fs.createExclusive(s"$root.lock", "crashed holder", hconf)
    val fs = Fs.fileSystem(root, hconf)
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$root.lock"),
      System.currentTimeMillis() - 10 * ttl, -1)
    attacker.withLease(()) // must succeed by breaking the stale lease
    assert(!Fs.exists(s"$root.lock", hconf))
  }

  // ---- last-put-wins identity: IvfIndex ----

  test("IvfIndex: re-putting an id with an updated vector serves the " +
    "LATEST vector and k DISTINCT neighbors (no duplicate ranks)") {
    import spark.implicits._
    val dir = s"${freshDir()}/ivf"
    val idx = new graft.ops.IvfIndex(spark, dir, nCells = 4, nProbe = 4)
    def vec(i: Long) = graft.data.SyntheticVectors.vectorOf(i, 16).toSeq
    idx.put((0L until 10L).map(i => (i, vec(i))).toDF("id", "vec"))
    // the update mutation: id 3 moves to a brand-new direction that is
    // EXACTLY the coming query's direction (old row would score ~0)
    idx.put(Seq((3L, vec(100L))).toDF("id", "vec"))
    val got = idx.search(Seq((999L, vec(100L))).toDF("id", "vec"), 5)
      .orderBy("rank")
      .as[(Long, Long, Int)].collect()
    assert(got.length === 5)
    assert(got.map(_._2).distinct.length === 5,
      "one stored identity must occupy at most ONE rank")
    assert(got.map(_._3).toSeq === Seq(1, 2, 3, 4, 5))
    assert(got.head._2 === 3L,
      "the re-put id must rank by its LATEST vector (cos 1.0 here)")
  }

  // ---- last-put-wins identity: ForestIndex ----

  test("ForestIndex: re-putting an id with an updated signature serves " +
    "the latest signature exactly once in the ranking") {
    import spark.implicits._
    import graft.hash.HashKernels.mix64
    val dir = s"${freshDir()}/forest"
    val f = new graft.lsh.ForestIndex(spark, dir)
    val qsig = mix64(999L)
    // id 5's ORIGINAL signature is 1 bit off the query (shares every
    // prefix, hamming 1) so its stale row WOULD surface as a candidate
    val rows = (1L to 20L).map(i =>
      (i, if (i == 5L) qsig ^ 1L else mix64(i)))
    f.put(rows.toDF("id", "sig"))
    f.put(Seq((5L, qsig)).toDF("id", "sig")) // the update: hamming 0
    val got = f.search(Seq((999L, qsig)).toDF("id", "sig"), 3)
      .as[(Long, Long, Int, Int)].collect()
    val id5 = got.filter(_._2 == 5L)
    assert(id5.length === 1,
      "the re-put id must appear at exactly one rank")
    assert(id5.head._3 === 0 && id5.head._4 === 1,
      "the LATEST signature (hamming 0) must be the one served")
  }

  // ---- last-put-wins identity: IncrementalIndex ----

  test("IncrementalIndex: re-putting a url with updated text serves one " +
    "match row with the NEWEST text's jaccard") {
    import spark.implicits._
    val dir = s"${freshDir()}/idx"
    val idx = new graft.ops.IncrementalIndex(spark, dir)
    val textA = doc("aa")
    val textC = textA.replace(" aah ", " changed ") // near edit of textA
    idx.put(Seq(("u1", textA), ("u2", doc("bb"))).toDF("url", "text"))
    idx.put(Seq(("u1", textC)).toDF("url", "text")) // same identity, new text
    val got = idx.search(Seq(("q", textC)).toDF("url", "text"))
      .as[(String, String, Double)].collect()
    val u1 = got.filter(_._2 == "u1")
    assert(u1.length === 1,
      "one stored identity must yield ONE match row, not one per batch")
    assert(u1.head._3 === 1.0,
      "the match must verify against the NEWEST stored text " +
        s"(jaccard 1.0 for an identical query), got ${u1.head._3}")
  }

  test("IncrementalIndex: searching an EMPTY index returns the empty " +
    "result without fitting corpus stats from a read path") {
    import spark.implicits._
    val dir = s"${freshDir()}/idx"
    val idx = new graft.ops.IncrementalIndex(spark, dir)
    val out = idx.search(Seq(("q", doc("aa"))).toDF("url", "text"))
    assert(out.columns.toSeq === Seq("query_url", "match_url", "jaccard"))
    assert(out.count() === 0L)
    assert(!Fs.exists(s"$dir/stats", hconf),
      "a read path must not publish first-fit corpus stats")
  }

  // ---- batch compaction ----

  test("IvfIndex.compact: batch dirs collapse, identities resolve " +
    "last-put-wins, searches and later puts unchanged") {
    import spark.implicits._
    val dir = s"${freshDir()}/ivf"
    val idx = new graft.ops.IvfIndex(spark, dir, nCells = 4, nProbe = 4)
    def vec(i: Long) = graft.data.SyntheticVectors.vectorOf(i, 16).toSeq
    idx.put((0L until 8L).map(i => (i, vec(i))).toDF("id", "vec"))
    idx.put(Seq((3L, vec(100L))).toDF("id", "vec")) // re-put: update
    idx.put((8L until 12L).map(i => (i, vec(i))).toDF("id", "vec"))
    val q = Seq((999L, vec(100L))).toDF("id", "vec")
    val before = idx.search(q, 5).orderBy("rank")
      .as[(Long, Long, Int)].collect().toSeq
    idx.compact(2L) // all three batches collapse into batch=2
    val store = new graft.ckpt.BatchStore(spark, s"$dir/rows",
      subPartitionCols = Seq("cell"))
    assert(store.batchIds() === Seq(2L), "one consolidated batch dir")
    assert(store.rowCount() === 12L,
      "the re-put id keeps ONE row after identity resolution")
    val after = idx.search(q, 5).orderBy("rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(after === before,
      "compaction must not change what searches serve")
    assert(after.head._2 === 3L, "the re-put id still serves its LATEST vector")
    // nextBatchId stays monotone: a later put lands past the compacted id
    idx.put(Seq((50L, vec(50L))).toDF("id", "vec"))
    assert(store.batchIds().toSet === Set(2L, 3L))
  }

  test("IncrementalIndex.compact: both stores consolidate consistently; " +
    "search serves the newest identity afterwards") {
    import spark.implicits._
    val dir = s"${freshDir()}/idx"
    val idx = new graft.ops.IncrementalIndex(spark, dir)
    val textA = doc("aa")
    val textC = textA.replace(" aah ", " changed ")
    idx.put(Seq(("u1", textA), ("u2", doc("bb"))).toDF("url", "text"))
    idx.put(Seq(("u1", textC)).toDF("url", "text"))
    idx.compact(1L)
    assert(Fs.listNames(s"$dir/sigs", hconf).count(_.startsWith("batch=")) === 1)
    assert(Fs.listNames(s"$dir/bands", hconf).count(_.startsWith("batch=")) === 1)
    assert(idx.all().count() === 2L,
      "u1's superseded signature row is resolved away at compaction")
    val got = idx.search(Seq(("q", textC)).toDF("url", "text"))
      .as[(String, String, Double)].collect().filter(_._2 == "u1")
    assert(got.length === 1 && got.head._3 === 1.0)
  }

  // ---- refit over a band layout that never landed ----

  test("refit() repairs an index whose only put crashed between its two " +
    "writes (signatures landed, band layout never created)") {
    import spark.implicits._
    val dir = s"${freshDir()}/idx"
    val idx = new graft.ops.IncrementalIndex(spark, dir)
    idx.put(Seq(("u1", doc("aa")), ("u2", doc("bb"))).toDF("url", "text"))
    // simulate: the band layout never landed
    Fs.deleteIfExists(s"$dir/bands", hconf)
    idx.refit() // must regenerate the layout instead of throwing
    assert(Fs.exists(s"$dir/bands", hconf))
    val near = doc("bb").replace(" bbh ", " changed ")
    val m = idx.search(Seq(("q", near)).toDF("url", "text"))
      .select("match_url").as[String].collect().toSet
    assert(m === Set("u2"))
  }

  // ---- refit stamps its fit size in LIVE identities, not rows ----
  // (a rows-unit stamp would ratchet the next auto-refit threshold by
  // the re-put duplication factor: refit at 20 ids across 80 rows
  // stamps 80, and the next refit then waits for growth×80 ids)

  test("IvfIndex.refit() on a re-put-heavy store stamps live identities: " +
    "the next genuine growth still auto-refits at the intended threshold") {
    import spark.implicits._
    val dir = s"${freshDir()}/ivf"
    val idx = new graft.ops.IvfIndex(spark, dir, nCells = 4, nProbe = 2,
      autoRefitGrowth = 2.0)
    def vecs(n: Int, off: Long = 0L) = (0 until n).map(i =>
      (i + off, graft.data.SyntheticVectors.vectorOf(i + off, 16)))
      .toDF("id", "vec")
    idx.put(vecs(20))
    (1 to 3).foreach(_ => idx.put(vecs(20))) // 80 rows, 20 live ids
    idx.refit() // must stamp 20 (live), not 80 (rows)
    val bookAt = Fs.modifiedMs(s"$dir/codebook", hconf).get
    Thread.sleep(1100) // mtime granularity
    // 80 fresh ids: distinct 100 >= 2×20 clears the (live-unit)
    // threshold, and rows 160 >= 2×80 clear the geometric reconfirm
    // backoff. Against a rows-unit stamp (atFit=80) the distinct
    // bound 100 < 160 would defer the refit indefinitely.
    idx.put(vecs(80, 20L))
    assert(Fs.modifiedMs(s"$dir/codebook", hconf).get > bookAt,
      "genuine distinct growth past growth×LIVE must refit")
  }

  test("IncrementalIndex.refit() on a re-put-heavy store stamps live " +
    "docs: the next genuine growth still auto-refits at the intended " +
    "threshold") {
    import spark.implicits._
    val dir = s"${freshDir()}/idx"
    val idx = new graft.ops.IncrementalIndex(spark, dir,
      autoRefitGrowth = 2.0)
    val docs4 = (0 until 4).map(i =>
      (s"u$i", doc("a" + ('a' + i).toChar))).toDF("url", "text")
    idx.put(docs4)
    (1 to 3).foreach(_ => idx.put(docs4)) // 16 rows, 4 live docs
    idx.refit() // must stamp 4 (live), not 16 (rows)
    val statsAt = Fs.modifiedMs(s"$dir/stats", hconf).get
    Thread.sleep(1100)
    // 16 fresh docs: distinct 20 >= 2×4 clears the live-unit
    // threshold, rows 32 >= 2×16 clear the reconfirm backoff; a
    // rows-unit stamp (16) would need distinct >= 32 and never refit
    idx.put((0 until 16).map(i =>
      (s"w$i", doc("b" + ('a' + i).toChar))).toDF("url", "text"))
    assert(Fs.modifiedMs(s"$dir/stats", hconf).get > statsAt,
      "genuine distinct growth past growth×LIVE must refit")
  }

  // ---- ForestIndex.all() resolves identities ----

  test("ForestIndex.all() serves one row per document after a re-put, " +
    "carrying the newest signature") {
    import spark.implicits._
    import graft.hash.HashKernels.mix64
    val dir = s"${freshDir()}/forest"
    val f = new graft.lsh.ForestIndex(spark, dir)
    f.put((1L to 5L).map(i => (i, mix64(i))).toDF("id", "sig"))
    f.put(Seq((3L, mix64(333L))).toDF("id", "sig")) // the update
    val rows = f.all().select("id", "sig")
      .as[(Long, Long)].collect().toMap
    assert(rows.size === 5, "all() must resolve re-puts to one row per id")
    assert(rows(3L) === mix64(333L), "the NEWEST signature must be served")
  }

  // ---- rowCount under a busy lease: serve, don't persist ----

  test("rowCount() with a stale manifest under a BUSY lease serves the " +
    "correct count without persisting; the next uncontended call persists") {
    import spark.implicits._
    val root = s"${freshDir()}/store"
    val st = new BatchStore(spark, root)
    st.writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    Fs.deleteIfExists(s"$root.rows", hconf) // stale (missing) manifest
    val holder = new BatchStore(spark, root)
    holder.withLease {
      // a reader's recount racing a writer must NOT write the manifest
      // (its counts could be stale against the writer's in-flight
      // batch overwrite) — it serves the count and leaves persistence
      // to an uncontended call
      assert(st.rowCount() === 2L)
      assert(!Fs.exists(s"$root.rows", hconf),
        "rowCount must not persist the manifest without the lease")
    }
    assert(st.rowCount() === 2L) // uncontended: rebuilds AND persists
    assert(Fs.exists(s"$root.rows", hconf))
  }

  // ---- band-budget + skew contracts on the embedding LSH family ----

  test("simhashBandKeys rejects tables*bits > 64 (Java shift masking " +
    "would silently alias the overflow bands onto low-bit windows)") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Seq(1L).toDF("sig").select(
        graft.lsh.Lsh.simhashBandKeys(col("sig"), 16, 6))
    }
    assert(e.getMessage.contains("exceeds the 64-bit"))
  }

  test("cosineNearDup on an all-identical-vector corpus is chain-" +
    "bounded, not the O(n^2) cross join") {
    import spark.implicits._
    val n = 200
    val vecs = (0 until n).map(i =>
      (i.toLong, Seq.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val pairs = graft.ops.TrainingDataOps.cosineNearDup(
      vecs, "vec_id", "embedding", tau = 0.99,
      maxBucket = 64, chainWidth = 3)
    val got = pairs.select("a_id", "b_id").as[(Long, Long)].collect()
    // chain pairing: ~n*chainWidth pairs instead of n(n-1)/2 = 19900
    assert(got.length < 1500,
      s"${got.length} pairs — the mega-bucket was not chain-bounded")
    // every doc still reachable: the chain keeps the duplicate CLASS
    // connected for the downstream connected-components resolve
    val members = got.flatMap(p => Seq(p._1, p._2)).toSet
    assert(members === (0L until n.toLong).toSet,
      "chain pairing must keep every member of the class connected")
  }

  test("substringEdges rejects minRun below the k=8 anchor floor " +
    "instead of silently weakening its guarantee") {
    import spark.implicits._
    val docs = Seq((1L, "abcdef"), (2L, "abcdef")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.substr.SuffixArrayStage.substringEdges(docs, "doc_id", "text", 6)
    }
    assert(e.getMessage.contains("k=8"))
  }

  test("ForestIndex pins its stored geometry: reopening with different " +
    "prefixBits/tables fails loudly instead of silently mis-pruning") {
    import spark.implicits._
    import graft.hash.HashKernels.mix64
    val dir = s"${freshDir()}/forest"
    val f = new graft.lsh.ForestIndex(spark, dir, prefixBits = 6)
    f.put((1L to 10L).map(i => (i, mix64(i))).toDF("id", "sig"))
    val wrong = new graft.lsh.ForestIndex(spark, dir, prefixBits = 7)
    val e = intercept[IllegalArgumentException] {
      wrong.put(Seq((11L, mix64(11L))).toDF("id", "sig"))
    }
    assert(e.getMessage.contains("prefixBits"))
    // the ORIGINAL geometry still works
    val same = new graft.lsh.ForestIndex(spark, dir, prefixBits = 6)
    same.put(Seq((11L, mix64(11L))).toDF("id", "sig"))
    assert(same.all().count() === 11L)
  }

  test("ForestIndex.search on a never-written store returns the empty " +
    "result, not a parquet PATH_NOT_FOUND") {
    import spark.implicits._
    import graft.hash.HashKernels.mix64
    val f = new graft.lsh.ForestIndex(spark, s"${freshDir()}/forest")
    val got = f.search(Seq((1L, mix64(1L))).toDF("id", "sig"), 3)
    assert(got.count() === 0L)
    assert(got.columns.toSeq ===
      Seq("query_id", "neighbor_id", "hamming", "rank"))
  }

  // ---- serving-path pin hygiene (invariant 32 on the read side) ----

  test("search on all three mutable indexes retains ONLY its own result " +
    "snapshot — query-side pins are freed per call") {
    import spark.implicits._
    def addedAfter[A](before: scala.collection.Set[Int])
                     (res: org.apache.spark.sql.DataFrame)
    : Unit = {
      val added = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(added.size <= 1,
        s"search retained ${added.size} block sets (query pins must be " +
          "freed eagerly): " + added.map(
            spark.sparkContext.getPersistentRDDs(_).toString).mkString("; "))
      graft.ckpt.Checkpoints.free(res)
      assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
        "freeing the result must leave nothing behind")
    }
    // IncrementalIndex (text near-dup serving)
    val inc = new graft.ops.IncrementalIndex(spark, s"${freshDir()}/inc")
    inc.put(Seq(("u1", doc("aa")), ("u2", doc("bb"))).toDF("url", "text"))
    val near = doc("aa").replace(" aah ", " changed ")
    val b1 = spark.sparkContext.getPersistentRDDs.keySet
    addedAfter(b1)(inc.search(Seq(("q", near)).toDF("url", "text")))
    // IvfIndex (embedding ANN serving)
    def vec(i: Long) = graft.data.SyntheticVectors.vectorOf(i, 16).toSeq
    val ivf = new graft.ops.IvfIndex(spark, s"${freshDir()}/ivf",
      nCells = 4, nProbe = 4)
    ivf.put((0L until 8L).map(i => (i, vec(i))).toDF("id", "vec"))
    val b2 = spark.sparkContext.getPersistentRDDs.keySet
    addedAfter(b2)(ivf.search(Seq((99L, vec(2L))).toDF("id", "vec"), 3))
    // ForestIndex (signature ANN serving)
    import graft.hash.HashKernels.mix64
    val f = new graft.lsh.ForestIndex(spark, s"${freshDir()}/forest")
    f.put((1L to 10L).map(i => (i, mix64(i))).toDF("id", "sig"))
    val b3 = spark.sparkContext.getPersistentRDDs.keySet
    addedAfter(b3)(f.search(Seq((99L, mix64(3L))).toDF("id", "sig"), 3))
    // ForestIndex again on the QUOTA-MET exit (the dense-corpus common
    // case): every stored sig equals the query sig, so the expansion
    // leaves at the FIRST round with an empty next-pending snapshot —
    // the one exit path that orphaned a block set
    val qsig = mix64(42L)
    val fd = new graft.lsh.ForestIndex(spark, s"${freshDir()}/forest2")
    fd.put((1L to 10L).map(i => (i, qsig)).toDF("id", "sig"))
    val b4 = spark.sparkContext.getPersistentRDDs.keySet
    addedAfter(b4)(fd.search(Seq((99L, qsig)).toDF("id", "sig"), 3))
  }

  test("fingerprint normalises whitespace for real: repeated/leading/" +
    "trailing spaces collapse to the same key") {
    import spark.implicits._
    val got = Seq(("a b", 1), ("a  b", 2), (" a b ", 3), ("a c", 4))
      .toDF("text", "i")
      .select(graft.ops.TrainingDataOps.fingerprint(col("text")).as("fp"))
      .as[String].collect()
    assert(got(0) === got(1) && got(0) === got(2),
      "the same token stream must fingerprint identically")
    assert(got(0) !== got(3))
  }
}
