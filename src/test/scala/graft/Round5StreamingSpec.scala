package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Failure-replay contracts for the streaming ingestion paths — the
  * exactly-once story a pipeline operator asks about first: a killed
  * query restarted from its checkpoint must not duplicate index rows,
  * and an at-least-once foreachBatch replay (batch work done, streaming
  * commit lost) must overwrite itself. */
class Round5StreamingSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-r5s-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def doc(p: String) = (1 to 60).map(i =>
    p + ('a' + i % 26).toChar.toString * (1 + i / 26)).mkString(" ")

  test("StreamingDedup: kill + restart from checkpoint replays only " +
    "uncommitted batches — no duplicate rows, search identical to a " +
    "single-pass build") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = freshDir()
    val idxDir = s"$base/idx"
    val ckpt = s"$base/ckpt"
    // prefixes must be LETTERS only: the [\p{L}]+ tokenizer treats
    // digits as separators, so digit-bearing prefixes would tokenize
    // every doc of a batch to one identical stream
    val batchA = (0 until 6).map(i =>
      (s"a$i", doc("a" + ('a' + i).toChar)))
    val batchB = (0 until 6).map(i =>
      (s"b$i", doc("b" + ('a' + i).toChar)))

    val stream = MemoryStream[(String, String)]
    val q1 = graft.streaming.StreamingDedup.start(
      spark, stream.toDF().toDF("url", "text"), idxDir,
      checkpointLocation = Some(ckpt))
    stream.addData(batchA: _*)
    q1.processAllAvailable()
    q1.stop() // the kill: batch 0 committed, nothing else

    // the crash window foreachBatch leaves behind (at-least-once):
    // batch 1's INDEX write completed but the streaming commit never
    // landed — on restart the engine re-runs batch 1 from the source
    val idx = new graft.ops.IncrementalIndex(spark, idxDir)
    idx.putBatch(batchB.toDF("url", "text"), 1L)

    val q2 = graft.streaming.StreamingDedup.start(
      spark, stream.toDF().toDF("url", "text"), idxDir,
      checkpointLocation = Some(ckpt))
    stream.addData(batchB: _*) // arrives as batch 1 — the replay
    q2.processAllAvailable()
    q2.stop()

    val stored = idx.all()
    assert(stored.count() === 12L,
      "replayed batch must overwrite its own partition, not duplicate")
    assert(stored.select("url").distinct().count() === 12L)

    // search results must equal a fresh single-pass build's. Match urls
    // are compared (not jaccard magnitudes: the fresh build fits its
    // corpus stats over all 12 docs while the streamed one fitted on
    // batch A — both valid fits, slightly different df-conditioning)
    val fresh = new graft.ops.IncrementalIndex(spark, s"$base/fresh")
    fresh.put((batchA ++ batchB).toDF("url", "text"))
    val near = doc("bd").replace(" bdh ", " changed ")
    def results(ix: graft.ops.IncrementalIndex) =
      ix.search(Seq(("q", near)).toDF("url", "text"))
        .as[(String, String, Double)].collect().toSet
    assert(results(idx).map(_._2) === results(fresh).map(_._2))
    assert(results(idx).map(_._2) === Set("b3"))
  }

  test("StreamingAnnIngest: an onMatches crash mid-batch fails the " +
    "query; restart from checkpoint replays the batch — no duplicate " +
    "vectors, search identical to a single-pass build") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = freshDir()
    val idxDir = s"$base/ivf"
    val ckpt = s"$base/ckpt"
    def vec(i: Long) = graft.data.SyntheticVectors.vectorOf(i, 16).toSeq

    val stream = MemoryStream[(Long, Seq[Float])]
    @volatile var injectCrash = true
    def begin() = graft.streaming.StreamingAnnIngest.start(
      spark, stream.toDF().toDF("id", "vec"), idxDir,
      k = 1, nCells = 4, nProbe = 4, autoRefitGrowth = 0.0,
      checkpointLocation = Some(ckpt),
      onMatches = m => {
        if (injectCrash) { injectCrash = false; sys.error("injected crash") }
        m.count(); ()
      })

    val q1 = begin()
    stream.addData((0L until 8L).map(i => (i, vec(i))): _*)
    // batch 0: put-first has already landed the batch in the index
    // when onMatches throws — the query dies with the streaming commit
    // never written, the at-least-once window putBatch exists for
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()

    val q2 = begin() // restart: checkpoint says batch 0 uncommitted
    // replays batch 0 (overwrites its own partition — idempotent),
    // then processes batch 1 clean
    stream.addData((8L until 16L).map(i => (i, vec(i))): _*)
    q2.processAllAvailable()
    q2.stop()

    val idx = new graft.ops.IvfIndex(spark, idxDir, nCells = 4, nProbe = 4)
    assert(idx.all().count() === 16L,
      "the replayed batch must land exactly once")
    assert(idx.all().select("id").distinct().count() === 16L)
    // planted partner of id i is i XOR 1 — identical to a fresh build
    val got = idx.search(Seq((999L, vec(6L))).toDF("id", "vec"), 1)
      .as[(Long, Long, Int)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((999L, 6L)))
  }

  test("put-first ingest: near-duplicates arriving in the SAME " +
    "micro-batch match each other — including in the very first batch " +
    "(search-before-put left a co-arriving pair silent FOREVER: " +
    "neither doc is ever a query again)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = freshDir()
    val a = doc("xy")
    val near = a.replace(" xyb ", " changed ")
    val matches = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]

    val stream = MemoryStream[(String, String)]
    val q = graft.streaming.StreamingDedup.start(
      spark, stream.toDF().toDF("url", "text"), s"$base/idx",
      checkpointLocation = Some(s"$base/ckpt"),
      onMatches = m => m.select("query_url", "match_url")
        .as[(String, String)].collect().foreach(matches.add))
    // ONE batch: the pair arrives together, plus an unrelated singleton
    stream.addData(("u1", a), ("u2", near), ("u3", doc("zz")))
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val got = matches.asScala.toSet
    assert(got === Set(("u1", "u2"), ("u2", "u1")),
      s"co-arriving pair must surface both ways, self excluded (got $got)")
  }
}
