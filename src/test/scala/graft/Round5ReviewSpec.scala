package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ckpt.{BatchStore, Fs}

/** Round-5 final-review contracts: the row-count rebuild never blocks
  * (or is blocked by) the writer lease, the ForestIndex geometry
  * manifest fails loudly when unreadable and guards compact() like
  * every other mutation, and IvfIndex.refit stamps DISTINCT identities
  * even when a batch re-states an id. */
class Round5ReviewSpec extends AnyFunSuite with SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-r5r-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

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
}
