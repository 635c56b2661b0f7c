package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ckpt.{BatchStore, Fs}

/** Compaction lifecycle contracts (round-5 verdict item #5), on the
  * [[BatchStore]] substrate all three mutable indexes share plus the
  * richest index surface (IvfIndex):
  *
  *  1. a crash at ANY point inside `compact()`'s rewrite leaves the
  *     store readable, and the next open heals it (aside protocol);
  *  2. a search completed before/while a compact lands is unaffected
  *     (search() materializes its snapshot), and re-searches serve
  *     identical results;
  *  3. post-compact the rowCount manifest, batch ids and later puts
  *     stay consistent (the manifest self-heals from the data).
  */
class Round6CompactionSpec extends AnyFunSuite with SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-r6-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Three batches with a cross-batch re-put: 0→(1,2), 1→(2 updated,
    * 3), 2→(4). Compacting upTo=1 must keep id 2's batch-1 value. */
  private def seed(st: BatchStore): Unit = {
    import spark.implicits._
    st.writeBatch(Seq((1L, "a0"), (2L, "b0")).toDF("id", "v"), 0L)
    st.writeBatch(Seq((2L, "b1"), (3L, "c1")).toDF("id", "v"), 1L)
    st.writeBatch(Seq((4L, "d2")).toDF("id", "v"), 2L)
  }

  private val expectedCompacted: Set[(Long, String, Long)] =
    Set((1L, "a0", 1L), (2L, "b1", 1L), (3L, "c1", 1L), (4L, "d2", 2L))

  private def rows(st: BatchStore): Set[(Long, String, Long)] =
    st.all().select("id", "v", "batch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  /** Replicate exactly what compact()'s rewrite stages into the swap
    * dir, so the crash points can be cut between its file operations. */
  private def stageCompactSwap(st: BatchStore, root: String, upTo: Long): Unit = {
    val df = st.all()
    val resolved = BatchStore
      .latestBatchRows(df.filter(col("batch") <= upTo), "id")
      .withColumn("batch", lit(upTo))
    df.filter(col("batch") > upTo).unionByName(resolved)
      .repartition(col("batch"))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$root.swap")
  }

  test("crash point A (staging written, swap not started): store serves " +
    "its old state, and a later real compact() reclaims the orphan") {
    val root = s"${freshDir()}/store"
    val st = new BatchStore(spark, root)
    seed(st)
    val before = rows(st)
    stageCompactSwap(st, root, 1L) // crash: swap dir staged, commit never began
    val st2 = new BatchStore(spark, root) // recoverSwap leaves intact dst alone
    assert(rows(st2) === before, "old state must keep serving")
    assert(st2.batchIds().sorted === Seq(0L, 1L, 2L))
    assert(st2.rowCount() === 5L)
    st2.compact(1L)(BatchStore.latestBatchRows(_, "id"))
    assert(rows(st2) === expectedCompacted,
      "the abandoned swap dir must not poison a later compact")
    assert(st2.batchIds().sorted === Seq(1L, 2L))
    assert(st2.rowCount() === 4L)
  }

  test("crash point B (aside renamed, commit rename not yet done): the " +
    "next open promotes the complete swap and serves the compacted rows") {
    val root = s"${freshDir()}/store"
    val st = new BatchStore(spark, root)
    seed(st)
    stageCompactSwap(st, root, 1L)
    // mimic rewrite's commit sequence up to the crash: manifest
    // invalidated, dst renamed aside — then the process dies
    Fs.deleteIfExists(s"$root.rows", hconf)
    Fs.rename(root, s"$root.old", hconf)
    val st2 = new BatchStore(spark, root) // recoverSwap: aside certifies src
    assert(rows(st2) === expectedCompacted,
      "recovery must complete the commit, not roll it back")
    assert(st2.batchIds().sorted === Seq(1L, 2L))
    assert(st2.rowCount() === 4L, "rowCount manifest rebuilds from the data")
    assert(!Fs.exists(s"$root.old", hconf), "aside garbage is dropped")
    assert(!Fs.exists(s"$root.swap", hconf), "swap dir was consumed")
  }

  test("crash point C (commit done, aside not yet dropped): the next " +
    "open drops the garbage and the store serves the compacted rows") {
    val root = s"${freshDir()}/store"
    val st = new BatchStore(spark, root)
    seed(st)
    stageCompactSwap(st, root, 1L)
    Fs.deleteIfExists(s"$root.rows", hconf)
    Fs.rename(root, s"$root.old", hconf)
    Fs.rename(s"$root.swap", root, hconf) // commit landed; crash here
    val st2 = new BatchStore(spark, root)
    assert(rows(st2) === expectedCompacted)
    assert(!Fs.exists(s"$root.old", hconf), "stale aside is dropped on open")
    assert(st2.rowCount() === 4L)
  }

  test("IvfIndex: a search materialized before compact is unaffected by " +
    "it; re-searches and later puts serve identical, consistent results") {
    import spark.implicits._
    val dir = s"${freshDir()}/ivf"
    val idx = new graft.ops.IvfIndex(spark, dir, nCells = 4, nProbe = 4)
    def vec(i: Long) = graft.data.SyntheticVectors.vectorOf(i, 16).toSeq
    idx.put((0L until 8L).map(i => (i, vec(i))).toDF("id", "vec"))
    idx.put(Seq((3L, vec(100L))).toDF("id", "vec"))
    idx.put((8L until 12L).map(i => (i, vec(i))).toDF("id", "vec"))
    val q = Seq((999L, vec(100L))).toDF("id", "vec")
    val live = idx.search(q, 5) // materialized snapshot (localCheckpoint)
    val before = live.orderBy("rank").as[(Long, Long, Int)].collect().toSeq
    idx.compact(2L) // the old batch dirs are REPLACED underneath
    assert(live.orderBy("rank").as[(Long, Long, Int)].collect().toSeq
      === before,
      "a search() result handed out before compact must survive the " +
        "compact — search materializes its snapshot precisely so no " +
        "consumer holds a lazy plan over store files a rewrite deletes")
    assert(idx.search(q, 5).orderBy("rank").as[(Long, Long, Int)]
      .collect().toSeq === before,
      "a fresh search over the compacted store serves identical results")
    // later mutation: next batch id is past the compacted id, search
    // picks the new row up — the compacted store is fully live. Query
    // with a fresh direction (cluster 999/2=499, disjoint from every
    // stored cluster) so the new row is the only cos≈1 neighbor.
    idx.put(Seq((50L, vec(999L))).toDF("id", "vec"))
    val q2 = Seq((1999L, vec(999L))).toDF("id", "vec")
    val after = idx.search(q2, 1).as[(Long, Long, Int)].collect().toSeq
    assert(after.head._2 === 50L,
      "post-compact puts must serve (the new vector matches the query " +
        "exactly; every other stored cluster is near-orthogonal)")
  }
}
