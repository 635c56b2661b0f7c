package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ckpt.{BatchStore, Fs}

/** Round-4 contracts: crash-safe swap commit (the store root is never
  * the only casualty of a mid-commit crash), swap recovery on open,
  * and the single-writer lease on [[BatchStore]] mutations. */
class Round4Spec extends AnyFunSuite with SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-r4-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def newStore(root: String, ttlMs: Long = 60L * 60 * 1000) =
    new BatchStore(spark, root, ttlMs)

  private def seeded(root: String): BatchStore = {
    import spark.implicits._
    val st = newStore(root)
    st.writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    st.writeBatch(Seq((3L, "c")).toDF("id", "v"), 1L)
    st
  }

  test("swapInto: root is never missing-with-data-orphaned; a crash " +
    "between aside and commit is completed by recoverSwap on open") {
    val root = s"${freshDir()}/sigs"
    seeded(root)
    // simulate the crash window the old delete-then-rename protocol
    // left fatal: new data fully written to the swap dir, old root
    // renamed aside, commit rename never ran
    val fs = Fs.fileSystem(root, hconf)
    import org.apache.hadoop.fs.{Path => HPath}
    import spark.implicits._
    val tmpDir = freshDir()
    val tmp = new BatchStore(spark, s"$tmpDir/tmpstore")
    tmp.writeBatch(Seq((9L, "z")).toDF("id", "v"), 7L)
    assert(fs.rename(new HPath(root), new HPath(root + ".old")))
    assert(fs.rename(new HPath(s"$tmpDir/tmpstore"), new HPath(root + ".swap")))
    // root is now missing; a raw isEmpty would read true and a new put
    // would silently start batch=0 over the orphan — opening the store
    // must instead complete the pending swap before serving anything
    val st = newStore(root)
    assert(!st.isEmpty, "recovery must complete the pending swap commit")
    val ids = st.all().select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    assert(ids === Seq(9L), "recovered store must serve the NEW (swap) data")
    assert(!fs.exists(new HPath(root + ".old")), "aside copy cleaned up")
    assert(st.nextBatchId() === 8L)
  }

  test("recoverSwap: only the aside copy surviving restores the old data") {
    val root = s"${freshDir()}/sigs"
    seeded(root)
    val fs = Fs.fileSystem(root, hconf)
    import org.apache.hadoop.fs.{Path => HPath}
    assert(fs.rename(new HPath(root), new HPath(root + ".old")))
    val st = newStore(root)
    assert(!st.isEmpty)
    assert(st.all().count() === 3)
  }

  test("swapInto failure restores the aside copy (store keeps serving)") {
    val root = s"${freshDir()}/sigs"
    seeded(root)
    // src does not exist -> rename fails -> old state must come back
    intercept[java.io.IOException] {
      Fs.swapInto(s"$root.swap", root, hconf)
    }
    assert(newStore(root).all().count() === 3)
  }

  test("BatchStore lease: a second writer fails loudly instead of " +
    "silently clobbering the first's batch id") {
    import spark.implicits._
    val root = s"${freshDir()}/sigs"
    val st = seeded(root)
    val ex = intercept[java.io.IOException] {
      st.withLease {
        // a concurrent writer arriving while the lease is held
        newStore(root).append(Seq((4L, "d")).toDF("id", "v"))
      }
    }
    assert(ex.getMessage.contains("lease"))
    // lease released after the holder finishes: next append works and
    // allocates past the existing batches
    assert(newStore(root).append(Seq((4L, "d")).toDF("id", "v")) === 2L)
    assert(st.all().count() === 4)
  }

  test("BatchStore lease: a stale (crashed-writer) lease is broken " +
    "after the TTL") {
    import spark.implicits._
    val root = s"${freshDir()}/sigs"
    seeded(root)
    // leave a lease file behind as a crashed writer would
    assert(Fs.createExclusive(s"$root.lock", "123", hconf))
    Thread.sleep(20)
    val st = newStore(root, ttlMs = 1L)
    assert(st.append(Seq((5L, "e")).toDF("id", "v")) === 2L)
  }

  test("ForestIndex.search accepts the documented qid column name") {
    import spark.implicits._
    val dir = s"${freshDir()}/forest"
    val idx = new graft.lsh.ForestIndex(spark, dir)
    idx.put(Seq((1L, 0x0L), (2L, -1L)).toDF("id", "sig"))
    val hits = idx.search(Seq((10L, 0x1L)).toDF("qid", "sig"), 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(hits.toSeq === Seq((10L, 1L)))
  }
}
