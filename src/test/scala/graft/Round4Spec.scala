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

  // ---- band-bucketed serving layout: pruned search (VERDICT r3 #2) ----

  /** Even/odd id pairs differ by one low bit — Hamming-1 planted
    * partners (id ^ 1 is each doc's true nearest neighbour). */
  private def plantedSigs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val base = new scala.util.Random(i / 2).nextLong() & ~1L
      (i.toLong, if (i % 2 == 0) base else base ^ 1L)
    }.toDF("id", "sig")
  }

  test("ForestIndex.search prunes the stored scan to the query's tb " +
    "partitions (PartitionFilters) and matches the unpruned batch path " +
    "exactly") {
    import spark.implicits._
    val dir = s"${freshDir()}/forest"
    val idx = new graft.lsh.ForestIndex(spark, dir)
    val rows = plantedSigs(400)
    idx.put(rows.filter($"id" < 200))
    idx.put(rows.filter($"id" >= 200))
    val queries = rows.filter($"id" % 20 === 0)
      .select($"id", $"sig")
    val res = idx.search(queries, 3)
    // 1. the stored side is partition-pruned: the band-store scan must
    // carry a non-trivial PartitionFilters entry on tb (asserted on the
    // exact frame search() scans — the search result itself is
    // checkpoint-cut and no longer shows the file scan)
    val plan = idx.prunedStored(queries)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*tb#\\d+ IN".r.findFirstIn(plan).isDefined,
      s"no tb partition pruning in stored scan:\n${plan.take(6000)}")
    // 2. pruning drops no true candidates: exact equality with the
    // unpruned batch-search path over the same (id, sig) rows
    val pruned = res.select("query_id", "neighbor_id", "hamming", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val full = graft.lsh.LshForest.searchTopK(
        rows, "id", queries.select($"id", $"sig"), "id", "sig", 3)
      .select("query_id", "neighbor_id", "hamming", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(pruned === full,
      s"pruned != full: missing=${full -- pruned}, extra=${pruned -- full}")
    // planted Hamming-1 partner is rank 1 for every query
    val top1 = pruned.filter(_._4 == 1).map(t => t._1 -> t._2).toMap
    assert(queries.select("id").as[Long].collect()
      .forall(q => top1.get(q).contains(q ^ 1L)))
  }

  test("IncrementalIndex.search reads only the query's pb partitions " +
    "(PartitionFilters on the band store)") {
    import spark.implicits._
    val tmp = s"${freshDir()}/idx"
    val idx = new graft.ops.IncrementalIndex(spark, tmp)
    def doc(p: String) = (1 to 60).map(i =>
      p + ('a' + i % 26).toChar.toString * (1 + i / 26)).mkString(" ")
    idx.put(Seq(("u1", doc("aa")), ("u2", doc("bb"))).toDF("url", "text"))
    idx.put(Seq(("u3", doc("cc"))).toDF("url", "text"))
    val near = doc("aa").replace(" aah ", " changed ")
    val res = idx.search(Seq(("q1", near)).toDF("url", "text"))
    val plan = res.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pb#\\d+ IN".r.findFirstIn(plan).isDefined,
      s"no pb partition pruning in stored band scan:\n${plan.take(6000)}")
    val m = res.select("query_url", "match_url")
      .as[(String, String)].collect().toSet
    assert(m === Set(("q1", "u1")))
  }
}
