package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TrainingDataOps

/** Training-pipeline operators added round 4b: deterministic
  * content-keyed splits, benchmark decontamination, and the streaming
  * embedding-ingest wiring over the IVF serving index. */
class SplitDecontamSpec extends AnyFunSuite with SparkSpec {

  test("hashSplitBucket is content-keyed and deterministic: same text " +
    "same bucket regardless of id or run; all buckets in range") {
    import spark.implicits._
    val docs = (0 until 200).map(i => (i.toLong, s"doc text number ${i % 50}"))
      .toDF("id", "text")
    val a = docs.select(col("id"),
      TrainingDataOps.hashSplitBucket(col("text"), 10).as("b"))
      .as[(Long, Long)].collect().toMap
    val b = docs.orderBy(col("id").desc).repartition(7)
      .select(col("id"), TrainingDataOps.hashSplitBucket(col("text"), 10).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(a === b, "bucket must not depend on partitioning or order")
    assert(a.values.forall(v => v >= 0 && v < 10))
    // content-keyed: docs with identical text land together
    assert(a(3L) === a(53L) && a(3L) === a(103L),
      "same text (i % 50 repeats) must share a bucket")
  }

  test("tokenWindows: n-token windows joined by single spaces; short " +
    "docs yield none") {
    import spark.implicits._
    val got = Seq("a b c d", "a b", "").toDF("t")
      .select(TrainingDataOps.tokenWindows(col("t"), 3).as("w"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the " +
    "benchmark, with distinct-hit counts, via a broadcast join") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t u v w x y"),        // contains bench1 window
      (2L, "a a p q r s b b"),            // 4-token fragment only — clean
      (3L, "m p q r s t m m p q r s t m"),// bench1 twice -> 1 distinct hit
      (4L, "c d e f g h i j"),            // contains bench2
      (5L, "p q r s t c d e f g")         // bench1 AND bench2 -> 2 hits
    ).toDF("doc_id", "text")
    val bench = Seq("z z p q r s t z", "y c d e f g y").toDF("btext")
    val got = TrainingDataOps.decontaminate(docs, "doc_id", "text",
        bench, "btext", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L),
      s"flag set/count wrong: $got")
    val plan = TrainingDataOps.decontaminate(docs, "doc_id", "text",
        bench, "btext", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n${plan.take(3000)}")
  }

  test("streaming ANN ingest: micro-batches accrete the IVF index " +
    "idempotently and surface arriving near-duplicates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("graft-sann").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val found = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = graft.streaming.StreamingAnnIngest.start(
      spark, stream.toDF().toDF("id", "vec"), tmp,
      k = 1, nCells = 4, nProbe = 4,
      onMatches = df => found ++=
        df.select("query_id", "neighbor_id").as[(Long, Long)].collect())
    def vec(i: Long) = graft.data.SyntheticVectors.vectorOf(i, 64).toSeq
    stream.addData((0L until 10L).map(i => (i, vec(i))): _*)
    q.processAllAvailable()
    // id 1000 arrives in a LATER batch carrying id 1's exact vector —
    // its top-1 against the accreted index must be the stored 1
    // (cos = 1.0; ties rank by lowest neighbor id after cos desc)
    stream.addData((1000L, vec(1L)))
    q.processAllAvailable()
    q.stop()
    assert(found.contains((1000L, 1L)),
      s"arriving near-dup must match its stored partner, got $found")
    // the persisted index holds every row exactly once
    val idx = new graft.ops.IvfIndex(spark, tmp, nCells = 4, nProbe = 4)
    assert(idx.all().count() === 11L)
    assert(idx.all().select("id").distinct().count() === 11L)
  }
}
