package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cache-scoping audit (round-4 verdict item #4/#5): a Verify/Bench
  * session runs all 39 driver queries in ONE SparkSession — any query
  * leaking a persist (q_jaccard_near's shared shingle frame, model
  * components, localCheckpoint blocks) accumulates across queries and
  * pressures the memory bandwidth the bench measures. Verify and Bench
  * call [[SparkEntry.releaseCaches]] after each query's action; this
  * spec asserts the sweep leaves ZERO retained RDDs after the full
  * query map, and the decontamination broadcast guard's shuffle
  * fallback returns identical results. */
class Round5CacheSpec extends AnyFunSuite with SparkSpec {

  test("the full driver query map leaves zero retained RDDs behind " +
    "after the per-query releaseCaches sweep (sf0.01)") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(sfDir).isDirectory)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      finally SparkEntry.releaseCaches(spark)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"query $name retained RDDs past its releaseCaches sweep: " +
          spark.sparkContext.getPersistentRDDs.values
            .map(_.toString).mkString("; "))
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("decontaminate: past maxBroadcastWindows the join degrades to a " +
    "shuffle semi-join with IDENTICAL results") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (i.toLong, (1 to 30).map(t => s"w${(i * 31 + t) % 90}").mkString(" "))
    }.toDF("doc_id", "text")
    val bench = (0 until 12).map { j =>
      (1 to 30).map(t => s"w${(j * 31 + t) % 90}").mkString(" ")
    }.toDF("bench_text")
    def run(cap: Long) = graft.ops.TrainingDataOps.decontaminate(
        docs, "doc_id", "text", bench, "bench_text", n = 8,
        maxBroadcastWindows = cap)
      .as[(Long, Long)].collect().toSet
    val viaBroadcast = run(Long.MaxValue)
    val viaShuffle = run(1L) // force the fallback
    assert(viaBroadcast.nonEmpty, "fixture must produce hits")
    assert(viaShuffle === viaBroadcast,
      "the shuffle fallback must be result-identical to the broadcast path")
  }
}
