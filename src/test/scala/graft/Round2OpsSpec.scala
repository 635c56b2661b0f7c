package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.ConnectedComponents
import graft.data.SyntheticVectors
import graft.ops.{IncrementalIndex, TrainingDataOps}

class Round2OpsSpec extends AnyFunSuite with SparkSpec {

  test("connected components: non-convergence at maxIter raises, not lies") {
    import spark.implicits._
    // path graph of diameter 40: one round of min-propagation + pointer
    // jumping cannot reach the fixpoint
    val path = (0 until 40).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    intercept[ConnectedComponents.NonConvergence] {
      ConnectedComponents.run(path, maxIter = 1, smallGraphThreshold = 0L)
    }
    // and enough rounds converge fine
    val ok = ConnectedComponents.run(path, maxIter = 12, smallGraphThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(ok.forall(_._2 === 0L))
  }

  test("incremental index: stats persisted on first put; cross-batch search") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx2").toString
    val idx = new IncrementalIndex(spark, tmp)
    def w(prefix: String, i: Int): String =
      prefix + ('a' + i % 26).toChar.toString * (1 + i / 26)
    val t1 = (1 to 60).map(w("alpha", _)).mkString(" ")
    val t2 = (1 to 60).map(w("omega", _)).mkString(" ")
    idx.put(Seq(("u1", t1)).toDF("url", "text"))
    assert(new java.io.File(s"$tmp/stats").exists(),
      "corpus stats must be persisted with the index on first put")
    // second batch signed with the SAME stats (batch-independence):
    // a near-dup of a batch-1 doc arriving in batch 2 must band-collide
    idx.put(Seq(("u2", t2)).toDF("url", "text"))
    val t1near = t1.replace(" " + w("alpha", 7) + " ", " changed ")
    val m = idx.search(Seq(("q1", t1near)).toDF("url", "text"))
      .select("query_url", "match_url").as[(String, String)].collect().toSet
    assert(m === Set(("q1", "u1")))
  }

  test("incremental index: remove survives cache eviction; puts continue") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx3").toString
    val idx = new IncrementalIndex(spark, tmp)
    def doc(p: String) = (1 to 60).map(i =>
      p + ('a' + i % 26).toChar.toString * (1 + i / 26)).mkString(" ")
    idx.put(Seq(("u1", doc("aa")), ("u2", doc("bb")), ("u3", doc("cc")))
      .toDF("url", "text"))
    // worst case for the old overwrite-in-place remove: nothing cached,
    // plan re-reads the source mid-write — atomic swap must not care
    spark.catalog.clearCache()
    idx.remove(Seq("u2").toDF("url"))
    assert(idx.all().select("url").as[String].collect().toSet === Set("u1", "u3"))
    idx.put(Seq(("u4", doc("dd"))).toDF("url", "text"))
    assert(idx.all().count() === 3)
    idx.remove(Seq("u1", "u4").toDF("url"))
    assert(idx.all().select("url").as[String].collect().toSet === Set("u3"))
  }

  test("lshTopK: recall@5 >= 0.9 vs bruteForceTopK on planted clusters") {
    // clusters of 6 -> each vector has 5 true near neighbors (cos≈0.997)
    val vecs = SyntheticVectors.generate(spark, 20, dim = 64, clusterSize = 6)
      .cache()
    val queries = vecs.filter(col("vec_id") % 6 === 0)
    val brute = TrainingDataOps.bruteForceTopK(vecs, "vec_id", "embedding",
      queries, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TrainingDataOps.lshTopK(vecs, "vec_id", "embedding",
      queries, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall@5 $recall")
    vecs.unpersist()
  }

  test("lshTopK: dimension derived from data (no 64-dim hardcode)") {
    val vecs32 = SyntheticVectors.generate(spark, 25, dim = 32, clusterSize = 2)
    val got = TrainingDataOps.lshTopK(vecs32, "vec_id", "embedding", vecs32, 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0L until 50L).count(i => got.get(i).contains(i ^ 1L))
    assert(hits >= 45, s"partner recall at dim 32: $hits/50")
  }
}
