package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.ConnectedComponents
import graft.data.SyntheticPages
import graft.substr.SuffixArrayStage
import graft.verify.Measures
import graft.ckpt.ParquetStageStore

class PipelineSpec extends AnyFunSuite with SparkSpec {

  test("connected components: min-label per component") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 3L)).toDF("a", "b")
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L && got(5L) === 1L)
    assert(got(10L) === 10L && got(11L) === 10L)
  }

  test("suffix array finds planted substring pair") {
    val common = "x" * 5 + (1 to 30).map(i => s"tok$i").mkString(" ")
    val batch = Seq(
      (1L, "completely unrelated prefix " + common + " tail one"),
      (2L, "different document start " + common + " other tail"),
      (3L, "nothing shared here at all just random words"))
    val pairs = SuffixArrayStage.pairsInBatch(batch, 60).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("suffix array distributed stage finds cross-doc runs") {
    import spark.implicits._
    val common = (1 to 40).map(i => s"verbatim$i").mkString(" ")
    val docs = Seq(
      (1L, "aaa prefix " + common),
      (2L, "zzz other " + common),
      (3L, "unrelated content entirely different")).toDF("doc_id", "norm")
    val got = SuffixArrayStage.substringEdges(docs, "doc_id", "norm", 60)
      .as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
  }

  test("end-to-end dedup recall >= 0.99 vs exact-Jaccard oracle (north rule)") {
    import spark.implicits._
    val (pages, expected) = SyntheticPages.generate(spark, 400)
    val cfg = DedupConfig()
    val result = DedupPipeline.run(pages, cfg).cache()

    // oracle: all pairs with exact shingle-Jaccard >= tau (brute force at
    // this scale, mirrors index_test.go:46-96 oracle pattern)
    val ext = DedupPipeline.extract(pages, cfg)
      .select($"doc_id", $"url", $"shingles")
    val a = ext.toDF("ida", "urla", "sha")
    val b = ext.toDF("idb", "urlb", "shb")
    val oracle = a.crossJoin(b).filter($"ida" < $"idb")
      .withColumn("j", Measures.jaccard($"sha", $"shb"))
      .filter($"j" >= cfg.tau)
      .select($"ida", $"idb").as[(Long, Long)].collect().toSet
    assert(oracle.nonEmpty, "oracle should find planted dups")

    val cluster = result.select($"doc_id", $"cluster").as[(Long, Long)]
      .collect().toMap
    val found = oracle.count { case (x, y) => cluster(x) == cluster(y) }
    val recall = found.toDouble / oracle.size
    assert(recall >= 0.99, s"recall $recall (${found}/${oracle.size})")

    // planted exact dups always co-clustered
    val urlCluster = result.select($"url", $"cluster").as[(String, Long)]
      .collect().toMap
    val exacts = expected.filter($"kind" === "exact")
      .as[(String, String, String)].collect()
    exacts.foreach { case (ua, ub, _) =>
      assert(urlCluster(ua) === urlCluster(ub), s"exact pair $ua / $ub")
    }
    // substring dups: the suffix-array stage must catch >= 90%
    val subs = expected.filter($"kind" === "substr")
      .as[(String, String, String)].collect()
    val subFound = subs.count { case (ua, ub, _) =>
      urlCluster(ua) == urlCluster(ub) }
    assert(subFound.toDouble / subs.length >= 0.9,
      s"substr recall ${subFound}/${subs.length}")
    result.unpersist()
  }

  test("checkpoint store: stages commit, resume skips, invalidate cascades") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val (pages, _) = SyntheticPages.generate(spark, 100)
    val store = new ParquetStageStore(spark, tmp)
    val r1 = DedupPipeline.run(pages, DedupConfig(), store)
      .orderBy("doc_id").collect()
    assert(store.isCommitted("signatures") && store.isCommitted("clusters"))
    // resume: all stages skip, result identical
    val r2 = DedupPipeline.run(pages, DedupConfig(), store)
      .orderBy("doc_id").collect()
    assert(r1 === r2)
    // invalidate mid-pipeline stage: downstream stages invalidated too
    store.invalidate("candidates")
    assert(!store.isCommitted("candidates") && !store.isCommitted("verified") &&
      !store.isCommitted("clusters"))
    assert(store.isCommitted("signatures"), "upstream stages stay committed")
    val r3 = DedupPipeline.run(pages, DedupConfig(), store)
      .orderBy("doc_id").collect()
    assert(r1 === r3)
  }
}
