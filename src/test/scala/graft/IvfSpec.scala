package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.data.SyntheticVectors
import graft.ops.{Ivf, TrainingDataOps}

/**
 * IVF coarse-quantizer ANN + embedding-cosine near-dup (the two
 * round-4 additions to the embedding-space operator family). The
 * anchor contract: exhaustive probing (nProbe = nCells) reproduces the
 * brute-force oracle EXACTLY; recall at small nProbe is checked on the
 * planted-cluster construction.
 */
class IvfSpec extends AnyFunSuite with SparkSpec {

  test("nProbe = nCells reproduces brute-force top-k exactly") {
    import spark.implicits._
    val vecs = SyntheticVectors.generate(spark, 30)
    val brute = TrainingDataOps.bruteForceTopK(
        vecs, "vec_id", "embedding", vecs, 3)
      .as[(Long, Long, Int)].collect().toSet
    val ivf = Ivf.ivfTopK(vecs, "vec_id", "embedding", vecs, 3,
        nCells = 6, nProbe = 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf === brute)
  }

  test("planted partners rank top-1 with nProbe = 2 of 8 cells (recall 1.0)") {
    import spark.implicits._
    val vecs = SyntheticVectors.generate(spark, 50)
    val top1 = Ivf.ivfTopK(vecs, "vec_id", "embedding", vecs, 1,
        nCells = 8, nProbe = 2)
      .as[(Long, Long, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(top1.size === 100)
    (0L until 100L).foreach(q => assert(top1(q) === (q ^ 1L),
      s"query $q: expected partner ${q ^ 1L}, got ${top1.get(q)}"))
  }

  test("codebook fit is deterministic and centroids are unit-norm") {
    val vecs = SyntheticVectors.generate(spark, 40)
    val a = Ivf.fitCentroids(vecs, "vec_id", "embedding", nCells = 8)
    val b = Ivf.fitCentroids(vecs, "vec_id", "embedding", nCells = 8)
    assert(a.flatten[Double].sameElements(b.flatten[Double]))
    a.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n")
    }
  }

  test("probe expression assigns every row and stays codegen'd") {
    val vecs = SyntheticVectors.generate(spark, 20)
    val cents = Ivf.fitCentroids(vecs, "vec_id", "embedding", nCells = 4)
    val assigned = vecs.select(
      element_at(Ivf.probe(col("embedding"), cents, 1), 1).as("cell"))
    val cells = assigned.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.values.sum === 40L, "every row assigned")
    assert(cells.keys.forall(c => c >= 0 && c < 4))
    // the probe is a codegen'd expression, not a CodegenFallback HOF:
    // its Project sits inside a whole-stage-codegen span (the `*(n)`
    // marker in the executed plan)
    val plan = assigned.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[.*ivf_probe""".r.findFirstIn(plan).isDefined,
      plan.take(2000))
  }

  // ---- mutable IVF serving index ----

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("ivfidx").toString

  private def vecsDf(clusters: Int, idOffset: Long = 0L) = {
    import spark.implicits._
    (0L until clusters.toLong * 2)
      .map(i => (i + idOffset, SyntheticVectors.vectorOf(i + idOffset, 64)))
      .toDF("id", "vec")
  }

  test("IvfIndex.search matches ivfTopK over the same corpus (single " +
    "batch, same codebook), and prunes the stored scan to probed cells") {
    import spark.implicits._
    val dir = s"${freshDir()}/idx"
    // pruneMaxFraction = 1.0: this fixture's 20 queries × 2 probes
    // cover most of the 8-cell domain, which the r06
    // fraction-threshold skip would (correctly) leave unpruned — the
    // assertion here is about pruning CAPABILITY, so force it on;
    // Round6IvfPruneSpec covers the threshold behaviour itself
    val idx = new graft.ops.IvfIndex(spark, dir, nCells = 8, nProbe = 2,
      pruneMaxFraction = 1.0)
    val corpus = vecsDf(50)
    idx.put(corpus)
    val queries = vecsDf(10)
    val got = idx.search(queries, 1)
      .as[(Long, Long, Int)].collect().toSet
    // partner construction: top-1 of i is i XOR 1
    assert(got.map(r => (r._1, r._2)) ===
      (0L until 20L).map(q => (q, q ^ 1L)).toSet)
    val plan = idx.searchPlan(queries, 1).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell#\\d+ IN".r.findFirstIn(plan).isDefined,
      s"stored scan not pruned by cell:\n${plan.take(4000)}")
  }

  test("IvfIndex.remove: removed ids never come back; partner queries " +
    "fall through to the next-best neighbour") {
    import spark.implicits._
    val dir = s"${freshDir()}/idx"
    val idx = new graft.ops.IvfIndex(spark, dir, nCells = 4, nProbe = 4)
    idx.put(vecsDf(20))
    idx.remove(Seq(1L).toDF("id"))
    val got = idx.search(vecsDf(1), 1).as[(Long, Long, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(!got.values.exists(_ == 1L), s"removed id served: $got")
    assert(got(1L) === 0L, "partner of 1 is still served")
  }

  test("IvfIndex.refit after drift makes the index equivalent to a " +
    "fresh build over the full corpus") {
    import spark.implicits._
    val a = vecsDf(25)           // ids 0..49 — codebook trained on these
    val b = vecsDf(75, 50L)      // ids 50..199 — drift: 3× the corpus
    val d1 = s"${freshDir()}/idx1"
    val idx1 = new graft.ops.IvfIndex(spark, d1, nCells = 8, nProbe = 2)
    idx1.put(a); idx1.put(b)
    idx1.refit()
    val d2 = s"${freshDir()}/idx2"
    val idx2 = new graft.ops.IvfIndex(spark, d2, nCells = 8, nProbe = 2)
    idx2.put(a.union(b))         // fresh build, one batch
    val queries = vecsDf(100)
    val r1 = idx1.search(queries, 2).as[(Long, Long, Int)].collect().toSet
    val r2 = idx2.search(queries, 2).as[(Long, Long, Int)].collect().toSet
    assert(r1 === r2, "refit must converge to the fresh-build serving state")
    assert(r1.nonEmpty)
  }

  test("IvfIndex autoRefitGrowth: the growth batch refits during put — " +
    "serving state equals a fresh build with NO manual refit call") {
    import spark.implicits._
    val a = vecsDf(25)           // ids 0..49 — codebook fitted at n=50
    val b = vecsDf(75, 50L)      // ids 50..199 — 200 ≥ 2×50 trips the knob
    val d1 = s"${freshDir()}/idx1"
    val auto = new graft.ops.IvfIndex(spark, d1, nCells = 8, nProbe = 2,
      autoRefitGrowth = 2.0)
    auto.put(a); auto.put(b)     // second put runs the refit itself
    val d2 = s"${freshDir()}/idx2"
    val fresh = new graft.ops.IvfIndex(spark, d2, nCells = 8, nProbe = 2)
    fresh.put(a.union(b))
    // cell layout converged to the full-corpus codebook…
    def cells(i: graft.ops.IvfIndex) = i.all().select("id", "cell")
      .as[(Long, Int)].collect().toMap
    assert(cells(auto) === cells(fresh),
      "auto-refit must re-assign every batch under the full-corpus codebook")
    // …and so did the served results
    val queries = vecsDf(100)
    val r1 = auto.search(queries, 2).as[(Long, Long, Int)].collect().toSet
    val r2 = fresh.search(queries, 2).as[(Long, Long, Int)].collect().toSet
    assert(r1 === r2 && r1.nonEmpty)
    // the stale (first-put) codebook demonstrably differed: without the
    // knob the same puts keep the n=50 assignment
    val d3 = s"${freshDir()}/idx3"
    val stale = new graft.ops.IvfIndex(spark, d3, nCells = 8, nProbe = 2)
    stale.put(a); stale.put(b)
    assert(cells(stale) !== cells(fresh),
      "fixture sanity: drift must actually move cell assignments")
  }

  test("cosineNearDup finds exactly the planted pairs, all above tau") {
    import spark.implicits._
    val vecs = SyntheticVectors.generate(spark, 75)
    val found = TrainingDataOps.cosineNearDup(
        vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect()
    val pairs = found.map(r => (r._1, r._2)).toSet
    val expected = (0 until 75).map(j => (2L * j, 2L * j + 1)).toSet
    assert(pairs === expected, "exactly the planted pairs (no misses, " +
      s"no false positives); diff: missing=${expected -- pairs} " +
      s"extra=${pairs -- expected}")
    found.foreach { case (a, b, c) =>
      assert(c >= 0.9 && c <= 1.0, s"pair ($a,$b) cos $c")
    }
  }
}
