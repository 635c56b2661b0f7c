package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.data.SyntheticVectors

/**
 * r06 fraction-threshold pruning skip (r5 verdict item #3): the IVF
 * stored-scan IN-predicate is attached only while the probe set covers
 * ≤ pruneMaxFraction of the cell domain — BenchIvf measured the
 * predicate NET-NEGATIVE at high coverage (4.82 s pruned vs 3.58 s
 * unpruned at 64-of-256 cells). Results must be identical either way.
 */
class Round6IvfPruneSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("ivfprune").toString

  private def vecsDf(clusters: Int) = {
    import spark.implicits._
    (0L until clusters.toLong * 2)
      .map(i => (i, SyntheticVectors.vectorOf(i, 64)))
      .toDF("id", "vec")
  }

  private val prunedRe = "PartitionFilters: \\[[^\\]]*cell#\\d+ IN".r

  test("pruning predicate present below the fraction threshold, absent " +
    "above it, results identical") {
    import spark.implicits._
    val corpus = vecsDf(60)
    val oneQuery = vecsDf(1).limit(1) // probes nProbe of nCells cells
    val manyQueries = vecsDf(40)      // probes most of the domain

    val below = new graft.ops.IvfIndex(spark, s"${freshDir()}/idx",
      nCells = 16, nProbe = 2)        // 1 query: ≤ 2/16 = 0.125 ≤ 0.5
    below.put(corpus)
    val planBelow = below.searchPlan(oneQuery, 1)
      .queryExecution.executedPlan.toString
    assert(prunedRe.findFirstIn(planBelow).isDefined,
      s"below-threshold search must prune:\n${planBelow.take(3000)}")

    val above = new graft.ops.IvfIndex(spark, s"${freshDir()}/idx",
      nCells = 16, nProbe = 12)       // 40 queries × 12 probes ≈ full domain
    above.put(corpus)
    val planAbove = above.searchPlan(manyQueries, 1)
      .queryExecution.executedPlan.toString
    assert(prunedRe.findFirstIn(planAbove).isEmpty,
      s"above-threshold search must skip the predicate:\n${planAbove.take(3000)}")

    // result-identity across the threshold: same index, same queries,
    // forced-prune vs threshold-skipped
    val dir = s"${freshDir()}/idx"
    val always = new graft.ops.IvfIndex(spark, dir, nCells = 16,
      nProbe = 12, pruneMaxFraction = 1.0)
    always.put(corpus)
    val skipped = new graft.ops.IvfIndex(spark, dir, nCells = 16,
      nProbe = 12, pruneMaxFraction = 0.0)
    val a = always.search(manyQueries, 3).as[(Long, Long, Int)].collect().toSet
    val b = skipped.search(manyQueries, 3).as[(Long, Long, Int)].collect().toSet
    assert(a === b, "pruned and unpruned searches must return identical results")
  }
}
