package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.hash.HashKernels.mix64
import graft.lsh.Lsh

/**
 * Quantifies the sorted-neighborhood seam loss (Lsh.simhashNeighborEdges):
 * pairs adjacent in rotated-fingerprint order but split across a
 * range-partition boundary are the method's only recall loss. The
 * documented bound is ≤ width·(partitions−1) lost pairs per rotation;
 * a pair is MISSED only if it loses its adjacency in EVERY rotation.
 * Measured here against the no-seam oracle (totalParts = 1 — one
 * global sorted scan, identical logic).
 */
class SeamLossSpec extends AnyFunSuite with SparkSpec {

  private val n = 4000
  private val planted = 50
  private val tables = 4
  private val width = 3
  private val maxHamming = 3

  /** n random fingerprints + `planted` Hamming-≤3 partners. */
  private def sigs = {
    import spark.implicits._
    val base = (0 until n).map(i => (i.toLong, mix64(i * 7919L + 17)))
    val partners = (0 until planted).map { p =>
      val (id, sig) = base(p * (n / planted))
      // flip 1..3 distinct bit positions derived from p
      val flips = (0 until 1 + p % 3).map(f => (mix64(p * 31L + f) & 63L).toInt).distinct
      ((100000 + p).toLong, flips.foldLeft(sig)((s, b) => s ^ (1L << b)))
    }
    (base ++ partners).toDF("doc_id", "sig")
  }

  test("planted Hamming-close pairs survive partitioned sorted-neighborhood") {
    val edges = Lsh.simhashNeighborEdges(sigs, "doc_id", "sig",
        tables, width, maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = (0 until planted).filter { p =>
      val a = (p * (n / planted)).toLong
      val b = (100000 + p).toLong
      !edges.contains((math.min(a, b), math.max(a, b)))
    }
    assert(missing.isEmpty,
      s"planted pairs lost to partition seams: $missing")
  }

  test("seam loss vs the no-seam oracle is within the documented bound") {
    val partitioned = Lsh.simhashNeighborEdges(sigs, "doc_id", "sig",
        tables, width, maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oracle = Lsh.simhashNeighborEdges(sigs, "doc_id", "sig",
        tables, width, maxHamming, totalParts = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // partitioning can only LOSE edges, never invent them
    assert((partitioned -- oracle).isEmpty)

    val lost = oracle -- partitioned
    val parts = spark.sparkContext.defaultParallelism * tables
    // hard bound: every lost edge needs a straddled boundary in every
    // rotation that would have found it; the per-rotation adjacency
    // loss is ≤ width·(partitions−1)
    val bound = width * (parts - 1) * tables
    assert(lost.size <= bound, s"lost ${lost.size} > bound $bound")
    // measured bound for the docs: at 4k docs / 16 partitions the loss
    // is a fraction of a percent of the oracle edge set
    assert(lost.size.toDouble <= math.max(1.0, 0.01 * oracle.size),
      s"seam loss ${lost.size} of ${oracle.size} oracle edges")
  }
}
