package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deterministic planted-neighbor embedding set for ANN recall gates.
 * The testdata embeddings are isotropic-random (max pairwise cosine
 * ≈ 0.48 at sf0.001), so "top-k recall" over them measures nothing an
 * LSH is for; ANN's contract is recall on *actually near* pairs.
 *
 * Construction: `pairs` clusters of two vectors each. Both members
 * share a Gaussian base direction (counter-based splitmix64 → Box
 * –Muller, same scheme as the hash kernels) plus a per-member 0.05·σ
 * perturbation, giving partner cosine ≈ 0.9975 while cross-cluster
 * cosine stays ≈ N(0, 1/√dim). Every vector's true nearest neighbor is
 * therefore its partner (id XOR 1) — ground truth by construction, so
 * the DuckDB oracle is a generate_series expression, not a dump of the
 * implementation's output.
 */
object SyntheticVectors {

  import graft.hash.HashKernels.mix64

  private def gaussian(seed: Long): Double = {
    val u1 = (mix64(seed) >>> 11) * 1.1102230246251565e-16
    val u2 = (mix64(seed + 1) >>> 11) * 1.1102230246251565e-16
    math.sqrt(-2.0 * math.log(u1 + 1.1102230246251565e-16)) *
      math.cos(2.0 * math.Pi * u2)
  }

  /** Embedding for planted id i; i's true near neighbors are the other
    * members of cluster i / clusterSize. */
  def vectorOf(i: Long, dim: Int, clusterSize: Int = 2): Array[Float] = {
    val cluster = i / clusterSize
    Array.tabulate(dim) { d =>
      (gaussian(mix64(0xc1a5c1a5L + cluster * 131L + d) * 2L) +
        0.05 * gaussian(mix64(0x9e7b0a11L + i * 257L + d) * 2L)).toFloat
    }
  }

  /** (vec_id, embedding) with `clusters` planted clusters of
    * `clusterSize` members each. Slices are sized by the DATA (one per
    * ~100 rows, capped at session parallelism — what a parquet read of
    * the same rows would give): the fixed-width sizing paid dozens of
    * near-empty tasks per job on the 100-150-row fixture queries, the
    * same scheduling floor the round-4 SyntheticPages fix removed.
    * Results are slice-count-independent (per-row counter-based
    * vectors; the IVF codebook sample is globally hash-ordered). */
  def generate(spark: SparkSession, clusters: Int, dim: Int = 64,
               clusterSize: Int = 2): DataFrame = {
    import spark.implicits._
    val cs = clusterSize
    val n = clusters.toLong * clusterSize
    val slices = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 100)).toInt
    spark.range(0, n, 1, slices)
      .as[Long].map(i => (i, SyntheticVectors.vectorOf(i, dim, cs)))
      .toDF("vec_id", "embedding")
  }
}
