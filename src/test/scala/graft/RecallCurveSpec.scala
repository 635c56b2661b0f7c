package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN recall evidence at non-trivial scale (round-4 verdict item #4):
  * recall@10 vs nProbe for IVF and vs (tables, bits) for the LSH path,
  * both against the exact brute-force ranking, on a 10^5-vector
  * clustered corpus where cells are non-trivial (≈390 vectors/cell at
  * 256 cells). Mirrors the reference's oracle-vs-approx contract
  * (`/root/reference/index_test.go:46-96`) at a scale where the tuning
  * knobs actually move recall. The measured curve is recorded in
  * BASELINE.md so a user tuning nProbe has evidence to steer by.
  *
  * The corpus is deterministic (counter-based gaussians): 5000 planted
  * clusters × 20 members, dim 32, with perturbation 0.25·σ so intra-
  * cluster cosine sits ≈0.89 — loose enough that banding and cell
  * probes genuinely miss at small settings (a 0.05·σ corpus saturates
  * every curve at 1.0 and measures nothing).
  */
class RecallCurveSpec extends AnyFunSuite with SparkSpec {

  import RecallCurveSpec._

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .as[Long].map(i => (i, RecallCurveSpec.vecOf(i).toSeq))
      .toDF("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** 50 query vectors spread across clusters. */
  private lazy val queries: DataFrame =
    corpus.filter(col("vec_id") % (n / 50) === 0)

  /** query_id -> exact top-k neighbor set. */
  private lazy val truth: Map[Long, Set[Long]] =
    graft.ops.TrainingDataOps.bruteForceTopK(
        corpus, "vec_id", "embedding", queries, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

  private def recallOf(approx: DataFrame): Double = {
    val got = approx.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    per.sum / per.size
  }

  test("IVF recall@10 rises with nProbe and clears 0.9 at nProbe=8 of " +
    "256 cells on the clustered 10^5 corpus") {
    val curve = Seq(1, 2, 4, 8, 16).map { p =>
      p -> recallOf(graft.ops.Ivf.ivfTopK(
        corpus, "vec_id", "embedding", queries, k,
        nCells = 256, nProbe = p))
    }
    info("IVF recall@10 vs nProbe (256 cells, 100k vectors): " +
      curve.map { case (p, r) => f"$p->$r%.3f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra - 0.02,
        s"recall must not fall as nProbe grows: $pa->$ra vs $pb->$rb")
    }
    val at8 = curve.find(_._1 == 8).get._2
    assert(at8 >= 0.9, s"recall@10 at nProbe=8/256 was $at8 (< 0.9)")
    assert(curve.head._2 < 0.9,
      "nProbe=1 must genuinely miss on this corpus — otherwise the " +
        "curve measures nothing (fixture too tight)")
  }

  test("LSH recall@10 rises with tables on the clustered 10^5 corpus") {
    val curve = Seq((2, 16), (4, 16), (8, 8)).map { case (t, b) =>
      (t, b) -> recallOf(graft.ops.TrainingDataOps.lshTopK(
        corpus, "vec_id", "embedding", queries, k, tables = t, bits = b))
    }
    info("LSH recall@10 vs (tables,bits) (100k vectors): " +
      curve.map { case ((t, b), r) => f"($t,$b)->$r%.3f" }.mkString(", "))
    assert(curve.last._2 >= 0.9,
      s"recall@10 at (8,8) was ${curve.last._2} (< 0.9)")
    assert(curve.head._2 <= curve.last._2 + 0.02,
      "more tables/shorter bands must not lose recall")
  }
}

/** Deterministic generator as a STATIC object: the map closure below
  * must not capture the (non-serializable) suite instance. */
object RecallCurveSpec {
  import graft.hash.HashKernels.mix64

  val dim = 32
  val clusterSize = 20
  val nClusters = 5000
  val n: Int = nClusters * clusterSize // 100k
  val k = 10

  private def gaussian(seed: Long): Double = {
    val u1 = (mix64(seed) >>> 11) * 1.1102230246251565e-16
    val u2 = (mix64(seed + 1) >>> 11) * 1.1102230246251565e-16
    math.sqrt(-2.0 * math.log(u1 + 1.1102230246251565e-16)) *
      math.cos(2.0 * math.Pi * u2)
  }

  def vecOf(i: Long): Array[Float] = {
    val cluster = i / clusterSize
    Array.tabulate(dim) { d =>
      (gaussian(mix64(0x5eedL + cluster * 131L + d) * 2L) +
        0.25 * gaussian(mix64(0x9e7bL + i * 257L + d) * 2L)).toFloat
    }
  }
}
