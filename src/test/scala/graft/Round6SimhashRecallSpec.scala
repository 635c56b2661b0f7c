package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sorted-neighborhood SimHash recall evidence (round-5 verdict item
  * #6): recall vs (tables, width) for [[graft.lsh.Lsh.simhashNeighborEdges]]
  * against the EXACT-Hamming oracle, on a 10^5-signature corpus with
  * planted near-duplicate clusters — the same oracle-vs-approx contract
  * the reference pins for its approx index
  * (`/root/reference/index_test.go:46-96`), at a scale where the
  * tables/width knobs genuinely move recall. The measured curve is
  * recorded in BASELINE.md next to the IVF/LSH ANN curves.
  *
  * Fixture: 25k clusters × 4 members. Each member's 64-bit signature is
  * the cluster base with 0–2 deterministically-chosen bits flipped, so
  * within-cluster pair Hamming distances span 0–4 and the oracle is the
  * within-cluster pairs at ≤ maxHamming (cross-cluster pairs at ≤ 3 of
  * 64 bits have probability ~2⁻⁴⁴ per pair — none exist in this draw,
  * asserted below). Why the knobs move here: a flipped HIGH bit moves a
  * signature ~2^bit away in one rotation's sort order (breaking
  * adjacency once other corpus rows land in the gap — ~10^5·2^(b-64)
  * interlopers expected at bit b), and extra rotations give the pair
  * more chances to sort adjacently; cluster size 4 makes width matter
  * (a pair can be separated by its own co-members in one rotation's
  * order).
  */
class Round6SimhashRecallSpec extends AnyFunSuite with SparkSpec {

  import Round6SimhashRecallSpec._

  private lazy val sigs: DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .as[Long].map(i => (i, sigOf(i)))
      .toDF("doc_id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact within-cluster oracle: all (a, b, hamming ≤ maxHamming)
    * pairs, computed driver-side from the same generator. */
  private lazy val oracle: Set[(Long, Long)] = {
    val b = Set.newBuilder[(Long, Long)]
    var c = 0L
    while (c < nClusters) {
      var i = c * clusterSize
      while (i < (c + 1) * clusterSize) {
        var j = i + 1
        while (j < (c + 1) * clusterSize) {
          if (java.lang.Long.bitCount(sigOf(i) ^ sigOf(j)) <= maxHamming)
            b += ((i, j))
          j += 1
        }
        i += 1
      }
      c += 1
    }
    b.result()
  }

  private def recallOf(tables: Int, width: Int): Double = {
    val found = graft.lsh.Lsh
      .simhashNeighborEdges(sigs, "doc_id", "simhash",
        tables = tables, width = width, maxHamming = maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every emitted pair must satisfy the exact criterion (the filter
    // runs on the true signatures) and, in this draw, be within-cluster
    found.foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(sigOf(a) ^ sigOf(b)) <= maxHamming)
      assert(a / clusterSize == b / clusterSize,
        s"cross-cluster pair ($a,$b) at ≤$maxHamming bits — fixture " +
          "assumption broken")
    }
    found.intersect(oracle).size.toDouble / oracle.size
  }

  test("sorted-neighborhood recall rises with tables (width=8) on the " +
    "10^5 planted corpus and clears 0.95 at the pipeline default " +
    "tables=4; a single rotation genuinely misses") {
    val curve = Seq(1, 2, 4).map(t => t -> recallOf(t, 8))
    info("SimHash sorted-neighborhood recall vs tables (width=8, " +
      s"maxHamming=$maxHamming, ${oracle.size} oracle pairs): " +
      curve.map { case (t, r) => f"$t->$r%.3f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((ta, ra), (tb, rb)) =>
      assert(rb >= ra - 0.02,
        s"recall must not fall as tables grow: $ta->$ra vs $tb->$rb")
    }
    assert(curve.last._2 >= 0.95,
      s"recall at tables=4 was ${curve.last._2} (< 0.95)")
    assert(curve.head._2 < 0.9,
      "tables=1 must genuinely miss on this corpus — otherwise the " +
        "curve measures nothing (fixture too tight)")
  }

  test("sorted-neighborhood recall rises with width (tables=2) — " +
    "co-cluster members separate a pair in one rotation's order") {
    val curve = Seq(1, 2, 8).map(w => w -> recallOf(2, w))
    info("SimHash sorted-neighborhood recall vs width (tables=2): " +
      curve.map { case (w, r) => f"$w->$r%.3f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((wa, ra), (wb, rb)) =>
      assert(rb >= ra - 0.02,
        s"recall must not fall as width grows: $wa->$ra vs $wb->$rb")
    }
    assert(curve.last._2 > curve.head._2 + 0.02,
      "width must genuinely move recall at cluster size 4 " +
        s"(got ${curve.head._2} -> ${curve.last._2})")
  }
}

/** Deterministic generator as a STATIC object (the Dataset map closure
  * must not capture the suite instance); counter-based like the other
  * fixtures, bit-stable across runs and machines. */
object Round6SimhashRecallSpec {
  import graft.hash.HashKernels.mix64

  val clusterSize = 4
  val nClusters = 25000
  val n: Long = nClusters.toLong * clusterSize // 100k
  val maxHamming = 3

  def sigOf(i: Long): Long = {
    val cluster = i / clusterSize
    val base = mix64(0xbadcafeL + cluster * 1000003L)
    val k = ((mix64(0x5151L + i * 7919L) >>> 61) % 3).toInt // 0..2 flips
    var mask = 0L
    var j = 0
    while (j < k) {
      val bit = (mix64(0xf00dL + i * 104729L + j) >>> 58).toInt // 0..63
      mask |= (1L << bit)
      j += 1
    }
    base ^ mask
  }
}
