package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.hash.HashKernels.mix64
import graft.lsh.LshForest

/**
 * LSH Forest prefix-expansion tests (SURVEY §2.4 H5), mirroring the
 * reference's oracle structure (`/root/reference/index_test.go:46-96`:
 * the approximate index must reproduce the brute-force ranking):
 * planted Hamming-close partners must be retrieved as top-1, and
 * recall@k is measured against the exact linear scan.
 */
class LshForestSpec extends AnyFunSuite with SparkSpec {

  private val n = 2000

  /** Corpus: random fingerprints; partner of doc i (even) is i+1 with
    * 1-2 flipped bits — the true Hamming-NN by construction. */
  private def sigs = {
    import spark.implicits._
    (0 until n).map { i =>
      if (i % 2 == 0) (i.toLong, mix64(i * 104729L + 7))
      else {
        val base = mix64((i - 1) * 104729L + 7)
        val f1 = (mix64(i * 13L) & 63L).toInt
        val f2 = (mix64(i * 17L) & 63L).toInt
        (i.toLong, base ^ (1L << f1) ^ (if (f2 != f1) 1L << f2 else 0L))
      }
    }.toDF("doc_id", "sig")
  }

  test("forest index mutation: put/search/remove (index.go:119-136, " +
    "lsh.go:244-265)") {
    import spark.implicits._
    val tmp = "file:" +
      java.nio.file.Files.createTempDirectory("graft-forest-idx").toString
    val idx = new graft.lsh.ForestIndex(spark, tmp)
    assert(idx.isEmpty)
    val rows = sigs.select(col("doc_id").as("id"), col("sig"))
    idx.put(rows.filter(col("id") < 1000))
    idx.put(rows.filter(col("id") >= 1000)) // second batch, same stats-free surface
    assert(!idx.isEmpty && idx.all().count() === n)
    val queries = rows.filter(col("id") < 100)
    val top1 = idx.search(queries, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 100L).forall(q => top1.get(q).contains(q ^ 1L)),
      "cross-batch search must find planted partners")
    // remove the partner of query 0: it must no longer be retrievable
    idx.remove(Seq(1L).toDF("id"))
    assert(idx.all().count() === n - 1)
    val after = idx.search(rows.filter(col("id") === 0L), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!after.get(0L).contains(1L), "removed doc still retrievable")
  }

  test("planted partners are retrieved as top-1") {
    val df = sigs
    val queries = df.filter(col("doc_id") < 100)
    val top1 = LshForest.searchTopK(df, "doc_id", queries, "doc_id", "sig", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val missed = (0L until 100L).filter(q => top1.get(q) != Some(q ^ 1L))
    assert(missed.isEmpty, s"queries whose partner was not top-1: $missed")
  }

  /** Clustered corpus: 300 groups of 6 near-identical fingerprints
    * (members differ from the base in ≤3 bits, so intra-group Hamming
    * ≤ 6 while inter-group is ~32) — the regime an LSH index is FOR.
    * A query's true top-5 are its 5 group mates. */
  private def clusteredSigs = {
    import spark.implicits._
    (0 until 300).flatMap { g =>
      val base = mix64(g * 999983L + 3)
      (0 until 6).map { j =>
        val flips = (0 until j % 4).map(f => (mix64(g * 77L + j * 7L + f) & 63L).toInt)
        ((g * 6 + j).toLong, flips.foldLeft(base)((s, b) => s ^ (1L << b)))
      }
    }.toDF("doc_id", "sig")
  }

  test("recall@5 vs brute-force Hamming top-5 is >= 0.9 on clustered corpus") {
    val df = clusteredSigs
    val queries = df.filter(col("doc_id") % 6 === 0 && col("doc_id") < 300)
    val approx = LshForest.searchTopK(df, "doc_id", queries, "doc_id", "sig", 5,
        minPrefix = 8)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // brute force oracle (H7 analogue over signatures,
    // index_test.go:46-96 structure)
    val all = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val qs = all.filter(t => t._1 % 6 == 0 && t._1 < 300)
    var hit = 0; var total = 0
    qs.foreach { case (qid, qsig) =>
      val exact = all.filter(_._1 != qid)
        .sortBy { case (id, s) => (java.lang.Long.bitCount(qsig ^ s), id) }
        .take(5).map(_._1).toSet
      val got = approx.getOrElse(qid, Set.empty)
      hit += exact.intersect(got).size
      total += 5
    }
    val recall = hit.toDouble / total
    assert(recall >= 0.9, s"recall@5 = $recall")
  }
}
