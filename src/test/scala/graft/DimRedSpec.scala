package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dimred.{DimRedModel, PCA, TruncatedSVD}

/**
 * Dimensionality-reduction golden tests (SURVEY §2.6 R1/R2) against the
 * reference fixtures:
 *  - TruncatedSVD FitTransform on the 6×4 matrix, k=2, expected S·V_kᵀ
 *    within 0.01 (`/root/reference/dimreduction_test.go:10-70`)
 *  - PCA FitTransform, same matrix, expected within 0.01
 *    (`/root/reference/dimreduction_test.go:72-132`)
 *  - Transform-after-FitTransform consistency (`:60-69`, `:122-131`)
 *  - Save/Load round trip (`:134-175`)
 * Singular directions are sign-ambiguous (any SVD/eigen implementation
 * may flip a component); the reference inherits gonum's signs, we
 * inherit Jacobi's. Comparison is therefore up to a per-component sign,
 * which is the mathematically meaningful equality.
 */
class DimRedSpec extends AnyFunSuite with SparkSpec {

  // reference input (rows = terms, cols = docs), dimreduction_test.go:21-29
  private val refMatrix: Array[Array[Double]] = Array(
    Array(1, 3, 5, 2),
    Array(8, 1, 0, 0),
    Array(2, 1, 0, 1),
    Array(0, 0, 0, 0),
    Array(0, 0, 0, 1),
    Array(0, 1, 0, 0))

  /** doc-row sparse layout: one row per document (column of the
    * reference matrix), entries = (term, weight). */
  private def docRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val docs = (0 until 4).map { j =>
      val entries = (0 until 6).flatMap { t =>
        val w = refMatrix(t)(j)
        if (w != 0.0) Some((t.toLong, w)) else None
      }
      (j.toLong, entries)
    }
    docs.toDF("doc_id", "raw").select(col("doc_id"),
      transform(col("raw"), e => struct(
        e.getField("_1").as("term"),
        e.getField("_2").cast("double").as("weight"))).as("entries"))
  }

  private def collectProj(df: DataFrame, k: Int): Map[Long, Array[Double]] =
    df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  /** assert actual == expected up to per-component sign, tol 0.01 —
    * expected(i) is component i over the 4 docs. */
  private def assertMatchesUpToSign(expected: Array[Array[Double]],
                                    actual: Map[Long, Array[Double]]): Unit = {
    for (comp <- expected.indices) {
      val exp = expected(comp)
      val act = (0 until 4).map(j => actual(j.toLong)(comp)).toArray
      val flip = {
        // sign from the largest-|value| position
        val m = exp.indices.maxBy(i => math.abs(exp(i)))
        if (math.signum(exp(m)) == math.signum(act(m)) || act(m) == 0) 1.0 else -1.0
      }
      for (j <- exp.indices)
        assert(math.abs(exp(j) - flip * act(j)) < 0.01,
          s"component $comp doc $j: expected ${exp(j)}, got ${flip * act(j)}")
    }
  }

  test("TruncatedSVD FitTransform matches reference golden (6×4, k=2)") {
    val docs = docRows(spark)
    val (_, out) = TruncatedSVD.fitTransform(docs, "doc_id", "entries", d = 6, k = 2)
    // dimreduction_test.go:32-35 — S·V_kᵀ rows = components, cols = docs
    val expected = Array(
      Array(-8.090, -2.212, -1.695, -0.955),
      Array(1.888, -2.524, -4.649, -1.930))
    assertMatchesUpToSign(expected, collectProj(out, 2))
  }

  test("TruncatedSVD Transform after FitTransform is consistent (refs :60-69)") {
    val docs = docRows(spark)
    val (model, out1) = TruncatedSVD.fitTransform(docs, "doc_id", "entries", 6, 2)
    val out2 = model.transform(docs, "doc_id", "entries")
    val a = collectProj(out1, 2); val b = collectProj(out2, 2)
    for (j <- 0 until 4; i <- 0 until 2)
      assert(math.abs(a(j.toLong)(i) - b(j.toLong)(i)) < 0.001)
  }

  test("PCA FitTransform matches reference golden (6×4, k=2)") {
    val docs = docRows(spark)
    val (_, out) = PCA.fitTransform(docs, "doc_id", "entries", d = 6, k = 2)
    // dimreduction_test.go:94-97
    val expected = Array(
      Array(-7.478, -0.128, 1.591, 0.496),
      Array(2.937, 2.581, 4.240, 1.110))
    assertMatchesUpToSign(expected, collectProj(out, 2))
  }

  test("PCA explained variance is the top eigenvalues, descending") {
    val docs = docRows(spark)
    val model = PCA.fit(docs, "doc_id", "entries", 6, 2)
    assert(model.scales.length == 2)
    assert(model.scales(0) >= model.scales(1))
    assert(model.scales(0) > 0)
  }

  test("randomized SVD agrees with the exact Gram path (subspace + sv)") {
    val docs = docRows(spark)
    val exact = TruncatedSVD.fit(docs, "doc_id", "entries", 6, 2)
    val rand = TruncatedSVD.fitRandomized(docs, "doc_id", "entries", 2,
      oversample = 4)
    // singular values: tight agreement (sketch captures a rank-3 matrix)
    for (i <- 0 until 2)
      assert(math.abs(exact.scales(i) - rand.scales(i)) / exact.scales(i) < 0.01,
        s"sv $i: ${exact.scales(i)} vs ${rand.scales(i)}")
    // projections agree up to per-component sign
    val pe = collectProj(exact.transform(docs, "doc_id", "entries"), 2)
    val pr = collectProj(rand.transform(docs, "doc_id", "entries"), 2)
    for (comp <- 0 until 2) {
      val e = (0 until 4).map(j => pe(j.toLong)(comp)).toArray
      val r = (0 until 4).map(j => pr(j.toLong)(comp)).toArray
      val m = e.indices.maxBy(i => math.abs(e(i)))
      val flip = if (math.signum(e(m)) == math.signum(r(m))) 1.0 else -1.0
      for (j <- e.indices)
        assert(math.abs(e(j) - flip * r(j)) < 0.05,
          s"comp $comp doc $j: ${e(j)} vs ${flip * r(j)}")
    }
  }

  test("model Save/Load round trip (refs dimreduction_test.go:134-175)") {
    val docs = docRows(spark)
    val model = TruncatedSVD.fit(docs, "doc_id", "entries", 6, 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-svd").toString
    model.save(dir)
    val loaded = DimRedModel.load(spark, dir)
    assert(loaded.k == model.k)
    assert(loaded.scales.zip(model.scales).forall { case (a, b) => a == b })
    // load-and-reuse: transforming with the loaded model reproduces the
    // fitted model's output (ulp-level tolerance: the loaded parquet
    // partitions differently, so the contribution sum order may differ)
    val a = collectProj(model.transform(docs, "doc_id", "entries"), 2)
    val b = collectProj(loaded.transform(docs, "doc_id", "entries"), 2)
    for (j <- 0 until 4; i <- 0 until 2)
      assert(math.abs(a(j.toLong)(i) - b(j.toLong)(i)) <=
        1e-12 * math.max(1.0, math.abs(a(j.toLong)(i))))
  }
}
