package graft.dimred

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * TruncatedSVD / LSA (SURVEY §2.6 R1; `/root/reference/dimreduction.go:34-106`).
 * See [[DimRed]] for the semantics mapping and the two fit paths.
 */
object TruncatedSVD {

  /** Exact fit via the d×d Gram matrix (term ids must be dense 0..d−1).
    * AAᵀ = U S² Uᵀ: Jacobi eigen of the one-pass Gram aggregate gives the
    * left singular directions and singular values directly. */
  def fit(docs: DataFrame, docIdCol: String, entriesCol: String,
          d: Int, k: Int): DimRedModel = {
    val spark = docs.sparkSession
    val (g, _, n) = DimRed.gramAndMeans(docs, docIdCol, entriesCol, d)
    val (vals, vecs) = LinAlg.symEigen(g)
    // clamp in LONG space: n.toInt on a >2^31-doc corpus wraps
    // negative and silently degenerates the model
    val kk = math.min(k.toLong, math.min(d.toLong, n)).toInt
    val sv = vals.take(kk).map(v => math.sqrt(math.max(0.0, v)))
    DimRedModel(componentsDf(spark, vecs, d, kk), sv, kk)
  }

  /**
   * Randomized fit (Halko et al. 2011) for arbitrary-dimensional term
   * spaces: no d×d object, three linear passes, all aggregates ≤ l².
   *  pass 1: Y = A·Ω  — groupBy(term) of w·gaussian(docId, slot)
   *  local : Q = Y·(YᵀY)^{-1/2} (symmetric inverse square root)
   *  pass 2: Z = AᵀQ  — per-doc join on term + groupBy(doc)
   *  local : eigen(ZᵀZ) = eigen(QᵀA AᵀQ) → Ū, S²; components = Q·Ū_k
   * @param oversample extra sketch directions (l = k + oversample)
   */
  def fitRandomized(docs: DataFrame, docIdCol: String, entriesCol: String,
                    k: Int, oversample: Int = 8): DimRedModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    val l = k + oversample

    // pass 1: sketch Y (term, y[l]); Ω rows are counter-based Gaussians
    // keyed by docId — deterministic, generated inside codegen, never
    // materialised as a matrix
    val ex = docs.select(col(docIdCol).as("__doc"), explode(col(entriesCol)).as("e"))
      .select(col("__doc"), col("e.term").as("term"),
        col("e.weight").cast("double").as("w"))
    // per-slot sums, NOT collect_list+fold: the group key is the TERM,
    // whose group size is unbounded (a frequent term appears in nearly
    // every doc), so a buffered list of l-vectors is O(docFreq·l) in one
    // aggregation buffer — see DimRed.sumSlots
    val y = ex.select(col("term"),
        graft.hash.HashFunctions.gaussianSketch(col("__doc"), col("w"), l)
          .as("contrib"))
      .groupBy("term")
      .agg(DimRed.sumSlots("contrib", l).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // local: YᵀY (l×l) → Q = Y·W where W = E·Λ^{-1/2}·Eᵀ
    val w = invSqrt(gramSmall(y, "y", l)._1)
    val q = mapVecs(y, "term", "y", w).toDF("term", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 2: Z rows z_doc = Qᵀ a_doc (doc, z[l])
    val z = DimRed.project(docs, docIdCol, entriesCol,
      q, l).withColumnRenamed("proj", "z")

    // local: ZᵀZ = (QᵀA)(QᵀA)ᵀ (l×l) → Ū, singular values
    val (ztz, nDocs) = gramSmall(z, "z", l)
    val (vals, vecs) = LinAlg.symEigen(ztz)
    // clamp by the doc count too (same degenerate case fit() clamps):
    // rank(ZᵀZ) ≤ n, so at k > n the trailing eigenpairs are numerical
    // noise — arbitrary rotations of the null space that transform()
    // would happily project onto. The count rides the z-gram pass, no
    // extra job.
    val kk = math.min(math.min(k.toLong, l.toLong), nDocs).toInt
    val sv = vals.take(kk).map(v => math.sqrt(math.max(0.0, v)))
    // components U_k = Q·Ū_k — a (term, vec[k]) table end-to-end
    val comps = mapVecs(q, "term", "vec", vecs.take(kk)).toDF("term", "vec")
    val materialised = comps.cache()
    materialised.count() // cut the lineage through the y/q persists
    y.unpersist(); q.unpersist()
    DimRedModel(materialised, sv, kk)
  }

  /** Distributed l×l Gram of a (_, vec[l]) table: per-partition outer
    * products folded PID-ASCENDING on the driver — an arrival-order
    * reduce would associate the Double sums by task-completion order
    * and make the fitted components bit-nondeterministic across runs
    * (the same defect class fixed in Lda's wordsInCorpus/perplexity
    * merges). The partials are computed by ONE parallel job (persist +
    * count — every partition's O(rows·l²) outer-product work runs
    * concurrently across the executors), then STREAM to the driver via
    * toLocalIterator over the cached blocks (partitions in index order,
    * each one row), so the fold order is identical to a collect-and-sort
    * while the driver holds ONE l×l partial at a time instead of all P
    * at once — at l=512, P=2000 that's 2 MB resident vs 4 GB. (A bare
    * toLocalIterator without the persist would serialise the Gram
    * compute itself — one single-task job per partition, losing all
    * executor parallelism on the fit's heaviest stage. A tree merge
    * would bound the driver cost too, but it re-associates the sums and
    * moves the fitted goldens by ULPs.) */
  private def gramSmall(df: DataFrame, vecCol: String,
                        l: Int): (Array[Array[Double]], Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df.select(col(vecCol)).as[Seq[Double]]
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = new Array[Double](l * l)
        var rows = 0L
        it.foreach { v =>
          rows += 1L
          var i = 0
          while (i < l) {
            val vi = v(i)
            var j = 0
            while (j < l) { m(i * l + j) += vi * v(j); j += 1 }
            i += 1
          }
        }
        Iterator((pid, m, rows))
      }
    val cached = parts.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val flat = new Array[Double](l * l)
    var rowCount = 0L
    try {
      cached.count() // the one PARALLEL job: every partial materialises
      cached.toLocalIterator.foreach { case (_, m, rows) =>
        rowCount += rows
        var i = 0
        while (i < flat.length) { flat(i) += m(i); i += 1 }
      }
    } finally { cached.unpersist(blocking = false); () }
    (Array.tabulate(l, l)((i, j) => flat(i * l + j)), rowCount)
  }

  /** Row-wise small-matrix multiply: (id, vec) → (id, M·vec) with M a
    * driver-local (rows×|vec|) matrix, closure-serialised once per task. */
  private def mapVecs(df: DataFrame, idCol: String, vecCol: String,
                      m: Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol), col(vecCol)).as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val arr = v.toArray
        (id, m.map(row => dot(row, arr)))
      }
  }

  /** FitTransform = fit + project (reference `dimreduction.go:62-87`:
    * S·V_kᵀ = U_kᵀ·A — identical to Transform on the training data). */
  def fitTransform(docs: DataFrame, docIdCol: String, entriesCol: String,
                   d: Int, k: Int): (DimRedModel, DataFrame) = {
    val m = fit(docs, docIdCol, entriesCol, d, k)
    (m, m.transform(docs, docIdCol, entriesCol))
  }

  private[dimred] def componentsDf(spark: SparkSession,
                                   vecs: Array[Array[Double]], d: Int,
                                   k: Int): DataFrame = {
    // vecs: k rows of length d (eigenvectors); emit (term, vec[k]) —
    // a bounded dim table (exact-path d is ≤ a few thousand by contract)
    import scala.jdk.CollectionConverters._
    val rows: java.util.List[Row] = (0 until d).map { t =>
      Row(t.toLong, (0 until k).map(i => vecs(i)(t)))
    }.asJava
    spark.createDataFrame(rows,
      StructType(Seq(StructField("term", LongType),
        StructField("vec", ArrayType(DoubleType)))))
  }

  // ---- small local helpers (l×l scale only) ----
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  /** Symmetric inverse square root via eigen; near-zero modes dropped
    * (rank-deficient sketches stay stable). */
  private def invSqrt(m: Array[Array[Double]]): Array[Array[Double]] = {
    val l = m.length
    val copy = Array.tabulate(l, l)((i, j) => m(i)(j))
    val (vals, vecs) = LinAlg.symEigen(copy)
    val tol = math.max(1e-12, vals.headOption.getOrElse(0.0) * 1e-10)
    val out = Array.ofDim[Double](l, l)
    var e = 0
    while (e < l) {
      if (vals(e) > tol) {
        val inv = 1.0 / math.sqrt(vals(e))
        var i = 0
        while (i < l) {
          var j = 0
          while (j < l) { out(i)(j) += vecs(e)(i) * inv * vecs(e)(j); j += 1 }
          i += 1
        }
      }
      e += 1
    }
    out
  }
}

/**
 * PCA (SURVEY §2.6 R2; `/root/reference/dimreduction.go:158-213`):
 * principal directions of the term-covariance across documents
 * (docs = observations, matching gonum stat.PC on Aᵀ). Transform
 * projects the UNcentered doc vectors, exactly as the reference does
 * (`dimreduction.go:180-196` applies m.T()·V_k with no mean
 * subtraction). ExplainedVariance = component variances.
 */
object PCA {

  def fit(docs: DataFrame, docIdCol: String, entriesCol: String,
          d: Int, k: Int): DimRedModel = {
    val spark = docs.sparkSession
    val (g, sums, n) = DimRed.gramAndMeans(docs, docIdCol, entriesCol, d)
    // the (n−1) Bessel divisor needs ≥ 2 observations: at n=1 every
    // covariance cell is x/0 → ±Inf/NaN, the Jacobi sweep's tolerance
    // test is vacuously false on NaN, and fit returns an all-NaN model
    // with no signal (n=0 likewise via 0/0)
    require(n >= 2,
      s"PCA.fit needs at least 2 documents (got $n): sample covariance " +
        "is undefined and the model would silently be all-NaN")
    // covariance = (G − n·μμᵀ)/(n−1)
    val cov = Array.tabulate(d, d) { (i, j) =>
      (g(i)(j) - sums(i) * sums(j) / n) / (n - 1.0)
    }
    val (vals, vecs) = LinAlg.symEigen(cov)
    // Long-space clamp — same overflow hazard as TruncatedSVD.fit
    val kk = math.min(k.toLong, math.min(d.toLong, n)).toInt
    DimRedModel(TruncatedSVD.componentsDf(spark, vecs, d, kk),
      vals.take(kk), kk)
  }

  def fitTransform(docs: DataFrame, docIdCol: String, entriesCol: String,
                   d: Int, k: Int): (DimRedModel, DataFrame) = {
    val m = fit(docs, docIdCol, entriesCol, d, k)
    (m, m.transform(docs, docIdCol, entriesCol))
  }
}
