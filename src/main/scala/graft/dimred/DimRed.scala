package graft.dimred

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dimensionality-reduction transformers (SURVEY §2.6 R1/R2):
 * TruncatedSVD (LSA) and PCA, re-expressed for doc-row sparse vectors.
 *
 * Reference semantics (`/root/reference/dimreduction.go`):
 *  - the reference matrix A is terms×docs (m×n); ours is the transpose —
 *    one row per document with sparse (term, weight) entries.
 *  - TruncatedSVD.FitTransform(A) = S·V_kᵀ (k×n): k values per DOCUMENT
 *    (`dimreduction.go:62-87`). Since A = U S Vᵀ, S·V_kᵀ = U_kᵀ·A, so in
 *    doc-row layout: out(doc) = U_kᵀ a_doc — project each doc vector onto
 *    the top-k left singular directions. Components = U_k (terms×k,
 *    `dimreduction.go:17-22`); Transform(m) = Componentsᵀ·m
 *    (`dimreduction.go:50-57`) — the same projection, so
 *    FitTransform == Transform on the training matrix (asserted by the
 *    reference's own consistency check, `dimreduction_test.go:60-69`).
 *  - PCA fits gonum stat.PC on Aᵀ = docs×terms — docs are observations,
 *    terms are variables (`dimreduction.go:170-177`); principal
 *    directions are the eigenvectors of the term-covariance across docs.
 *    Transform projects the UNcentered data onto the components
 *    (`dimreduction.go:180-196` — m.T()·V_k, no mean subtraction).
 *
 * Scale shape: two fit paths sharing one model format.
 *  - **Exact Gram path** (d = #distinct terms ≤ a few thousand, e.g.
 *    vocabulary-fitted spaces): G = Σ_doc a aᵀ via one explode-pair
 *    shuffle (output ≤ d², corpus never leaves executors), then local
 *    Jacobi eigendecomposition of the d×d aggregate. A=USVᵀ ⇒
 *    AAᵀ = U S² Uᵀ, so eigen(G) gives U and S directly.
 *  - **Randomized path** (any d, e.g. 2^18 hashed feature space; Halko,
 *    Martinsson, Tropp 2011): range sketch Y = A·Ω with Ω's rows being
 *    deterministic counter-based Gaussians per docId (no matrix
 *    materialised, same trick as SimHash hyperplanes); orthonormalise
 *    Q = Y·(YᵀY)^{-1/2}; Z = AᵀQ per doc via a term join; eigen of the
 *    l×l aggregate Z ᵀZ = (QᵀA)(QᵀA)ᵀ yields the top-k directions in the
 *    sketched subspace; components U_k = Q·Ū_k stay a (term, vec)
 *    DataFrame end-to-end. Three linear passes, no d×d object anywhere.
 *
 * The fitted model is a (term, Array[Double](k)) DataFrame + singular
 * values — the Save/Load surface (`dimreduction.go:111-153`) maps to a
 * parquet table + JSON manifest via [[DimRedModel.save]]/[[DimRedModel.load]].
 */
object DimRed {

  /** entries column contract: array<struct<term: long, weight: double>>.
    * explode_outer keeps docs with empty entry arrays (null term row) so
    * they survive to the projection aggregate. */
  private def exploded(docs: DataFrame, docIdCol: String, entriesCol: String) =
    docs.select(col(docIdCol).as("__doc"), explode_outer(col(entriesCol)).as("e"))
      .select(col("__doc"), col("e.term").as("term"),
        col("e.weight").cast("double").as("w"))

  /** Dense d×d Gram matrix G = Σ_doc a aᵀ plus the term-sum vector and
    * doc count, in ONE corpus pass (upper triangle aggregated, mirrored
    * locally). Term ids must be dense 0..d−1 (vocabulary-fitted) and
    * DISTINCT within each doc's entries (every vectorizer in this
    * library emits one entry per term): a duplicated term leaves the
    * Gram correct — all m² weight pairs of an m-duplicated term belong
    * in G(t,t) — but the diagonal-cell term-sum trick below counts each
    * weight m times, silently inflating the mean vector PCA subtracts.
    * Merge duplicates upstream rather than paying a per-fit audit pass
    * here. */
  def gramAndMeans(docs: DataFrame, docIdCol: String, entriesCol: String,
                   d: Int): (Array[Array[Double]], Array[Double], Long) = {
    val rows = docs.select(col(docIdCol).as("__doc"), col(entriesCol).as("es"))
      .select(col("__doc"), explode(col("es")).as("e1"), col("es"))
      .select(col("__doc"), col("e1"), explode(col("es")).as("e2"))
      .filter(col("e1.term") <= col("e2.term"))
      .groupBy(col("e1.term").as("i"), col("e2.term").as("j"))
      .agg(sum(col("e1.weight") * col("e2.weight")).as("g"),
        // term sums ride the i==j cells (each entry hits its diagonal
        // pair exactly once), saving a second corpus pass
        sum(when(col("e1.term") === col("e2.term"), col("e1.weight"))
          .otherwise(lit(0.0))).as("s"))
      .collect()
    val g = Array.ofDim[Double](d, d)
    val sums = new Array[Double](d)
    rows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val v = r.getDouble(2)
      g(i)(j) = v; g(j)(i) = v
      if (i == j) sums(i) = r.getDouble(3)
    }
    val n = docs.count()
    (g, sums, n)
  }

  /** Deterministic unit Gaussian, counter-based — delegates to the
    * shared kernel (see HashKernels.gaussian). */
  def gaussian(key: Long, slot: Int): Double =
    graft.hash.HashKernels.gaussian(key, slot)

  /** Project docs onto a (term, vec[k]) component table: out(doc) =
    * Σ_entries w · vec(term) — the Transform of both SVD (U_kᵀ·a) and
    * PCA (uncentered projection). One join + one groupBy(doc); the
    * component table is broadcast when small, shuffle-joined otherwise
    * (Catalyst decides from stats). Docs with no in-vocabulary terms get
    * the zero vector — the reference's Componentsᵀ·m yields a zero
    * column for such docs (`dimreduction.go:50-57`), so they must stay
    * in the output: explode_outer keeps empty-entry docs, the LEFT join
    * keeps all-OOV entries (null vec → null contrib, whose slots `sum`
    * skips; an all-null group's null sums coalesce to the zero vector). */
  def project(docs: DataFrame, docIdCol: String, entriesCol: String,
              components: DataFrame, k: Int): DataFrame = {
    val ex = exploded(docs, docIdCol, entriesCol)
    // equi-join on term: Catalyst broadcasts the component table when it
    // fits (k·d small) and shuffle-joins otherwise — no forced hint
    val joined = ex.join(components, Seq("term"), "left")
      .select(col("__doc"),
        transform(col("vec"), v => v * col("w")).as("contrib"))
    joined.groupBy(col("__doc"))
      .agg(sumSlots("contrib", k).as("proj"))
      .select(col("__doc").as(docIdCol), col("proj"))
  }

  /** Element-wise sum of an array[k]-of-double column as k independent
    * `sum(element_at(…))` aggregates reassembled into one array. The
    * former `aggregate(collect_list(…), zero, zip_with(+))` buffered the
    * COMPLETE list of per-row k-vectors per group before folding —
    * O(groupRows·k) doubles in a single aggregation buffer, which at the
    * unbounded group sizes these callers see (a frequent term appears in
    * nearly every document) is an executor OOM, not a spill. Per-slot
    * sums keep O(k) state per group, combine map-side, and run in
    * whole-stage-codegen HashAggregate instead of ObjectHashAggregate.
    * Partials merge in the same order collect_list concatenated them,
    * so the Double association — and the fitted goldens — are unmoved.
    * Null rows (OOV left-join misses) are skipped per slot; an all-null
    * group coalesces to the zero vector, both exactly as the fold
    * treated them. */
  private[dimred] def sumSlots(contribCol: String, k: Int): Column =
    array((0 until k).map(i =>
      coalesce(sum(element_at(col(contribCol), i + 1)), lit(0.0))): _*)

  /** Local k-truncation helper: top-k eigenpairs → (term-indexed rows of
    * U_k as a local array, singular values). */
  private[dimred] def truncate(vals: Array[Double], vecs: Array[Array[Double]],
                               k: Int): (Array[Double], Array[Array[Double]]) = {
    val kk = math.min(k, vals.length)
    (vals.take(kk), vecs.take(kk))
  }
}

/** Fitted projection model shared by TruncatedSVD and PCA: a sparse
  * (term, vec[k]) component table + per-component scale values
  * (singular values for SVD, explained variances for PCA). */
final case class DimRedModel(components: DataFrame, scales: Array[Double], k: Int) {

  def transform(docs: DataFrame, docIdCol: String, entriesCol: String): DataFrame =
    DimRed.project(docs, docIdCol, entriesCol, components, k)

  /** Persist as parquet + JSON manifest (atomic rename — the same
    * Iceberg-style commit protocol as ckpt.ParquetStageStore). Mirrors
    * the reference's binary Save (`dimreduction.go:111-122`). */
  def save(path: String): Unit = {
    val hconf = components.sparkSession.sparkContext.hadoopConfiguration
    // whole model dir built under a staging dir, then swap-committed —
    // a crash mid-re-save over an existing path must not leave the old
    // manifest next to a partial payload (see Fs.publishDir). The
    // manifest goes through the SAME Hadoop filesystem as the parquet
    // write — java.nio would land it in a different namespace on
    // HDFS/S3.
    graft.ckpt.Fs.publishDir(path, hconf) { staging =>
      components.write.mode("overwrite")
        .parquet(s"$staging/components.parquet")
      graft.ckpt.Fs.writeStringAtomic(s"$staging/model.json",
        s"""{"k":$k,"scales":[${scales.mkString(",")}]}""", hconf)
    }
  }
}

object DimRedModel {
  /** Load a model previously written by save (`dimreduction.go:128-153`). */
  def load(spark: SparkSession, path: String): DimRedModel = {
    // complete a save() a crashed writer left mid-commit
    graft.ckpt.Fs.recoverPublish(path, spark.sparkContext.hadoopConfiguration)
    val json = graft.ckpt.Fs.readString(s"$path/model.json",
      spark.sparkContext.hadoopConfiguration)
    val k = """"k":(\d+)""".r.findFirstMatchIn(json).get.group(1).toInt
    val scales = """"scales":\[([^\]]*)\]""".r.findFirstMatchIn(json).get.group(1)
      .split(",").filter(_.nonEmpty).map(_.toDouble)
    DimRedModel(spark.read.parquet(s"$path/components.parquet"), scales, k)
  }
}
