package graft.tfidf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.hash.HashFunctions.murmur3go

/**
 * TF-IDF stage (SURVEY §2.3 A2–A5).
 *
 * Reference semantics:
 *  - tf(t,d): term count per doc (`/root/reference/vectorisers.go:187-200`)
 *  - hashed tf: murmur3 feature id, collisions additive
 *    (`/root/reference/vectorisers.go:236-268`)
 *  - df(t): #docs containing t; idf = ln((1+n)/(1+df)) — no +1 smoothing
 *    inside, no L2 norm (`/root/reference/weightings.go:32-61`, TODO at :77-78)
 *  - tf-idf: per-entry tf·idf(t) (`/root/reference/weightings.go:68-81`)
 *
 * Scale design: term-frequency vectors are computed **per-row with no
 * shuffle** (higher-order array functions, codegen'd): for ~100-token web
 * pages the O(|distinct|·|tokens|) per-row scan beats an
 * explode → groupBy → collect_list round-trip (two shuffles of the
 * exploded corpus — at 10^12 docs that is the dominant cost). The only
 * shuffles in the whole stage are the df aggregation (map-side partial
 * combine, output = vocabulary-sized) and the final regroup after the
 * broadcast idf join.
 */
object TfIdf {

  /** Per-row hashed term-frequency entries, reference-compatible:
    * feature id = unsigned murmur3_32(token) mod numFeatures; colliding
    * tokens add up (computed on the hashed array, so collisions merge
    * exactly as the reference DOK accumulation does).
    * Returns ArrayType(Struct(term: Long, cnt: Int)) sorted by term. */
  def hashedTfEntries(tokens: Column, numFeatures: Int): Column = {
    val hashed = transform(tokens, t => murmur3go(t) % numFeatures)
    array_sort(transform(
      array_distinct(hashed),
      h => struct(
        h.as("term"),
        size(filter(hashed, x => x === h)).as("cnt"))))
  }

  /** Per-row string-term frequency entries (CountVectoriser.Transform
    * shape, vocabulary-free). ArrayType(Struct(term: String, cnt: Int)). */
  def tfEntries(tokens: Column): Column =
    array_sort(transform(
      array_distinct(tokens),
      t => struct(t.as("term"), size(filter(tokens, x => x === t)).as("cnt"))))

  /** Document frequency: one shuffle, partial-aggregated.
    * Input: df with (docIdCol, tokensCol). Output: (term, df). */
  def docFreq(docs: DataFrame, tokens: Column): DataFrame =
    docs.select(explode(array_distinct(tokens)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** idf table: ln((1+n)/(1+df)) — exact counts (golden fixtures check
    * 16 digits, `/root/reference/weightings_test.go:30-37`). */
  def idf(docFreq: DataFrame, numDocs: Long): DataFrame =
    docFreq.select(col("term"),
      log((lit(1.0) + numDocs) / (lit(1.0) + col("df"))).as("idf"))

  /**
   * Apply idf weights to per-doc tf entries.
   * `entries` must be ArrayType(Struct(term, cnt)). The idf table is
   * broadcast (vocab-sized: bounded by numFeatures under the hashing
   * trick) and joined against the exploded entries; the regroup is the
   * stage's one shuffle on docId. OOV terms keep weight 0 via coalesce
   * (reference drops OOV at transform time, `vectorisers.go:193-198`;
   * with the hashing trick OOV cannot occur).
   * Output: docs' columns + `tfidf` ArrayType(Struct(term, weight)).
   */
  /** Fitted TF-IDF model: the idf weight table + corpus doc count —
    * the state the reference binary-serialises (DIA diagonal + shape,
    * `/root/reference/weightings.go:97-116`). Save/Load round-trips as
    * a parquet table + JSON manifest with the same atomic-rename commit
    * as the other model artifacts; a loaded model reproduces the
    * fitted model's weights exactly (`weightings_test.go:123-155`). */
  final case class TfIdfModel(idf: DataFrame, numDocs: Long) {
    def transform(docs: DataFrame, docIdCol: String, entriesCol: String): DataFrame =
      applyIdf(docs, docIdCol, entriesCol, idf)

    def save(path: String): Unit = {
      val hconf = idf.sparkSession.sparkContext.hadoopConfiguration
      // whole model dir built under a staging dir, then swap-committed
      // (Fs.publishDir) — a crash mid-re-save must not leave the old
      // manifest next to a partial payload. The manifest goes through
      // the SAME filesystem the parquet landed on (Hadoop FS resolved
      // from the path) — java.nio here would split the artifact across
      // namespaces on a non-local default FS.
      graft.ckpt.Fs.publishDir(path, hconf) { staging =>
        idf.write.mode("overwrite").parquet(s"$staging/idf.parquet")
        graft.ckpt.Fs.writeStringAtomic(s"$staging/model.json",
          s"""{"numDocs":$numDocs}""", hconf)
      }
    }
  }

  object TfIdfModel {
    def load(spark: org.apache.spark.sql.SparkSession, path: String): TfIdfModel = {
      // complete a save() a crashed writer left mid-commit
      graft.ckpt.Fs.recoverPublish(path, spark.sparkContext.hadoopConfiguration)
      val json = graft.ckpt.Fs.readString(s"$path/model.json",
        spark.sparkContext.hadoopConfiguration)
      val n = """"numDocs":(\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
      TfIdfModel(spark.read.parquet(s"$path/idf.parquet"), n)
    }
  }

  /** Fit a [[TfIdfModel]] from (docIdCol, tokens). */
  def fit(docs: DataFrame, tokens: Column): TfIdfModel = {
    val n = docs.count()
    TfIdfModel(idf(docFreq(docs, tokens), n), n)
  }

  def applyIdf(docs: DataFrame, docIdCol: String, entriesCol: String,
               idfTable: DataFrame): DataFrame = {
    val exploded = docs.select(col(docIdCol), explode(col(entriesCol)).as("e"))
      .select(col(docIdCol), col("e.term").as("term"),
        col("e.cnt").cast("double").as("cnt"))
    // no forced broadcast: the idf table is bounded by numFeatures on
    // the HASHED path (a few MB — the planner auto-broadcasts it from
    // stats) but VOCABULARY-sized on the string-term path, where a
    // web corpus's distinct terms would OOM a forced driver build.
    // Catalyst picks broadcast vs shuffle from the table's actual size
    // (same treatment as DimRed.project's component join).
    val weighted = exploded
      .join(idfTable, Seq("term"), "left")
      .select(col(docIdCol),
        struct(col("term"),
          (col("cnt") * coalesce(col("idf"), lit(0.0))).as("weight")).as("e"))
    val regrouped = weighted.groupBy(docIdCol)
      .agg(array_sort(collect_list("e")).as("tfidf"))
    // empty-entries docs produce no exploded row → no regrouped row:
    // backfill the EMPTY ARRAY, not null (the reference's empty-vector
    // semantics; a null array silently drops the doc from downstream
    // array ops)
    val outType = regrouped.schema("tfidf").dataType
    docs.join(regrouped, Seq(docIdCol), "left")
      .withColumn("tfidf", coalesce(col("tfidf"), array().cast(outType)))
  }
}
