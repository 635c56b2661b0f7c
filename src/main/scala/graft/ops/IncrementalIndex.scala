package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{DedupConfig, DedupPipeline}

/**
 * Incremental signature index (SURVEY §2.1 S3 — the reference's
 * `Index`/`Remove` mutations, `/root/reference/lsh.go:75-80`,
 * `index.go:119-136`, and the `PartialFit` accretion pattern,
 * `randomprojection.go:253-270`): a partitioned Parquet signature table
 * that supports batch insert (append), delete (anti-join rewrite), and
 * querying new documents against the existing index without
 * re-signaturing the whole corpus.
 *
 * Scale shape: an insert touches only the new batch (signatures are
 * per-row); a search shuffles the new batch's band keys against the
 * stored band table — the stored side is read with partition pruning
 * on `band`.
 */
class IncrementalIndex(spark: SparkSession, path: String,
                       cfg: DedupConfig = DedupConfig()) {

  private def sigPath = s"$path/sigs"

  def isEmpty: Boolean = !new java.io.File(sigPath).exists()

  /** Signature a batch of pages (url, text) — reuses the pipeline's
    * extraction + signature stages. */
  private def signatures(pages: DataFrame): DataFrame = {
    val ext = DedupPipeline.extract(pages, cfg)
    DedupPipeline.signatures(ext, cfg)
      .select(col("url"), col("doc_id"), col("minhash"), col("simhash"),
        col("shingles"))
  }

  /** Append a batch to the index (reference `Index(v, id)`). */
  def put(pages: DataFrame): Unit =
    signatures(pages).write.mode("append").parquet(sigPath)

  /** Remove documents by url (reference `Remove(id)`): anti-join
    * rewrite — the Parquet emulation of `MERGE ... THEN DELETE`. */
  def remove(urls: DataFrame): Unit = {
    val keep = spark.read.parquet(sigPath)
      .join(urls.select(col("url")), Seq("url"), "left_anti")
      .cache()
    keep.count() // materialise before overwriting the source
    keep.write.mode("overwrite").parquet(sigPath)
    keep.unpersist()
  }

  def all(): DataFrame = spark.read.parquet(sigPath)

  /** Near-dup matches of `pages` against the stored index: band-key
    * equi-join + exact Jaccard verify (reference `Search` semantics,
    * `index.go:215-255`, without top-k truncation).
    * Returns (query_url, match_url, jaccard). */
  def search(pages: DataFrame): DataFrame = {
    import graft.lsh.Lsh
    val q = signatures(pages)
    val stored = all()
    def bands(df: DataFrame) = Lsh.explodeBands(df, "doc_id",
      Lsh.minhashBandKeys(col("minhash"), cfg.bands, cfg.rows),
      element_at(col("minhash"), 1))
    val cands = bands(q).select(col("doc_id").as("qid"), col("band"), col("key"))
      .join(bands(stored).select(col("doc_id").as("sid"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("qid") =!= col("sid"))
      .select("qid", "sid").distinct()
    val qs = q.select(col("doc_id").as("qid"), col("url").as("query_url"),
      col("shingles").as("qsh"))
    val ss = stored.select(col("doc_id").as("sid"), col("url").as("match_url"),
      col("shingles").as("ssh"))
    cands.join(qs, "qid").join(ss, "sid")
      .withColumn("jaccard", graft.verify.Measures.jaccard(col("qsh"), col("ssh")))
      .filter(col("jaccard") >= cfg.tau)
      .select("query_url", "match_url", "jaccard")
  }
}
