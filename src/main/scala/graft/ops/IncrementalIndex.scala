package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{DedupConfig, DedupPipeline}
import graft.DedupPipeline.CorpusStats

/**
 * Incremental signature index (SURVEY §2.1 S3 — the reference's
 * `Index`/`Remove` mutations, `/root/reference/lsh.go:75-80`,
 * `index.go:119-136`, and the `PartialFit` accretion pattern,
 * `randomprojection.go:253-270`): a partitioned Parquet signature table
 * that supports batch insert (append), delete (atomic rewrite), and
 * querying new documents against the existing index without
 * re-signaturing the whole corpus.
 *
 * Corpus stats (idf arrays + hot-shingle drop list) are FITTED ON THE
 * FIRST PUT and persisted alongside the index; every later put and
 * every search reuses them. Signatures are therefore batch-independent:
 * identical text always produces identical band keys, no matter which
 * batch it arrived in — the incremental-search correctness requirement
 * (per-batch stats would silently miss true duplicates whenever the
 * batches' df-conditioned drop lists diverged).
 *
 * Scale shape: an insert touches only the new batch (signatures are
 * per-row); a search shuffles the new batch's band keys against the
 * stored band table — the stored side is read with partition pruning
 * on `band`.
 */
class IncrementalIndex(spark: SparkSession, path: String,
                       cfg: DedupConfig = DedupConfig()) {
  import graft.ckpt.Fs

  // signatures live in a shared partitioned-parquet batch store (also
  // used by ForestIndex): per-batch idempotent puts, schema-pinned
  // reads, swap-commit rewrites — all metadata through the Hadoop FS
  // resolved from the index path, so the index works on HDFS/S3-
  // compatible stores, not just the local filesystem
  private val store = new graft.ckpt.BatchStore(spark, s"$path/sigs")
  private val hconf = spark.sparkContext.hadoopConfiguration

  private def statsPath = s"$path/stats"

  def isEmpty: Boolean = store.isEmpty

  private def loadStats(): Option[CorpusStats] =
    if (!Fs.exists(statsPath, hconf)) None
    else {
      val r = spark.read.parquet(statsPath).head()
      Some(CorpusStats(r.getLong(0),
        r.getSeq[Long](1).toArray, r.getSeq[Double](2).toArray,
        r.getSeq[Long](3).toArray))
    }

  private def saveStats(st: CorpusStats): Unit = {
    import spark.implicits._
    Seq((st.n, st.idfTerms.toSeq, st.idfVals.toSeq, st.hotShingles.toSeq))
      .toDF("n", "idf_terms", "idf_vals", "hot_shingles")
      .write.mode("overwrite").parquet(statsPath)
  }

  /** Signature a batch of pages (url, text) with the PERSISTED corpus
    * stats (fitted and saved on the first call). */
  private def signatures(pages: DataFrame): DataFrame = {
    val ext = DedupPipeline.extract(pages, cfg)
    val tfd = DedupPipeline.withTf(ext, cfg)
    val stats = loadStats().getOrElse {
      val st = DedupPipeline.fitCorpusStats(tfd, cfg)
      saveStats(st)
      st
    }
    DedupPipeline.applySignatures(tfd, stats, cfg)
      .select(col("url"), col("doc_id"), col("minhash"), col("simhash"),
        col("shingles"))
  }

  /** Append a batch to the index (reference `Index(v, id)`). Each put
    * lands in its own `batch=<id>` partition directory; the id is
    * allocated and written under one writer-lease claim. */
  def put(pages: DataFrame): Unit = { store.append(signatures(pages)); () }

  /** Idempotent per-batch insert: writing batch `id` twice (streaming
    * replay after a failure — foreachBatch is at-least-once) overwrites
    * the same partition directory instead of duplicating rows. */
  def putBatch(pages: DataFrame, batchId: Long): Unit =
    store.writeBatch(signatures(pages), batchId)

  /** Remove documents by url (reference `Remove(id)`): anti-join
    * rewrite into a TEMP directory, then an atomic directory swap —
    * the read source is never the write target, so cache eviction or a
    * mid-write crash cannot destroy the index (overwrite-in-place was
    * the round-1 hazard). On HDFS/object stores this maps to a rename
    * commit / Iceberg snapshot swap. */
  def remove(urls: DataFrame): Unit =
    store.rewrite(_.join(urls.select(col("url")), Seq("url"), "left_anti"))

  def all(): DataFrame = store.all()

  /** Near-dup matches of `pages` against the stored index: band-key
    * equi-join + exact Jaccard verify (reference `Search` semantics,
    * `index.go:215-255`, without top-k truncation). Queries are signed
    * with the stored corpus stats so band keys line up with the index.
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
