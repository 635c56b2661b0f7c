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
 * per-row); a search prunes the stored side to the band-bucket
 * partitions its query batch actually touches, then equi-joins — the
 * reference's sub-linear per-band bucket lookup (union of bucket
 * members, `/root/reference/lsh.go:87-108`) re-expressed as partition
 * pruning over a `pb = band·B + (key mod B)` directory layout instead
 * of an in-memory hash map. The pruning set is collected on the driver
 * but its DOMAIN is the fixed pb range (bands·bandBuckets ≤ a few
 * thousand), not the corpus, so the collect is constant-bounded at any
 * index size.
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
  // band-exploded serving rows (pb, key, doc_id), partitioned by pb
  // under each batch dir — the searchable layout. Kept NEXT TO the
  // signature store (not instead of it): verification needs shingles,
  // and a remove rewrites both.
  private val bandStore = new graft.ckpt.BatchStore(spark, s"$path/bands",
    subPartitionCols = Seq("pb"))
  private val hconf = spark.sparkContext.hadoopConfiguration

  /** Partition-bucket id of a band row: band·B + (key mod B). Encodes
    * the band exactly (bucket < B), so (pb, key) equality ⇔
    * (band, key) equality. */
  private def pbCol(band: org.apache.spark.sql.Column,
                    key: org.apache.spark.sql.Column) =
    (band.cast("int") * cfg.bandBuckets +
      pmod(key, lit(cfg.bandBuckets.toLong)).cast("int")).cast("int")

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
    * allocated and both halves written under one writer-lease claim on
    * the signature store. */
  def put(pages: DataFrame): Unit = {
    val sigs = signatures(pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      store.append(sigs, id => bandStore.writeBatch(bandRows(sigs), id))
      ()
    } finally { sigs.unpersist(); () }
  }

  /** Band rows of signature rows, in the serving layout. */
  private def bandRows(sigs: DataFrame): DataFrame = {
    import graft.lsh.Lsh
    Lsh.explodeBands(sigs, "doc_id",
        Lsh.minhashBandKeys(col("minhash"), cfg.bands, cfg.rows), lit(0L))
      .select(pbCol(col("band"), col("key")).as("pb"), col("key"),
        col("doc_id"))
  }

  /** Idempotent per-batch insert: writing batch `id` twice (streaming
    * replay after a failure — foreachBatch is at-least-once) overwrites
    * the same partition directories instead of duplicating rows. Both
    * halves (signatures + band rows) key on the same batch id. */
  def putBatch(pages: DataFrame, batchId: Long): Unit = {
    val sigs = signatures(pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      store.writeBatch(sigs, batchId)
      bandStore.writeBatch(bandRows(sigs), batchId)
    } finally { sigs.unpersist(); () }
  }

  /** Remove documents by url (reference `Remove(id)`): anti-join
    * rewrite into a TEMP directory, then an atomic directory swap —
    * the read source is never the write target, so cache eviction or a
    * mid-write crash cannot destroy the index (overwrite-in-place was
    * the round-1 hazard). On HDFS/object stores this maps to a rename
    * commit / Iceberg snapshot swap. */
  def remove(urls: DataFrame): Unit = {
    val u = urls.select(col("url"))
    if (!bandStore.isEmpty) {
      // band rows first, FROM the still-intact signature store: a crash
      // between the two rewrites leaves the removed docs bandless —
      // unreachable by search, i.e. already effectively removed — and
      // re-running the remove is idempotent. (The reverse order would
      // leave dangling band rows that resurrect removed docs as
      // candidates.)
      val removedIds = store.all().join(u, Seq("url"), "left_semi")
        .select(col("doc_id"))
      bandStore.rewrite(_.join(removedIds, Seq("doc_id"), "left_anti"))
    }
    store.rewrite(_.join(u, Seq("url"), "left_anti"))
  }

  def all(): DataFrame = store.all()

  /** Near-dup matches of `pages` against the stored index: pruned
    * band-key equi-join + exact Jaccard verify (reference `Search`
    * semantics, `index.go:215-255`, without top-k truncation). Queries
    * are signed with the stored corpus stats so band keys line up with
    * the index. The stored side reads ONLY the `pb` partitions present
    * in the query batch (PartitionFilters in the scan — sub-linear in
    * the index size, like the reference's per-band bucket lookup); the
    * pruning set's size is bounded by the fixed pb domain, never by
    * the corpus. Falls back to a full band join on an index written
    * before the band layout existed. Returns
    * (query_url, match_url, jaccard). */
  def search(pages: DataFrame): DataFrame = {
    import graft.lsh.Lsh
    val q = signatures(pages)
    val stored = all()
    def bands(df: DataFrame) = Lsh.explodeBands(df, "doc_id",
      Lsh.minhashBandKeys(col("minhash"), cfg.bands, cfg.rows),
      element_at(col("minhash"), 1))
    val candsRaw =
      if (bandStore.isEmpty) {
        // legacy layout: explode the whole stored table and shuffle
        bands(q).select(col("doc_id").as("qid"), col("band"), col("key"))
          .join(bands(stored)
            .select(col("doc_id").as("sid"), col("band"), col("key")),
            Seq("band", "key"))
      } else {
        val qb = bands(q)
          .select(col("doc_id").as("qid"),
            pbCol(col("band"), col("key")).as("pb"), col("key"))
        // the pruning set: distinct pb values in the query batch —
        // collect is bounded by the pb DOMAIN (bands·bandBuckets),
        // a config constant, regardless of query or index size
        val pbs = qb.select("pb").distinct().collect().map(_.getInt(0))
        bandStore.all()
          .filter(col("pb").isin(pbs.map(Int.box).toSeq: _*))
          .select(col("doc_id").as("sid"), col("pb"), col("key"))
          .join(qb, Seq("pb", "key"))
      }
    val cands = candsRaw
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
