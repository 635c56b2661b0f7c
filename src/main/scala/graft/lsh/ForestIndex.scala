package graft.lsh

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.ckpt.Fs
import org.apache.spark.sql.functions._

/**
 * Mutable LSH-Forest index — the reference `Indexer` mutation surface
 * (Index/Search/Remove, `/root/reference/index.go:47-51`) for the
 * Forest variant (`/root/reference/lsh.go:244-265`), which round 2 left
 * batch-search-only. Backed by the shared [[graft.ckpt.BatchStore]]:
 * per-batch idempotent puts, single-writer lease, atomic
 * directory-swap removes through the Hadoop FS API.
 *
 * The row contract is signature-level — (id: long, sig: long 64-bit
 * SimHash) — because the forest indexes signatures; hashing text into
 * signatures is the pipeline's job (`DedupPipeline.applySignatures`),
 * exactly as the reference hashes before `ClassicLSH.Put`
 * (`lsh.go:75-80`).
 *
 * Storage layout (the serving shape): rows are stored PRE-ROTATED —
 * one row per (rotation, doc) with the rotated key — partitioned by
 * `tb = rot·2^prefixBits + top-prefixBits(k)`. Every prefix the search
 * expansion joins on is ≥ minPrefix ≥ prefixBits bits long, so a
 * corpus row can only match a query whose rotated key shares its top
 * prefixBits bits — i.e. whose `tb` the query batch itself contains.
 * A search therefore prunes the stored scan to the query batch's `tb`
 * partitions (PartitionFilters at the scan), the reference's
 * sub-linear radix-tree descent (`lsh.go:194-240`) re-expressed as
 * partition pruning; the pruning set is bounded by the fixed tb
 * domain (tables·2^prefixBits), never by the corpus.
 */
class ForestIndex(spark: SparkSession, path: String,
                  tables: Int = 4, step: Int = 8, minPrefix: Int = 16,
                  prefixBits: Int = 6) {
  require(prefixBits >= 1 && prefixBits <= minPrefix,
    s"prefixBits must be in [1, minPrefix=$minPrefix], got $prefixBits " +
      "(the partition prefix must be a prefix of every join prefix, or " +
      "pruning would drop true candidates)")
  require(tables >= 1 && 64 % tables == 0,
    s"tables must divide 64, got $tables — put() would stamp the value " +
      "into the immutable layout manifest and every later search() " +
      "would throw (LshForest's rotation spacing is 64/tables), leaving " +
      "the stored index a permanent dead end")

  private val store = new graft.ckpt.BatchStore(spark, s"$path/sigs",
    subPartitionCols = Seq("tb"))
  private val hconf = spark.sparkContext.hadoopConfiguration
  private def layoutPath = s"$path/layout.json"
  private var layoutChecked = false

  /** Pin/validate the STORED layout geometry. `tables` and
    * `prefixBits` are baked into every stored row (rotation spacing;
    * the tb partition encoding) — reopening an existing store with
    * different values would compute query tbs that almost never match
    * the stored partition values, so the pruning filter silently
    * drops true candidates (IvfIndex pins its geometry the same way
    * by persisting the codebook). The manifest is written by the
    * first mutation and validated by every later operation; a
    * mismatch fails loudly. Checked once per instance — the layout
    * never changes after creation. */
  private def ensureLayout(write: Boolean): Unit = if (!layoutChecked) {
    if (Fs.exists(layoutPath, hconf)) {
      val json = Fs.readString(layoutPath, hconf)
      def num(key: String) = (s""""$key":(-?\\d+)""").r
        .findFirstMatchIn(json).map(_.group(1).toInt)
      // a manifest missing its keys must FAIL, not default to the
      // current constructor values — defaulting makes the require
      // below trivially pass on an unparseable manifest, silently
      // serving mis-pruned searches: the exact failure the manifest
      // exists to make loud
      val tOpt = num("tables")
      val pbOpt = num("prefixBits")
      require(tOpt.isDefined && pbOpt.isDefined,
        s"ForestIndex layout manifest at $layoutPath is unreadable " +
          s"(missing tables/prefixBits keys): $json — refusing to " +
          "guess the stored geometry; restore the manifest, or delete " +
          "it (the next mutation re-stamps the constructor geometry) " +
          "only if that geometry is KNOWN to match the stored rows")
      val t = tOpt.get
      val pb = pbOpt.get
      require(t == tables && pb == prefixBits,
        s"ForestIndex at $path was built with tables=$t, prefixBits=" +
          s"$pb but reopened with tables=$tables, prefixBits=" +
          s"$prefixBits — stored rotation keys and tb partitions would " +
          "silently mismatch (pruned searches miss); reopen with the " +
          "original geometry or rebuild the index")
      layoutChecked = true
    } else if (write) {
      Fs.writeStringAtomic(layoutPath,
        s"""{"tables":$tables,"prefixBits":$prefixBits}""", hconf)
      layoutChecked = true
    }
    // read path on a manifest-less store (legacy or empty): nothing to
    // validate against — the first mutation stamps it
  }

  private def tbCol(rot: Column, k: Column): Column =
    (rot.cast("int") * (1 << prefixBits) +
      shiftrightunsigned(k, 64 - prefixBits).cast("int")).cast("int")

  // null ids fail LOUDLY on every path (DESIGN invariant 33): a null
  // id stored would be unaddressable by remove/identity resolution,
  // and a null query id never equi-joins — the query would silently
  // return zero matches. Per-row coalesce short-circuit, no extra job.
  private def normalize(sigs: DataFrame): DataFrame = {
    val idCol = if (sigs.columns.contains("id")) "id" else "qid"
    sigs.select(coalesce(col(idCol).cast("long"), raise_error(lit(
        "identity-less row: null id — ForestIndex rows and queries " +
          "are keyed by id")).cast("long")).as("id"),
      col("sig").cast("long").as("sig"))
  }

  private def rotRows(sigs: DataFrame): DataFrame =
    LshForest.rotated(normalize(sigs), "id", "sig", tables)
      .select(tbCol(col("rot"), col("k")).as("tb"),
        col("rot"), col("k"), col("id"), col("sig"))

  def isEmpty: Boolean = store.isEmpty

  /** A store written before the rotated serving layout (pinned schema
    * without rot/k/tb) cannot be served OR appended to — appending
    * would mix two incompatible row layouts in one store (the pinned
    * schema drops the new columns on read, so even the new rows would
    * be unusable). Fail loudly with the migration path instead of the
    * bare AnalysisException a missing column would raise mid-plan. */
  private def requireServingLayout(): Unit =
    if (!store.isEmpty && !store.all().columns.contains("rot"))
      throw new IllegalStateException(
        s"ForestIndex at $path predates the rotated serving layout " +
          "(pinned schema has no rot/k/tb columns) — rebuild it by " +
          "re-putting its (id, sig) rows into a fresh path")

  /** Append (id, sig) rows as a new batch (reference `Index(v, id)`);
    * the batch id is allocated and written under one writer-lease
    * claim. */
  def put(sigs: DataFrame): Unit = {
    if (sigs.isEmpty) return // no-op, same contract as the sibling indexes
    requireServingLayout()
    ensureLayout(write = true)
    store.append(rotRows(sigs)); ()
  }

  /** Idempotent per-batch insert (streaming replay safe). */
  def putBatch(sigs: DataFrame, batchId: Long): Unit = {
    if (sigs.isEmpty) return // no-op, same contract as the sibling indexes
    requireServingLayout()
    ensureLayout(write = true)
    store.writeBatch(rotRows(sigs), batchId)
  }

  /** Consolidate batches ≤ `upTo` into one directory, keeping every
    * rotation row of each id's newest batch (last-put-wins applied
    * while the batch order still exists). Replay-safety contract:
    * [[graft.ckpt.BatchStore.compact]]. */
  def compact(upTo: Long): Unit = {
    requireServingLayout()
    // a mutation like put/remove: validates (and on a legacy
    // manifest-less store, stamps) the geometry manifest — compacting
    // under a mismatched constructor geometry would otherwise proceed
    // silently while every other operation on the instance fails loudly
    ensureLayout(write = true)
    store.compact(upTo)(graft.ckpt.BatchStore.latestBatchRows(_, "id"))
  }

  /** Remove documents by id (reference `Remove(id)`, `index.go:119-136`):
    * anti-join rewrite into a temp dir, then an atomic swap. */
  def remove(ids: DataFrame): Unit = {
    requireServingLayout()
    ensureLayout(write = true)
    // a null (or cast-to-null) removal id matches nothing in the
    // anti-join — the remove would silently no-op (invariant 33)
    store.rewrite(_.join(ids.select(coalesce(col("id").cast("long"),
        raise_error(lit("identity-less remove: null id")).cast("long"))
        .as("id")),
      Seq("id"), "left_anti"))
  }

  /** The stored (id, sig, batch) rows — one per document (the rot=0
    * storage row carries the unrotated signature), resolved
    * last-put-wins: a re-put id appears ONCE with its newest
    * signature, the same identity rule probe()/search() serve — an
    * unresolved export would double-count documents and re-index the
    * superseded signature. */
  def all(): DataFrame = {
    requireServingLayout()
    graft.ckpt.BatchStore.latestBatchRows(
      store.all().filter(col("rot") === 0).select("id", "sig", "batch"),
      "id")
  }

  /** Top-k Hamming neighbours against the stored forest (reference
    * `Search`, `lsh.go:194-240` prefix expansion + `index.go:236-251`
    * ranking). `queries` carries an id column named `id` (or `qid` —
    * both accepted, mirroring put()'s (id, sig) row contract) and a
    * 64-bit signature column `sig`. The stored side reads only the
    * `tb` partitions the query batch touches.
    * Returns (query_id, neighbor_id, hamming, rank). */
  def search(queries: DataFrame, k: Int): DataFrame = {
    requireServingLayout()
    ensureLayout(write = false)
    // a never-written store has no schema manifest: the scan below
    // would throw an opaque parquet PATH_NOT_FOUND mid-search — an
    // empty index simply has no neighbours
    if (isEmpty)
      return spark.range(0).select(col("id").as("query_id"),
        col("id").as("neighbor_id"),
        lit(0).as("hamming"), lit(0).as("rank"))
    // pin the query frame before the driver collects the pruning set
    // from it: the stored-side tb filter and the search join both
    // re-evaluate it, and a nondeterministic caller frame (sample,
    // unordered limit) re-evaluated differently would probe tb
    // partitions the filter already excluded — silent misses
    // LAZY checkpoint + guarded materialisation (the CC-loop pattern):
    // an EAGER localCheckpoint whose own job fails mid-way (a null
    // query id's raise_error firing in one task) leaves the partitions
    // that completed persisted with no handle to free — each failing
    // micro-batch of a serving loop would accrete a pinned block set
    val nq = normalize(queries).localCheckpoint(eager = false)
    def freeing[A](body: => A): A =
      try body
      catch { case t: Throwable => graft.ckpt.Checkpoints.free(nq); throw t }
    freeing { nq.count(): Unit } // materialise under the guard
    // materialize the (top-k-sized) result so the query pin can be
    // freed eagerly (invariant 32: a per-micro-batch serving loop must
    // not accrete one pinned query block set per call until driver GC);
    // the siblings' search() paths materialize anyway for their
    // refit-stamp validation, so eagerness here also keeps the three
    // indexes' search semantics uniform
    val (plan, pins) =
      freeing { // prunedOf's collect can throw too
        LshForest.searchTopKRotatedPinned(prunedOf(nq),
          nq, "id", "sig", k, tables, step, minPrefix)
      }
    // same lazy+guard shape for the result snapshot: its blocks must be
    // freeable if ITS materialisation job dies (executor loss mid-
    // search), and it must materialise BEFORE the finally releases the
    // pins its lineage still reads
    val res = plan.localCheckpoint(eager = false)
    try { res.count(); res }
    catch { case t: Throwable => graft.ckpt.Checkpoints.free(res); throw t }
    finally (pins :+ nq).foreach(graft.ckpt.Checkpoints.free)
  }

  /** The stored rotated rows pruned to the `tb` partitions `queries`
    * touches — the frame [[search]] scans (package-visible so specs can
    * assert the PartitionFilters; the search result itself is
    * checkpoint-cut and no longer shows the file scan). */
  private[graft] def prunedStored(queries: DataFrame): DataFrame =
    prunedOf(normalize(queries).localCheckpoint(true))

  private def prunedOf(nq: DataFrame): DataFrame = {
    val qtb = LshForest.rotated(nq, "id", "sig", tables)
      .select(tbCol(col("rot"), col("k")).as("tb"))
    // pruning set: bounded by the tb DOMAIN (tables·2^prefixBits),
    // a constructor constant — never by query or index size
    val tbs = qtb.distinct().collect().map(_.getInt(0))
    // skip the predicate when the query batch touches every tb: it
    // prunes nothing and a full-domain IN costs optimizer time
    val pruned = (if (tbs.length < tables * (1 << prefixBits))
        store.all().filter(col("tb").isin(tbs.map(Int.box).toSeq: _*))
      else store.all())
    // last-batch-wins per stored id: a re-put id (updated signature,
    // reference contract `index.go:198-210`) holds rows in several
    // batches; serving both would rank one neighbor at MULTIPLE top-k
    // positions (two distinct sigs = two Hamming distances). The
    // resolver keeps every rotation row of the winning batch and runs
    // over the PRUNED rows only, never the full store. (A re-put whose
    // new signature landed outside the probed tb partitions still
    // serves its newest PROBED row — the documented read-side bound;
    // remove()+put() is the exact-replace path.)
    graft.ckpt.BatchStore.latestBatchRows(pruned, "id")
      .select(col("rot"), col("k"), col("id"), col("sig"))
  }
}
