package graft.lsh

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Mutable LSH-Forest index — the reference `Indexer` mutation surface
 * (Index/Search/Remove, `/root/reference/index.go:47-51`) for the
 * Forest variant (`/root/reference/lsh.go:244-265`), which round 2 left
 * batch-search-only. Backed by the same storage pattern as
 * [[graft.ops.IncrementalIndex]]: a per-batch partitioned Parquet
 * signature table, idempotent per-batch puts, and an atomic
 * directory-swap remove through the Hadoop FS API.
 *
 * The row contract is signature-level — (id: long, sig: long 64-bit
 * SimHash) — because the forest indexes signatures; hashing text into
 * signatures is the pipeline's job (`DedupPipeline.applySignatures`),
 * exactly as the reference hashes before `ClassicLSH.Put`
 * (`lsh.go:75-80`).
 *
 * Scale shape: a put touches only the new batch; a search reads the
 * stored table once per expansion round via [[LshForest.searchTopK]]'s
 * log-round prefix equi-joins; remove rewrites into a temp dir and
 * swaps (the read source is never the write target).
 */
class ForestIndex(spark: SparkSession, path: String,
                  tables: Int = 4, step: Int = 8, minPrefix: Int = 16) {

  // shared batch store (same machinery as IncrementalIndex): per-batch
  // idempotent puts, schema-pinned reads, swap-commit rewrites
  private val store = new graft.ckpt.BatchStore(spark, s"$path/sigs")

  def isEmpty: Boolean = store.isEmpty

  /** Append (id, sig) rows as a new batch (reference `Index(v, id)`);
    * the batch id is allocated and written under one writer-lease
    * claim. */
  def put(sigs: DataFrame): Unit = {
    store.append(
      sigs.select(col("id").cast("long").as("id"),
        col("sig").cast("long").as("sig")))
    ()
  }

  /** Idempotent per-batch insert (streaming replay safe). */
  def putBatch(sigs: DataFrame, batchId: Long): Unit =
    store.writeBatch(
      sigs.select(col("id").cast("long").as("id"),
        col("sig").cast("long").as("sig")),
      batchId)

  /** Remove documents by id (reference `Remove(id)`, `index.go:119-136`):
    * anti-join rewrite into a temp dir, then an atomic swap. */
  def remove(ids: DataFrame): Unit =
    store.rewrite(_.join(ids.select(col("id").cast("long").as("id")),
      Seq("id"), "left_anti"))

  def all(): DataFrame = store.all()

  /** Top-k Hamming neighbours against the stored forest (reference
    * `Search`, `lsh.go:194-240` prefix expansion + `index.go:236-251`
    * ranking). `queries` carries an id column named `id` (or `qid` —
    * both accepted, mirroring put()'s (id, sig) row contract) and a
    * 64-bit signature column `sig`.
    * Returns (query_id, neighbor_id, hamming, rank). */
  def search(queries: DataFrame, k: Int): DataFrame = {
    val idCol = if (queries.columns.contains("id")) "id" else "qid"
    LshForest.searchTopK(all(), "id",
      queries.select(col(idCol).cast("long").as("id"),
        col("sig").cast("long").as("sig")),
      "id", "sig", k, tables, step, minPrefix)
  }
}
