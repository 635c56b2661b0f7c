package graft.ckpt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/**
 * Partitioned-Parquet batch store shared by the mutable signature
 * indexes ([[graft.ops.IncrementalIndex]], [[graft.lsh.ForestIndex]]):
 * per-batch `batch=<id>` partition directories, idempotent per-batch
 * overwrite (streaming replay safe), atomic directory-swap rewrite for
 * deletes, all metadata through the Hadoop FS API ([[Fs]]).
 *
 * A schema manifest (`<root>.schema.json`, a SIBLING of the data dir so
 * the swap commit cannot delete it) is published on first write and
 * used for every read: a store whose rows were all removed has no
 * parquet footers left to infer a schema from — without the manifest,
 * `all()` after a remove-everything would throw instead of returning
 * an empty frame.
 *
 * Mutations are SINGLE-WRITER, enforced by a lease file
 * (`<root>.lock`, claimed with an exclusive create): `nextBatchId` is
 * list-and-max, so two unguarded concurrent writers would claim the
 * same id and the second overwrite silently clobbers the first. A
 * second writer now fails loudly instead. A lease whose file is older
 * than `leaseTtlMs` is presumed crashed and broken. Opening a store
 * first completes any swap commit a crashed writer left pending
 * ([[Fs.recoverSwap]]).
 */
final class BatchStore(spark: SparkSession, root: String,
                       leaseTtlMs: Long = 60L * 60 * 1000,
                       subPartitionCols: Seq[String] = Nil) {
  private val hconf = spark.sparkContext.hadoopConfiguration
  private def schemaPath = s"$root.schema.json"
  private def swapPath = s"$root.swap"
  private def lockPath = s"$root.lock"

  Fs.recoverSwap(swapPath, root, hconf)
  recoverBatchSwaps()

  /** Complete any per-batch swap a crashed writer left mid-commit
    * (leftover `.batch-<id>.tmp` staging dirs or `batch=<id>.old` aside
    * copies) — one directory listing, no Spark job. */
  private def recoverBatchSwaps(): Unit =
    Fs.listNames(root, hconf).foreach { n =>
      val leftover = "\\.batch-(\\d+)\\.(?:tmp|old)".r
      n match {
        case leftover(i) =>
          Fs.recoverSwap(s"$root/.batch-$i.tmp", s"$root/batch=$i",
            s"$root/.batch-$i.old", hconf)
        case _ => ()
      }
    }

  /** Run `f` holding the store's single-writer lease (loud failure if
    * another writer holds it; stale leases broken after the TTL). */
  def withLease[T](f: => T): T = {
    Fs.modifiedMs(lockPath, hconf).foreach { ts =>
      if (System.currentTimeMillis() - ts > leaseTtlMs)
        Fs.deleteIfExists(lockPath, hconf) // break a crashed writer's lease
    }
    if (!Fs.createExclusive(lockPath, System.currentTimeMillis().toString, hconf))
      throw new java.io.IOException(
        s"BatchStore at $root: another writer holds the lease ($lockPath) — " +
        s"concurrent mutation is single-writer by contract; a crashed " +
        s"holder's lease expires after ${leaseTtlMs / 1000} s")
    try f finally Fs.deleteIfExists(lockPath, hconf)
  }

  def isEmpty: Boolean = !Fs.exists(root, hconf)

  /** Ids of the batch partition directories currently in the store —
    * one filesystem listing, no Spark job. A committed batch dir is
    * COMPLETE by construction (batch writes stage + swap, below), so
    * presence in this listing means the batch is fully readable. */
  def batchIds(): Seq[Long] =
    Fs.listNames(root, hconf)
      .filter(_.matches("batch=\\d+")).map(_.stripPrefix("batch=").toLong)

  def nextBatchId(): Long = {
    val ids = batchIds()
    if (ids.isEmpty) 0L else ids.max + 1L
  }

  /** Allocate the next batch id and insert under ONE lease claim —
    * closes the id-allocation race two independent put() callers had.
    * `also` runs with the allocated id while the lease is still held,
    * for companion stores that must key on the same batch id (it may
    * claim OTHER stores' leases, never this one's — re-claiming the
    * same lease fails loudly by design). */
  def append(df: DataFrame, also: Long => Unit = _ => ()): Long = withLease {
    val id = nextBatchId()
    writeBatchUnguarded(df, id)
    also(id)
    id
  }

  /** Idempotent per-batch insert: writing batch `id` twice overwrites
    * the same partition directory instead of duplicating rows. */
  def writeBatch(df: DataFrame, batchId: Long): Unit =
    withLease(writeBatchUnguarded(df, batchId))

  private def writeBatchUnguarded(df: DataFrame, batchId: Long): Unit = {
    // stage + swap: the parquet lands in a dot-prefixed staging dir
    // (hidden from Spark's file listings) and is swap-committed into
    // `batch=<id>` — a crash mid-write can never leave a PARTIAL batch
    // dir that a read (or a batch-listing reconciler) would count as
    // complete; interrupted swaps are finished by [[recoverBatchSwaps]]
    // on the next open. subPartitionCols land as partition DIRECTORIES
    // under the batch dir (batch=i/<col>=v/...), so reads filtered on
    // them prune at the scan — the serving-index layout (see
    // IncrementalIndex).
    if (!Fs.exists(schemaPath, hconf)) {
      // full read-back schema = data columns + the dir-derived batch
      // col; published BEFORE any data can exist under root, so a store
      // root with only staging leftovers still reads as a schema-pinned
      // empty frame
      val full = df.schema.add("batch", LongType, nullable = true)
      Fs.writeStringAtomic(schemaPath, full.json, hconf)
    }
    val staging = s"$root/.batch-$batchId.tmp"
    Fs.deleteIfExists(staging, hconf)
    df.write.mode("overwrite").partitionBy(subPartitionCols: _*)
      .parquet(staging)
    // the aside is dot-prefixed (hidden) because it lives INSIDE the
    // read root — a visible `batch=<id>.old` would be picked up by
    // partition discovery during the swap window
    Fs.swapInto(staging, s"$root/batch=$batchId",
      s"$root/.batch-$batchId.old", hconf)
  }

  /** Every stored row (schema-pinned — works on an emptied store). */
  def all(): DataFrame =
    if (Fs.exists(schemaPath, hconf)) {
      val schema = DataType.fromJson(Fs.readString(schemaPath, hconf))
        .asInstanceOf[StructType]
      spark.read.schema(schema).parquet(root)
    } else spark.read.parquet(root)

  /** Atomic whole-store rewrite: `f(all())` lands in a temp dir, then a
    * directory swap commits — the read source is never the write
    * target, so cache eviction or a mid-write crash cannot destroy the
    * store. The `batch` partition column must survive `f`. */
  def rewrite(f: DataFrame => DataFrame): Unit = withLease {
    f(all()).write.mode("overwrite")
      .partitionBy(("batch" +: subPartitionCols): _*).parquet(swapPath)
    Fs.swapInto(swapPath, root, hconf)
  }
}
