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
    * one filesystem listing, no Spark job. */
  def batchIds(): Seq[Long] =
    Fs.listNames(root, hconf)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)

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
    // subPartitionCols land as partition DIRECTORIES under the batch
    // dir (batch=i/<col>=v/...), so reads filtered on them prune at
    // the scan — the serving-index layout (see IncrementalIndex)
    df.write.mode("overwrite").partitionBy(subPartitionCols: _*)
      .parquet(s"$root/batch=$batchId")
    if (!Fs.exists(schemaPath, hconf)) {
      // full read-back schema = data columns + the dir-derived batch col
      val full = df.schema.add("batch", LongType, nullable = true)
      Fs.writeStringAtomic(schemaPath, full.json, hconf)
    }
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
