package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.IvfIndex

/**
 * Streaming embedding ingestion — [[StreamingDedup]]'s shape for the
 * vector side of the house: each micro-batch of (id, vec) rows is
 * (1) searched against the IVF index built so far (an arriving
 * embedding's near-duplicates surface immediately) and (2) appended.
 * foreachBatch delivery is AT-LEAST-ONCE on failure/replay; the index
 * write is effectively exactly-once because `putBatch` keys on the
 * batchId (a replayed batch overwrites its own `batch=<id>` partition
 * instead of duplicating rows — cell assignment is a pure function of
 * the persisted codebook, so the replay is bit-identical).
 *
 * The codebook is fitted on the FIRST micro-batch, which on a stream
 * is one trigger's worth of traffic — usually far fewer rows than a
 * production `nCells`. The index clamps the first fit to the batch
 * size (probe clamps nProbe to the book), and `autoRefitGrowth`
 * defaults ON here (4×, unlike the batch-index default of off) so the
 * book grows back toward `nCells` as the stream accretes — without it
 * the first second of traffic would pin cell geometry forever.
 *
 * Scale shape: per micro-batch cost is O(batch) probe work plus a
 * cell-pruned join against only the probed partitions of the stored
 * index — never a full scan or recompute; refits amortise
 * geometrically across the stream's lifetime.
 */
object StreamingAnnIngest {

  /**
   * Start the ingestion query.
   * @param vecStream streaming DataFrame with (id, vec)
   * @param indexPath IVF index location
   * @param k         neighbours per query surfaced to `onMatches`
   * @param onMatches callback per micro-batch with the new rows'
   *                  neighbours (query_id, neighbor_id, rank)
   */
  def start(spark: SparkSession, vecStream: DataFrame, indexPath: String,
            k: Int = 1, nCells: Int = 256, nProbe: Int = 8,
            autoRefitGrowth: Double = 4.0,
            checkpointLocation: Option[String] = None,
            onMatches: DataFrame => Unit = _ => ())
  : StreamingQuery = {
    val index = new IvfIndex(spark, indexPath, nCells = nCells,
      nProbe = nProbe, autoRefitGrowth = autoRefitGrowth)
    val w0 = vecStream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
    checkpointLocation.fold(w0)(w0.option("checkpointLocation", _))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.cache()
        try {
          if (!index.isEmpty) {
            // search() returns a materialized snapshot; free it once
            // the callback returns (invariant 32: a long-running stream
            // must not accrete one match-sized block set per batch).
            // The frame is therefore valid only WITHIN the callback —
            // act on it there (write/collect), don't stash it lazily.
            val m = index.search(b, k)
            try onMatches(m) finally graft.ckpt.Checkpoints.free(m)
          }
          index.putBatch(b, batchId)
        } finally b.unpersist()
        ()
      }
      .start()
  }
}
