package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.IvfIndex

/**
 * Streaming embedding ingestion — [[StreamingDedup]]'s shape for the
 * vector side of the house: each micro-batch of (id, vec) rows is
 * (1) appended to the IVF index and (2) searched against it —
 * put-first, so embeddings arriving in the SAME trigger surface as
 * each other's neighbours (self excluded by id; see
 * [[IngestLifecycle]] for the ordering argument).
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
        IngestLifecycle.run(batch, batchId,
          put = index.putBatch, search = index.search(_, k), onMatches)
      }
      .start()
  }
}
