package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.DedupConfig
import graft.ops.IncrementalIndex

/**
 * Streaming ingestion (SURVEY §1.1 "streaming"): the reference's
 * `PartialFit` mini-batch accretion
 * (`/root/reference/randomprojection.go:253-270`, `vectorisers.go:22-25`)
 * maps to Structured Streaming `foreachBatch` — each micro-batch of new
 * pages is (1) appended to the index and (2) matched against it —
 * put-first, so near-duplicates that arrive in the SAME trigger match
 * each other immediately (a doc's own stored row is excluded by
 * identity; see [[IngestLifecycle]] for the full ordering argument).
 * The reference has no event-time semantics (its "streaming" is
 * state accretion only), so no watermarking is required. foreachBatch
 * delivery is AT-LEAST-ONCE on failure/replay; the index write is made
 * effectively exactly-once by keying each insert on the batchId
 * (`putBatch` overwrites its own `batch=<id>` partition, so a replayed
 * batch replaces itself instead of duplicating rows).
 *
 * Scale shape: per micro-batch cost is O(batch) signature work plus a
 * band-key join against the stored index — never a full recompute.
 */
object StreamingDedup {

  /**
   * Start the ingestion query.
   * @param pagesStream streaming DataFrame with (url, text)
   * @param indexPath   signature-index location
   * @param onMatches   callback per micro-batch with the new-dup matches
   *                    (query_url, match_url, jaccard)
   * @param checkpointLocation Structured Streaming checkpoint dir — set
   *                    it in production: a killed query restarted from
   *                    the checkpoint replays only uncommitted batches,
   *                    and the batchId-keyed index write makes the
   *                    replay overwrite itself instead of duplicating
   *                    (spec'd under kill/restart in Round5StreamingSpec)
   */
  def start(spark: SparkSession, pagesStream: DataFrame, indexPath: String,
            cfg: DedupConfig = DedupConfig(),
            checkpointLocation: Option[String] = None,
            onMatches: DataFrame => Unit = _ => ())
  : StreamingQuery = {
    val index = new IncrementalIndex(spark, indexPath, cfg)
    val w0 = pagesStream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
    checkpointLocation.fold(w0)(w0.option("checkpointLocation", _))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestLifecycle.run(batch, batchId,
          put = index.putBatch, search = index.search(_), onMatches)
      }
      .start()
  }
}
