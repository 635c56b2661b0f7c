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
 * pages is (1) matched against the signature index built so far (newly
 * arriving near-duplicates surface immediately) and (2) appended to the
 * index. The reference has no event-time semantics (its "streaming" is
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
        val b = batch.cache()
        try {
          if (!index.isEmpty) {
            // search() returns a materialized snapshot; free it once
            // the callback returns (invariant 32: a long-running stream
            // must not accrete one match-sized block set per batch).
            // The frame is therefore valid only WITHIN the callback —
            // act on it there (write/collect), don't stash it lazily.
            val m = index.search(b)
            try onMatches(m) finally graft.ckpt.Checkpoints.free(m)
          }
          index.putBatch(b, batchId)
        } finally b.unpersist()
        ()
      }
      .start()
  }
}
