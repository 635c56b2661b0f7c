package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * The shared foreachBatch body of [[StreamingDedup]] and
 * [[StreamingAnnIngest]] — one audited home for the ingest lifecycle
 * so the two surfaces cannot drift:
 *
 *  1. cache the micro-batch (it is read twice: the index write and the
 *     match search);
 *  2. PUT FIRST (batchId-keyed, so an at-least-once replay overwrites
 *     itself), THEN search the batch against the index: co-arriving
 *     near-duplicates — two dups landing in the SAME trigger — match
 *     each other through the store, where a search-before-put saw only
 *     older batches and the pair stayed silent FOREVER (neither doc is
 *     ever a query again). A doc's own stored row is excluded by the
 *     indexes' identity filter (qid =!= sid), and put-first also makes
 *     an `isEmpty` gate unnecessary: the very first batch's internal
 *     dups surface too;
 *  3. free the search snapshot once the callback returns (invariant
 *     32: a long-running stream must not accrete one match-sized block
 *     set per batch) — the frame is valid only WITHIN the callback;
 *     act on it there (write/collect), don't stash it lazily;
 *  4. unpersist the batch cache on every exit path.
 *
 * Replay note: a replayed batch re-puts idempotently and re-emits the
 * same matches — `onMatches` delivery stays at-least-once, the
 * foreachBatch contract.
 */
private[streaming] object IngestLifecycle {
  def run(batch: DataFrame, batchId: Long,
          put: (DataFrame, Long) => Unit,
          search: DataFrame => DataFrame,
          onMatches: DataFrame => Unit): Unit = {
    val b = batch.cache()
    try {
      put(b, batchId)
      val m = search(b)
      try onMatches(m) finally graft.ckpt.Checkpoints.free(m)
    } finally { b.unpersist(); () }
  }
}
