package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * The shared foreachBatch body of [[StreamingDedup]] and
 * [[StreamingAnnIngest]] — one audited home for the ingest lifecycle
 * so the two surfaces cannot drift:
 *
 *  1. cache the micro-batch (it is read twice: the index write and the
 *     match search);
 *  2. SKIP EMPTY BATCHES — foreachBatch delivers them (a restart from
 *     a checkpoint whose uncommitted data aged out of the source, a
 *     trigger with no new rows), and an empty FIRST batch would
 *     otherwise run the indexes' first-put model fit on zero rows:
 *     the IVF side crashes the query (codebook fit over an empty
 *     sample), and the dedup side permanently publishes degenerate
 *     corpus stats (n = 0, empty idf — every later document signed
 *     with all-zero weights, forever, with no signal). An empty batch
 *     has nothing to put and nothing to search, so the skip is a
 *     semantic no-op (replay of an empty batch skips again);
 *  3. PUT FIRST (batchId-keyed, so an at-least-once replay overwrites
 *     itself), THEN search the batch against the index: co-arriving
 *     near-duplicates — two dups landing in the SAME trigger — match
 *     each other through the store, where a search-before-put saw only
 *     older batches and the pair stayed silent FOREVER (neither doc is
 *     ever a query again). A doc's own stored row is excluded by the
 *     indexes' identity filter (qid =!= sid), so the very first
 *     (non-empty) batch's internal dups surface too;
 *  4. free the search snapshot once the callback returns (invariant
 *     32: a long-running stream must not accrete one match-sized block
 *     set per batch) — the frame is valid only WITHIN the callback;
 *     act on it there (write/collect), don't stash it lazily;
 *  5. unpersist the batch cache on every exit path.
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
      if (b.isEmpty) return // point 2: nothing to put, nothing to search
      put(b, batchId)
      val m = search(b)
      try onMatches(m) finally graft.ckpt.Checkpoints.free(m)
    } finally { b.unpersist(); () }
  }
}
