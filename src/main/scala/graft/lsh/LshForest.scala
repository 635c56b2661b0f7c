package graft.lsh

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * LSH Forest prefix expansion (SURVEY §2.4 H5;
 * `/root/reference/lsh.go:157-279`, after Bawa et al. '05).
 *
 * The reference keeps one radix tree per table, keyed by the bit-string
 * of the signature under that table's rotation; a search takes the
 * candidates sharing the longest prefix with the query and, while fewer
 * than k are found, *shortens* the prefix (`WalkPrefix` over
 * progressively shorter prefixes, `lsh.go:194-240`).
 *
 * Spark re-expression: an exact-prefix bucket IS an equi-join key —
 * `prefix_L(sig) = sig >>> (64−L)` — so prefix expansion becomes a
 * SHORT ITERATIVE SEQUENCE OF EQUI-JOINS over decreasing prefix
 * lengths, one shuffle each, with queries dropping out of later rounds
 * as soon as a round has satisfied their candidate quota. No tree is
 * materialised; the shuffle on (rotation, prefix) is the radix level,
 * exactly as the band shuffle is the hash table in ClassicLSH. All
 * rotations ride the same exchange (the simhashNeighborEdges pattern).
 *
 * Distance semantics match the reference's approx mode: candidates are
 * ranked by Hamming distance over the signatures themselves
 * (`index.go:236-251`), ties by neighbor id, top-k per query.
 */
object LshForest {

  /** Per-doc (rot, prefix-key) rows for every rotation — the "trees".
    * private[lsh]: [[ForestIndex]] persists these rows as its storage
    * layout (partitioned by rotation + key prefix) so searches prune
    * the stored scan. */
  private[lsh] def rotated(df: DataFrame, idCol: String, sigCol: String,
                           tables: Int): DataFrame = {
    val rotKeys = array((0 until tables).map { t =>
      val rot = t * (64 / tables)
      val key =
        if (rot == 0) col(sigCol)
        else shiftleft(col(sigCol), rot)
          .bitwiseOR(shiftrightunsigned(col(sigCol), 64 - rot))
      struct(lit(t).as("rot"), key.as("k"))
    }: _*)
    df.select(col(idCol).cast("long").as("id"), col(sigCol).as("sig"),
        explode(rotKeys).as("rk"))
      .select(col("rk.rot").as("rot"), col("rk.k").as("k"),
        col("id"), col("sig"))
  }

  /**
   * Batch top-k search.
   * @param index   (idCol, sigCol) corpus signatures
   * @param queries (qidCol, sigCol) query signatures
   * @param k       neighbours per query
   * @param tables  rotations (trees)
   * @param step    bits removed from the prefix per expansion round
   * @param minPrefix shortest prefix tried (stops the expansion; the
   *        reference walks to the tree root — prefix 0 = full scan —
   *        which is exactly the degenerate case a scale design must cap)
   * @return (query_id, neighbor_id, hamming, rank), rank ≤ k
   */
  def searchTopK(index: DataFrame, idCol: String, queries: DataFrame,
                 qidCol: String, sigCol: String, k: Int,
                 tables: Int = 4, step: Int = 8,
                 minPrefix: Int = 16): DataFrame =
    searchTopKRotated(rotated(index, idCol, sigCol, tables), queries,
      qidCol, sigCol, k, tables, step, minPrefix)

  /** [[searchTopK]] over an ALREADY-ROTATED corpus
    * (rot, k, id, sig rows, as produced by [[rotated]]) — the entry
    * point for [[ForestIndex]], whose storage layout is these rows
    * pre-exploded and partition-pruned before the call. */
  private[lsh] def searchTopKRotated(corpusRot: DataFrame,
                 queries: DataFrame,
                 qidCol: String, sigCol: String, k: Int,
                 tables: Int, step: Int,
                 minPrefix: Int): DataFrame =
    searchTopKRotatedPinned(corpusRot, queries, qidCol, sigCol, k,
      tables, step, minPrefix)._1

  /** ([[searchTopKRotated]] frame, the per-round expansion snapshots it
    * references) — the pins may be freed once the frame is materialized
    * (invariant 32: a serving loop must not leave one block set per
    * expansion round to driver GC). Lazy callers ([[searchTopK]]) keep
    * the pins alive through the frame's lineage instead. */
  private[lsh] def searchTopKRotatedPinned(corpusRot: DataFrame,
                 queries: DataFrame,
                 qidCol: String, sigCol: String, k: Int,
                 tables: Int, step: Int,
                 minPrefix: Int): (DataFrame, Seq[DataFrame]) = {
    val pins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // minPrefix ≤ 64 guarantees ≥1 expansion round (found is never null
    // at the ranking step); the rest are plain domain checks
    require(minPrefix >= 1 && minPrefix <= 64,
      s"minPrefix must be in [1, 64], got $minPrefix")
    require(step >= 1, s"step must be >= 1, got $step")
    require(k >= 1 && tables >= 1 && 64 % tables == 0,
      s"need k>=1, tables>=1 dividing 64; got k=$k tables=$tables")
    val spark = corpusRot.sparkSession
    import spark.implicits._
    val corpus = corpusRot.select(col("rot"), col("k"), col("id"), col("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pending0 = rotated(queries, qidCol, sigCol, tables)
      .select(col("rot"), col("k"), col("id").as("qid"), col("sig").as("qsig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var pending = pending0

    // `found` accumulates each query's candidate set exactly ONCE — at
    // the round the query LEAVES the expansion (quota met, or the final
    // round). Prefix shortening is monotone: a (query, doc) pair whose
    // keys share a p-bit prefix shares every shorter prefix too, so a
    // still-pending query's current-round candidates are a SUPERSET of
    // everything earlier rounds found for it. The earlier accumulator
    // (union + global distinct of the whole history each round)
    // re-shuffled all previously-found candidates once per round —
    // O(rounds × |found|) exchange volume for rows the superset
    // property already guaranteed; the disjoint-by-qid unions here need
    // no distinct at all.
    var found: DataFrame = null
    var prefixLen = 64
    // a mid-expansion failure (lost executor dropping checkpoint
    // blocks, join OOM) must not orphan the snapshots created so far:
    // the local pins buffer would be discarded with the exception and
    // a retrying serving loop would accrete block sets per failed
    // attempt — free everything this call created, then rethrow
    try {
    while (prefixLen >= minPrefix && pending != null) {
      val shift = 64 - prefixLen
      def pfx(c: Column) = shiftrightunsigned(c, shift)
      // equi-join on (rot, prefix) = one radix level of every tree
      val level = corpus.select(col("rot").as("c_rot"), pfx(col("k")).as("p"),
        col("id"), col("sig"))
      // localCheckpoint: cands is read by the quota count, the done
      // semi-join AND the final ranking — without a lineage cut each
      // reader re-executes the expansion join (the CC-loop lesson).
      // LAZY (materialised by the first consumer's job) so the
      // freeable handle is in `pins` BEFORE any job can fail: an
      // eager checkpoint's own materialisation failing halfway
      // leaves a registered, partially persisted RDD with no
      // reference to free (the CC-loop failure-path lesson).
      val cands = pending
        .join(level,
          pending("rot") === level("c_rot") && pfx(pending("k")) === level("p"))
        .select(col("qid"), col("qsig"), col("id"), col("sig"))
        .filter(col("qid") =!= col("id"))
        .distinct()
        .localCheckpoint(eager = false)
      pins += cands
      // cands checkpoints feed the returned frame — they ride back to
      // the caller as pins, freeable once the result is materialized;
      // superseded PENDING snapshots are dead the moment the next one
      // lands and are freed eagerly below.
      if (prefixLen - step >= minPrefix) {
        // queries whose candidate quota is met leave the expansion,
        // carrying this round's (maximal-so-far) candidate set
        val counts = cands.groupBy(col("qid").as("done_qid"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= k)
        val done = cands.join(counts,
          cands("qid") === counts("done_qid"), "left_semi")
        found = if (found == null) done else found.union(done)
        // lazy like cands: materialised by the isEmpty probe below,
        // with the handle already in scope to free on that job failing
        val next = pending
          .join(counts, pending("qid") === counts("done_qid"), "left_anti")
          .localCheckpoint(eager = false)
        // cheap emptiness probe bounds the loop (log-rounds, not data).
        // An EMPTY next (every query met its quota — the common dense-
        // corpus exit) is dead on arrival: free it here or it outlives
        // the search as an orphaned block set.
        val nextEmpty =
          try next.isEmpty
          catch { case t: Throwable => graft.ckpt.Checkpoints.free(next); throw t }
        if (pending ne pending0) graft.ckpt.Checkpoints.free(pending)
        if (nextEmpty) { graft.ckpt.Checkpoints.free(next); pending = null }
        else pending = next
      } else {
        // final round: every still-pending query finalizes here. The
        // lazy cands must MATERIALISE before its input snapshot is
        // freed — a truncated-lineage checkpoint cannot recompute —
        // so run the count an eager checkpoint would have (a failure
        // is covered: cands is already in pins, freed by the catch)
        cands.count()
        found = if (found == null) cands else found.union(cands)
        if (pending ne pending0) graft.ckpt.Checkpoints.free(pending)
        pending = null
      }
      prefixLen -= step
    }
    pending0.unpersist(blocking = false)
    corpus.unpersist()

    val w = Window.partitionBy("qid")
      .orderBy(col("hamming"), col("id"))
    (found
      .withColumn("hamming",
        bit_count(col("qsig").bitwiseXOR(col("sig"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        col("hamming"), col("rank")), pins.toSeq)
    } catch { case t: Throwable =>
      pins.foreach(graft.ckpt.Checkpoints.free)
      if (pending != null && (pending ne pending0))
        graft.ckpt.Checkpoints.free(pending)
      // cleanup must not mask the root cause: unpersist talks to the
      // cache manager, which throws while the context is tearing down
      // (Checkpoints.free guards itself the same way)
      try {
        pending0.unpersist(blocking = false)
        corpus.unpersist(blocking = false)
      } catch { case scala.util.control.NonFatal(_) => () }
      throw t
    }
  }
}
