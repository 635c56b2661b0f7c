package graft.dimred

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.hash.HashFunctions

/**
 * Random Indexing / Reflective Random Indexing (SURVEY §2.6 R4;
 * `/root/reference/randomprojection.go:183-341`).
 *
 * Semantics in doc-row layout (the reference matrix m is terms×docs;
 * `contextualise(m, V) = V·m`):
 *  - **Doc-based fit** (`Fit`, DocBasedRRI default, `:300-310`):
 *    elemental vectors are random sparse per-DOC vectors; the context
 *    vector of a term accumulates the elemental vectors of every doc it
 *    appears in, tf-weighted: context(t) = Σ_doc tf(t,doc)·e(doc).
 *    One explode + groupBy(term) pass — the elemental vectors are
 *    generated counter-based inside codegen, never materialised.
 *  - **Term-based fit** (TermBasedRRI, `:302-304`): the initial context
 *    table IS the elemental table of the terms themselves.
 *  - **Reflections** (`:306-309`): each cycle re-expresses docs in the
 *    current term space (d(doc) = Σ_t tf·context(t)) and then rebuilds
 *    term vectors from the doc vectors (context(t) = Σ_doc tf·d(doc)) —
 *    two join+groupBy passes per cycle, the same shape as the CC loop,
 *    localCheckpoint per cycle to truncate lineage.
 *  - **Transform** (`:330-341`): doc vector = tf-weighted sum of its
 *    terms' context vectors = [[DimRed.project]].
 *  - **PartialFit** (`:248-270`): online accretion — a new batch's
 *    term contributions are summed into the stored components
 *    (CSR.Add in the reference; union + groupBy-sum re-aggregation
 *    here). Batch-order independent by construction (addition
 *    commutes), which the reference's streaming contract relies on.
 */
object RandomIndexing {

  final case class RiConfig(k: Int = 256, density: Double = 0.02,
                            reflections: Int = 0, termBased: Boolean = false)

  /** Fitted model: (term, vec[k]) context-vector table. */
  final case class RiModel(components: DataFrame, cfg: RiConfig) {
    def transform(docs: DataFrame, docIdCol: String, entriesCol: String): DataFrame =
      DimRed.project(docs, docIdCol, entriesCol, components, cfg.k)

    /** Online accretion of a new mini-batch (`PartialFit`,
      * `randomprojection.go:248-270`): always plain (non-reflective)
      * Random Indexing, as the reference documents. */
    def partialFit(batch: DataFrame, docIdCol: String, entriesCol: String): RiModel = {
      val contribs = termContribs(batch, docIdCol, entriesCol, cfg)
      // per-slot sums (DimRed.sumSlots): term-keyed groups are unbounded
      // (frequent terms ~ every doc), so a collect_list buffer is
      // O(docFreq·k) in one aggregation buffer
      val merged = components.select(col("term"), col("vec").as("contrib"))
        .union(contribs.select(col("term"), col("vec").as("contrib")))
        .groupBy("term")
        .agg(DimRed.sumSlots("contrib", cfg.k).as("vec"))
      // localCheckpoint per accretion: the streaming PartialFit
      // contract calls this once per micro-batch, and an untruncated
      // chain re-analyzes and recomputes a batch-deep union on every
      // action (the fit() reflection loop cuts its lineage every cycle
      // for the same reason). Superseded components' blocks are
      // reclaimed by the ContextCleaner when the old model's reference
      // drops — they cannot be freed eagerly here because the caller
      // may still hold (and serve from) the previous RiModel.
      RiModel(merged.localCheckpoint(), cfg)
    }
  }

  /** Doc-based term contributions: Σ_doc tf(t,doc)·e(doc), elemental
    * vectors generated inside whole-stage codegen. */
  private def termContribs(docs: DataFrame, docIdCol: String,
                           entriesCol: String, cfg: RiConfig): DataFrame =
    docs.select(col(docIdCol).as("__doc"), explode(col(entriesCol)).as("e"))
      .select(col("e.term").as("term"),
        HashFunctions.elementalScaled(col("__doc"),
          col("e.weight").cast("double"), cfg.k, cfg.density)
          .as("contrib"))
      .groupBy("term")
      .agg(DimRed.sumSlots("contrib", cfg.k).as("vec"))

  def fit(docs: DataFrame, docIdCol: String, entriesCol: String,
          cfg: RiConfig = RiConfig()): RiModel = {
    var comps: DataFrame =
      if (cfg.termBased)
        docs.select(explode(col(entriesCol)).as("e"))
          .select(col("e.term").as("term")).distinct()
          .select(col("term"),
            HashFunctions.elementalScaled(col("term"), lit(1.0),
              cfg.k, cfg.density).as("vec"))
      else termContribs(docs, docIdCol, entriesCol, cfg)

    var cycle = 0
    var prevCkpt: DataFrame = null
    while (cycle < cfg.reflections) {
      comps = comps.localCheckpoint() // truncate the per-cycle join lineage
      // the eager checkpoint above just read (and thereby retired) the
      // previous cycle's snapshot — free it now; unpersist is a no-op
      // on checkpointed frames and ContextCleaner waits for driver GC,
      // so without this every reflection pins another term-table-sized
      // block set (same leak class as the Lda/CC iteration state). The
      // FINAL checkpoint is never freed: the returned model's lazy
      // components plan reads from it.
      if (prevCkpt != null) graft.ckpt.Checkpoints.free(prevCkpt)
      prevCkpt = comps
      // docs in current term space
      val docVecs = DimRed.project(docs, docIdCol, entriesCol, comps, cfg.k)
        .withColumnRenamed("proj", "dvec")
      // terms rebuilt from doc vectors (tf-weighted)
      comps = docs.select(col(docIdCol), explode(col(entriesCol)).as("e"))
        .join(docVecs, docIdCol)
        .select(col("e.term").as("term"),
          transform(col("dvec"),
            v => v * col("e.weight").cast("double")).as("contrib"))
        .groupBy("term")
        .agg(DimRed.sumSlots("contrib", cfg.k).as("vec"))
      cycle += 1
    }
    RiModel(comps.persist(StorageLevel.MEMORY_AND_DISK), cfg)
  }

  def fitTransform(docs: DataFrame, docIdCol: String, entriesCol: String,
                   cfg: RiConfig = RiConfig()): (RiModel, DataFrame) = {
    val m = fit(docs, docIdCol, entriesCol, cfg)
    (m, m.transform(docs, docIdCol, entriesCol))
  }
}
