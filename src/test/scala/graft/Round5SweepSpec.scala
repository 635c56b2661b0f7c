package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lda.{Lda, LdaConfig, LdaModel}
import graft.dimred.{DimRed, PCA, TruncatedSVD}

/** Round-5 final-sweep contracts over the older (round-2/3) model
  * packages, re-reviewed under the round-5 lens:
  *  - LDA transform CONTINUES the theta learning-rate clock from the
  *    fit (`lda.go:420-431` burns in with the live rhoThetaT = 1 +
  *    iterations executed, `lda.go:183,502` — restarting at 1 re-runs
  *    the burn-in with the large early-fit steps and drifts the
  *    posteriors of every fitted model);
  *  - PCA.fit refuses < 2 documents instead of returning a silent
  *    all-NaN model (the n−1 Bessel divisor);
  *  - the randomized SVD clamps k by the DOC count like the exact path
  *    (rank(ZᵀZ) ≤ n — unclamped trailing components are arbitrary
  *    null-space rotations);
  *  - DimRed.project keeps its zero-vector semantics for empty-entry
  *    and all-OOV docs under the per-slot-sum aggregation that replaced
  *    the O(groupRows·k) collect_list buffer.
  */
class Round5SweepSpec extends AnyFunSuite with SparkSpec {

  private def entriesDf(rows: Seq[(Long, Seq[(Long, Double)])]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "raw").select(col("doc_id"),
      transform(col("raw"), e => struct(
        e.getField("_1").as("term"),
        e.getField("_2").as("weight"))).as("entries"))
  }

  /** Two planted topic blocks over a 12-term vocab, 20 docs. */
  private def ldaCorpus: DataFrame = entriesDf((0L until 20L).map { d =>
    val base = (d % 2) * 6L
    d -> (0 until 4).map(i => (base + (d + i) % 6, 1.0 + (d + i) % 3))
  })

  test("LDA transform continues the theta clock from the fit " +
    "(lda.go:420-431): itersRun is consumed, and a rebuilt model with " +
    "the same itersRun transforms identically") {
    val cfg = LdaConfig(k = 2, vocab = 12, iterations = 12,
      transformationPasses = 8, seed = 7)
    val m = Lda.fit(ldaCorpus, "doc_id", "entries", cfg)
    assert(m.itersRun === 12)
    def thetas(model: LdaModel): Map[Long, Seq[Double]] =
      model.transform(ldaCorpus, "doc_id", "entries").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val fitted = thetas(m)
    // same statistics, same itersRun → bit-identical posteriors
    val rebuilt = thetas(new LdaModel(m.nPhi, m.nZ, m.cfg, m.itersRun))
    assert(fitted === rebuilt,
      "itersRun plus the stats fully determine transform")
    // same statistics, clock restarted at 0 → the early-schedule steps
    // (rho(2) ≈ 7× rho(14) at the defaults) move the burn-in differently;
    // if this were equal, the clock would be dead state again
    val restarted = thetas(new LdaModel(m.nPhi, m.nZ, m.cfg, 0))
    assert(fitted !== restarted,
      "a restarted clock must not reproduce the fitted model's " +
        "posteriors — transform no longer consumes itersRun")
  }

  test("PCA.fit fails loudly on fewer than 2 documents instead of " +
    "returning an all-NaN model") {
    val one = entriesDf(Seq(0L -> Seq((0L, 1.0), (1L, 2.0))))
    val e = intercept[IllegalArgumentException] {
      PCA.fit(one, "doc_id", "entries", d = 3, k = 2)
    }
    assert(e.getMessage.contains("at least 2 documents"))
  }

  test("randomized SVD clamps k by the doc count (rank(ZᵀZ) <= n): " +
    "3 docs cannot yield 8 components") {
    val docs = entriesDf(Seq(
      0L -> Seq((0L, 1.0), (1L, 2.0), (5L, 1.0)),
      1L -> Seq((2L, 3.0), (3L, 1.0)),
      2L -> Seq((0L, 2.0), (4L, 1.0), (6L, 2.0))))
    val m = TruncatedSVD.fitRandomized(docs, "doc_id", "entries", k = 8)
    assert(m.k === 3, s"expected k clamped to the 3 docs, got ${m.k}")
    assert(m.scales.length === 3)
    assert(m.components.head().getSeq[Double](1).length === 3)
  }

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-r5s-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("a whole-store rewrite stamps its commit time onto the root: " +
    "rename preserves the staging dir's own older mtime, and without " +
    "the stamp rowCount's staleness gate reads a committed swap as " +
    "'nothing mutated' and persists pre-rewrite counts as complete") {
    import spark.implicits._
    import graft.ckpt.Fs
    val root = s"${freshDir()}/store"
    val st = new graft.ckpt.BatchStore(spark, root)
    st.writeBatch(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), 0L)
    assert(st.rowCount() === 3L)
    Thread.sleep(15) // separate the pre-rewrite clock from the commit stamp
    val t0 = System.currentTimeMillis()
    Thread.sleep(15)
    st.rewrite(df => df.filter(col("id") =!= 2L))
    val m = Fs.modifiedMs(root, hconf)
    assert(m.exists(_ > t0),
      s"root mtime $m must postdate the rewrite started after $t0 — a " +
        "swap serving the staging dir's write-time mtime is exactly the " +
        "race that persisted stale row counts")
    assert(st.rowCount() === 2L)
  }

  test("CountVectorise -> VocabEncode composes: the encoder resolves " +
    "the entry value field (cnt vs weight) from the schema instead of " +
    "failing analysis on a hardcoded 'weight'") {
    import spark.implicits._
    import graft.pipeline._
    import graft.text.TextKernel
    val docs = Seq((0L, "red fox red"), (1L, "blue fox"))
      .toDF("doc_id", "text")
      .withColumn("tokens", TextKernel.tokenize(col("text")))
    val (_, out) = new Pipeline(
      CountVectorise("tokens"),
      VocabEncode("doc_id", "entries")).fitTransform(docs)
    val enc = out.select(col("doc_id"), col("encoded")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => e.getLong(0) -> e.getDouble(1)).toMap).toMap
    // counts survive as the weights; term ids are dense 0..2
    assert(enc(0L).values.toSeq.sorted === Seq(1.0, 2.0))
    assert(enc(1L).values.toSeq.sorted === Seq(1.0, 1.0))
    val allTerms = enc.values.flatMap(_.keys).toSet
    assert(allTerms === Set(0L, 1L, 2L))
    // the weight-shaped input still works unchanged
    val weighted = new Pipeline(
      CountVectorise("tokens"),
      TfIdfStage("doc_id", "entries"),
      VocabEncode("doc_id", "tfidf")).fitTransform(docs)._2
    assert(weighted.select("encoded").count() === 2L)
  }

  test("project under per-slot sums: empty-entry and all-OOV docs still " +
    "get the zero vector (the reference's Components^T·m yields a zero " +
    "column, dimreduction.go:50-57)") {
    import spark.implicits._
    val comps = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("term", "vec")
    val docs = entriesDf(Seq(
      0L -> Seq((0L, 2.0), (1L, 3.0)), // in-vocab
      1L -> Seq.empty,                 // empty entries
      2L -> Seq((9L, 4.0))))           // all OOV
    val out = DimRed.project(docs, "doc_id", "entries", comps, 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(0L) === Seq(2.0, 3.0))
    assert(out(1L) === Seq(0.0, 0.0))
    assert(out(2L) === Seq(0.0, 0.0))
  }

  test("connected components frees its snapshots on the NonConvergence " +
    "path (invariant 32): a caller that catches and keeps the session " +
    "is not left with this call's edge/label pins") {
    import spark.implicits._
    val path = (0 until 40).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[graft.cluster.ConnectedComponents.NonConvergence] {
      graft.cluster.ConnectedComponents
        .run(path, maxIter = 1, smallGraphThreshold = 0L)
    }
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty,
      s"non-convergent CC run retained ${added.size} block sets: " +
        added.map(spark.sparkContext.getPersistentRDDs(_).toString)
          .mkString("; "))
  }
}
