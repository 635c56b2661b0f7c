package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextKernel
import graft.tfidf.TfIdf
import graft.hash.HashFunctions
import graft.lsh.Lsh
import graft.verify.Measures
import graft.cluster.ConnectedComponents
import graft.substr.SuffixArrayStage
import graft.ckpt.{CheckpointStore, EphemeralStore}

/**
 * Pinned dedup configuration (FIXTURES.md §1): shingle w=5, MinHash 128
 * perms = 32 bands × 4 rows, SimHash 64 bits, Jaccard τ=0.8, Hamming
 * ≤3/64.
 */
case class DedupConfig(
  shingleW: Int = 5,
  minhashPerms: Int = 128,
  bands: Int = 32,
  rows: Int = 4,
  simhashTables: Int = 8,
  simhashBandBits: Int = 8,
  tau: Double = 0.8,
  maxHamming: Int = 3,
  maxBucket: Int = 64,
  chainWidth: Int = 3,
  numFeatures: Int = 1 << 18,
  substrMinRun: Int = 60,
  enableSubstr: Boolean = true,
  enableSimhashBands: Boolean = true,
  stopWords: Seq[String] = Nil) {
  require(minhashPerms == bands * rows,
    s"signature length $minhashPerms must equal bands*rows (${bands * rows}); " +
      "reference panics likewise, /root/reference/lsh.go:124-127")
}

/**
 * End-to-end near-duplicate detection + clustering pipeline (the north
 * rule): extract → shingle → TF-IDF → SimHash64 + MinHash128 → LSH band
 * join (salt-capped) → exact verify (Jaccard/Hamming) → connected
 * components [+ suffix-array substring pass] → (url, cluster).
 *
 * Scale shape (10^12 docs): the only corpus-sized shuffles are
 *  (1) exact-dup grouping on md5(norm_text),
 *  (2) the band-bucket exchange (the distributed LSH hash table),
 *  (3) tf-idf regroup.
 * Everything upstream is per-row codegen'd expression work; the verify
 * join and CC loop run on candidate pairs, which LSH keeps ≪ n².
 * Exact duplicates are collapsed to one representative *before* LSH, so
 * boilerplate mirror pages (the dominant web dup class) never reach the
 * band join.
 */
object DedupPipeline {

  /** Stage 1 — extraction/normalisation. Input must have (url, text).
    * Adds docId, tokens, norm, text_hash, shingles, n_tokens. */
  def extract(pages: DataFrame, cfg: DedupConfig): DataFrame = {
    val tokens = TextKernel.dropStopWords(
      TextKernel.tokenize(col("text")), cfg.stopWords)
    pages
      .withColumn("doc_id", xxhash64(col("url")))
      .withColumn("tokens", tokens)
      .withColumn("norm", TextKernel.normText(col("tokens")))
      .withColumn("text_hash", md5(col("norm")))
      .withColumn("shingles", array_distinct(
        TextKernel.shingles(col("tokens"), cfg.shingleW)))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Stage 2a — exact-dup edges + one representative per distinct text.
    * Returns (edges(a, b), reps). Reference has no exact stage; it falls
    * out of dedup-at-scale practice (identical pages collapse before any
    * signature work). */
  def exactDedup(extracted: DataFrame): (DataFrame, DataFrame) = {
    import extracted.sparkSession.implicits._
    val canon = extracted.groupBy("text_hash")
      .agg(min("doc_id").as("canon_id"))
    val withCanon = extracted.join(canon, Seq("text_hash"))
    val edges = withCanon.filter($"doc_id" =!= $"canon_id")
      .select($"canon_id".as("a"), $"doc_id".as("b"))
    val reps = withCanon.filter($"doc_id" === $"canon_id")
      .drop("canon_id")
    (edges, reps)
  }

  /** Stage 2b — signatures over representatives: MinHash128 over the
    * shingle set; SimHash64 over the tf-idf–weighted hashed term vector
    * (reference pipeline: TF-IDF → sign random projection,
    * `/root/reference/example_test.go:30-45` + `hashing.go:49-62`). */
  def signatures(reps: DataFrame, cfg: DedupConfig): DataFrame = {
    val withTf = reps.withColumn("tf",
      TfIdf.hashedTfEntries(col("tokens"), cfg.numFeatures))
    val n = withTf.count()
    val dfTable = withTf
      .select(explode(col("tf")).as("e"))
      .groupBy(col("e.term").as("term"))
      .agg(count(lit(1)).as("df"))
    val idfTable = TfIdf.idf(dfTable, n)
    val weighted = TfIdf.applyIdf(withTf, "doc_id", "tf", idfTable)
    weighted
      .withColumn("minhash", HashFunctions.minhash128(col("shingles")))
      .withColumn("simhash", HashFunctions.simhash64(col("tfidf")))
      .drop("tf", "tfidf")
  }

  /** Stage 3 — LSH candidate pairs over representatives. */
  def candidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val mh = Lsh.explodeBands(sigs, "doc_id",
      Lsh.minhashBandKeys(col("minhash"), cfg.bands, cfg.rows))
    val all =
      if (cfg.enableSimhashBands)
        mh.union(Lsh.explodeBands(sigs, "doc_id",
          Lsh.simhashBandKeys(col("simhash"), cfg.simhashTables, cfg.simhashBandBits)))
      else mh
    Lsh.candidatePairs(all, "doc_id", cfg.maxBucket, cfg.chainWidth)
  }

  /** Stage 4 — exact verification of candidate pairs
    * (`/root/reference/index.go:198-255` semantics: true-metric check on
    * retrieved candidates): Jaccard over shingle sets ≥ τ, OR Hamming
    * over SimHash ≤ maxHamming bits. */
  def verifyPairs(cands: DataFrame, sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    import cands.sparkSession.implicits._
    val side = sigs.select(col("doc_id"), col("shingles"), col("simhash"))
    val a = side.toDF("a", "sh_a", "sig_a")
    val b = side.toDF("b", "sh_b", "sig_b")
    cands.join(a, "a").join(b, "b")
      .withColumn("jaccard", Measures.jaccard($"sh_a", $"sh_b"))
      .withColumn("hamming", bit_count($"sig_a".bitwiseXOR($"sig_b")))
      .filter($"jaccard" >= cfg.tau || $"hamming" <= cfg.maxHamming)
      .select($"a", $"b", $"jaccard", $"hamming")
  }

  /** Full pipeline. Returns (url, doc_id, cluster) — cluster is the min
    * doc_id of the duplicate class (singletons map to themselves). */
  def run(pages: DataFrame, cfg: DedupConfig = DedupConfig(),
          store: CheckpointStore = new EphemeralStore): DataFrame = {
    import pages.sparkSession.implicits._
    val extracted = store.stage("extract") { extract(pages, cfg) }
    val (exactEdges0, reps0) = exactDedup(extracted)
    val exactEdges = store.stage("exact_edges", Seq("extract")) { exactEdges0 }
    val reps = store.stage("reps", Seq("extract")) { reps0 }
    val sigs = store.stage("signatures", Seq("reps")) { signatures(reps, cfg) }
    val cands = store.stage("candidates", Seq("signatures")) { candidates(sigs, cfg) }
    val verified = store.stage("verified", Seq("candidates", "signatures")) {
      verifyPairs(cands, sigs, cfg)
    }
    val substrEdges =
      if (cfg.enableSubstr)
        store.stage("substr_edges", Seq("reps")) {
          SuffixArrayStage.substringEdges(reps, "doc_id", "norm", cfg.substrMinRun)
        }
      else pages.sparkSession.emptyDataset[(Long, Long)].toDF("a", "b")
    val edges = exactEdges.select("a", "b")
      .union(verified.select("a", "b"))
      .union(substrEdges.select("a", "b"))
    val labels = store.stage("clusters",
      Seq("exact_edges", "verified", "substr_edges")) {
      ConnectedComponents.run(edges)
    }
    extracted.select($"url", $"doc_id")
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce($"comp", $"doc_id"))
      .select($"url", $"doc_id", $"cluster")
  }
}
