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
  // Manku et al. '07 scheme: 4 bands × 16 bits over the 64-bit simhash;
  // pigeonhole guarantees any pair at Hamming ≤ 3 shares ≥1 exact band.
  // 8-bit bands would random-collide (n/256 docs per bucket) and blow up
  // candidate volume quadratically — measured 187k pairs on a 3.8k corpus.
  simhashTables: Int = 4,
  simhashBandBits: Int = 16,
  tau: Double = 0.8,
  maxHamming: Int = 3,
  maxBucket: Int = 64,
  chainWidth: Int = 3,
  numFeatures: Int = 1 << 18,
  substrMinRun: Int = 60,
  enableSubstr: Boolean = true,
  enableSimhashBands: Boolean = true,
  // df-conditioned shingling: shingles appearing in more than
  // max(hotShingleMinDf, hotShingleDfFrac·reps) documents are excluded
  // from MinHash banding (NOT from verification). Boilerplate shared by
  // k pages would otherwise produce O(k²) false candidate pairs —
  // measured 6.2M candidates (98% false) on a 341k corpus with a 5%
  // boilerplate block.
  hotShingleMinDf: Int = 8,
  hotShingleDfFrac: Double = 0.001,
  hotShingleCap: Int = 1 << 20,
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
      TextKernel.tokenize(coalesce(col("text"), lit(""))), cfg.stopWords)
    pages
      .withColumn("doc_id", xxhash64(col("url")))
      .withColumn("tokens", tokens)
      .withColumn("norm", TextKernel.normText(col("tokens")))
      .withColumn("text_hash", md5(col("norm")))
      .withColumn("shingles",
        HashFunctions.hashedShingles(col("tokens"), cfg.shingleW))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Stage 2a — exact-dup edges + one representative per distinct text.
    * Returns (edges(a, b), reps). Reference has no exact stage; it falls
    * out of dedup-at-scale practice (identical pages collapse before any
    * signature work). */
  def exactDedup(extracted: DataFrame): (DataFrame, DataFrame) = {
    import extracted.sparkSession.implicits._
    // one shuffle: window min over the hash group replaces the
    // groupBy + join round-trip (same exchange serves both outputs)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("text_hash")
    val withCanon = extracted.withColumn("canon_id", min("doc_id").over(w))
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
    // repartition by CPU: upstream AQE coalesces the (tiny-bytes) exact-
    // dedup shuffle to few partitions, which would serialise the CPU-
    // heavy signature computation — bytes are not proportional to CPU
    // here, so parallelism is declared explicitly.
    val spark = reps.sparkSession
    val withTf = reps
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("tf",
        HashFunctions.hashedTf(col("tokens"), cfg.numFeatures))

    // df aggregation with a sentinel term (-1) folded in per doc, so ONE
    // corpus pass yields both df(t) and n (= df(-1)); the result is a
    // bounded dim table (≤ numFeatures rows) collected into a dense idf
    // array and shipped as a reference object — the reference's "never
    // materialise the diagonal" IDF trick (`weightings.go:58`),
    // replacing an explode → join → regroup (2 corpus shuffles).
    val dfRows = withTf
      .select(explode(concat(col("tf"),
        array(struct(lit(-1L).as("term"), lit(1).as("cnt"))))).as("e"))
      .groupBy(col("e.term").as("term"))
      .agg(count(lit(1)).as("df"))
      .collect()
    var n = 0L
    dfRows.foreach { r => if (r.getLong(0) == -1L) n = r.getLong(1) }
    // sparse sorted (term, idf) arrays — vocab-sized, not numFeatures-sized
    val sorted = dfRows.filter(_.getLong(0) >= 0).sortBy(_.getLong(0))
    val idfTerms = sorted.map(_.getLong(0))
    val idfVals = sorted.map(r => math.log((1.0 + n) / (1.0 + r.getLong(1))))

    // hot ("stop") shingles: df above threshold → excluded from banding.
    // Bounded dim collect: only rows over the threshold come back.
    val dfThreshold = math.max(cfg.hotShingleMinDf,
      (cfg.hotShingleDfFrac * n).toLong)
    val hotRows = withTf
      .select(explode(col("shingles")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfThreshold)
      .orderBy(col("df").desc)
      .limit(cfg.hotShingleCap)
      .select("sh").collect().map(_.getLong(0)).sorted
    if (hotRows.length >= cfg.hotShingleCap)
      System.err.println( // no silent caps: dropped volume must be visible
        s"[graft] hot-shingle drop list capped at ${cfg.hotShingleCap} entries")
    val bandShingles =
      if (hotRows.isEmpty) col("shingles")
      else HashFunctions.filterNotIn(col("shingles"), hotRows)

    withTf
      .withColumn("minhash", HashFunctions.minhash128(bandShingles))
      .withColumn("simhash",
        HashFunctions.simhash64idf(col("tf"), idfTerms, idfVals))
      .drop("tf")
  }

  /** Stage 3 — LSH candidate pairs over representatives. */
  def candidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    // chain-order key: first minhash permutation value — equal for
    // identical signatures, close for high-Jaccard docs, and a cheap
    // codegen'd element_at (hashing the whole 128-slot array per
    // exploded row measured 16 s on a 27k corpus)
    val mh = Lsh.explodeBands(sigs, "doc_id",
      Lsh.minhashBandKeys(col("minhash"), cfg.bands, cfg.rows),
      element_at(col("minhash"), 1))
    val mhPairs = Lsh.candidatePairs(mh, "doc_id", cfg.maxBucket, cfg.chainWidth)
    if (cfg.enableSimhashBands) {
      // SimHash path: sorted-neighborhood over rotations (Manku '07) —
      // fixed-width band keys saturate quadratically with corpus size
      val shPairs = Lsh.simhashNeighborPairs(
        sigs, "doc_id", "simhash", cfg.simhashTables, cfg.chainWidth)
      mhPairs.union(shPairs).distinct()
    } else mhPairs
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
    // the doc_id joins shuffle both sides (sigs exceed the broadcast
    // threshold at any real scale); their exchanges set the parallelism
    // of the per-pair set-intersection work
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
    // shared subtrees are consumed 2-3× downstream (verify joins sigs on
    // both sides; reps feed signatures AND the substring pass). With a
    // parquet store each stage is materialised on disk; in the ephemeral
    // path persist() plays that role — without it Spark re-executes the
    // whole upstream DAG per consumer.
    def shared(df: DataFrame): DataFrame = store match {
      case _: EphemeralStore =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case _ => df
    }
    val extracted = shared(store.stage("extract") { extract(pages, cfg) })
    val (exactEdges0, reps0) = exactDedup(extracted)
    val exactEdges = store.stage("exact_edges", Seq("extract")) { exactEdges0 }
    val reps = shared(store.stage("reps", Seq("extract")) { reps0 })
    // slim to what downstream stages read: banding needs the signatures,
    // verify needs shingles — carrying text/tokens/norm through the
    // exchanges would multiply shuffle volume for nothing
    val sigs = shared(store.stage("signatures", Seq("reps")) {
      signatures(reps, cfg)
        .select(col("doc_id"), col("minhash"), col("simhash"), col("shingles"))
    })
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
    val edgesAll = exactEdges.select("a", "b")
      .union(verified.select("a", "b"))
      .union(substrEdges.select("a", "b"))
    // materialise the edge list once: CC consumes it multiple times
    // (count, iterate/union-find) and the final join replays the labels
    // — without a cut here the whole candidate DAG re-executes per
    // consumer (measured 3-4× full recomputes per run)
    val edges = store match {
      case _: EphemeralStore => edgesAll.localCheckpoint()
      case _ => store.stage("edges",
        Seq("exact_edges", "verified", "substr_edges")) { edgesAll }
    }
    val labels = store.stage("clusters", Seq("edges")) {
      ConnectedComponents.run(edges)
    }
    extracted.select($"url", $"doc_id")
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce($"comp", $"doc_id"))
      .select($"url", $"doc_id", $"cluster")
  }
}
