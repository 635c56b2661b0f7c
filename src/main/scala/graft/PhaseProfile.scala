package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Diagnostic main: times each dedup pipeline phase in isolation
 * (persist + count barriers between phases) to attribute wall time and
 * find unstable phases. Not part of the driver contract.
 *
 * Usage: sbt "runMain graft.PhaseProfile [cores] [docs]"
 */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val docs = args.drop(1).headOption.map(_.toInt).getOrElse(60000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-phase-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.default.parallelism", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
        val shm = new java.io.File("/dev/shm/graft-spark")
        if (shm.isDirectory || shm.mkdirs()) shm.getAbsolutePath
        else System.getProperty("java.io.tmpdir", "/tmp")
      }))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat(lit("doc://"), col("doc_id")).as("url"), col("text"))
    val (pages, _) = graft.data.SyntheticPages.generate(spark, docs)
    val input = pages.select(col("url"), col("text")).union(d)
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"docs=${input.count()}")

    val cfg = DedupConfig()
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val extracted = phase("extract") {
      val e = DedupPipeline.extract(input, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    val reps = phase("exact_reps") {
      val (_, r) = DedupPipeline.exactDedup(extracted)
      val rp = r.persist(StorageLevel.MEMORY_AND_DISK); rp.count(); rp
    }
    val tfd = phase("tf") {
      val t = DedupPipeline.withTf(reps, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    val stats = phase("fit_stats") { DedupPipeline.fitCorpusStats(tfd, cfg) }
    val sigs = phase("signatures") {
      val s = DedupPipeline.applySignatures(tfd, stats, cfg)
        .select(col("doc_id"), col("minhash"), col("simhash"), col("shingles"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val cands = phase("candidates") {
      val c = DedupPipeline.candidates(sigs, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  n_cands=${c.count()}")
      c
    }
    val verified = phase("verify") {
      val v = DedupPipeline.verifyPairs(cands, sigs, cfg,
          broadcastMembers = true) // profile fixture scale, measured small
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  n_verified=${v.count()}")
      v
    }
    val shEdges = phase("simhash_edges") {
      val e = DedupPipeline.simhashEdges(sigs, cfg)
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  n_simhash_edges=${e.count()}")
      e
    }
    // substring phase split into its own sub-phases
    val k = math.max(8, cfg.substrMinRun / 2)
    val window = math.max(1, cfg.substrMinRun - k + 1)
    val base = reps.select(col("doc_id"), col("norm").as("__text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    base.count()
    val substrCands = phase("substr_cands") {
      val buckets = base.select(col("doc_id"), explode(
          graft.hash.HashFunctions.winnow(col("__text"), k, window)).as("key"))
        .withColumn("band", lit(2000))
      val c = graft.lsh.Lsh.candidatePairs(
        buckets.select("doc_id", "band", "key"), "doc_id", cfg.maxBucket, cfg.chainWidth)
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  n_substr_cands=${c.count()}")
      c
    }
    phase("substr_stats") {
      val lens = base.select(col("doc_id"), length(col("__text")).as("len"))
      val joined = substrCands.join(lens.toDF("a", "la"), "a")
        .join(lens.toDF("b", "lb"), "b")
      val r = joined.agg(count(lit(1)), sum(col("la") + col("lb")),
        max(col("la") + col("lb"))).head()
      println(s"  pairs=${r.getLong(0)} sum_chars=${r.get(1)} max_pair_chars=${r.get(2)}")
    }
    val substrEdges = phase("substr_verify") {
      import spark.implicits._
      val ta = base.toDF("a", "ta")
      val tb = base.toDF("b", "tb")
      val e = substrCands.join(ta, "a").join(tb, "b")
        .select(col("a"), col("b"), col("ta"), col("tb"))
        .repartition(spark.sparkContext.defaultParallelism * 2)
        .as[(Long, Long, String, String)]
        .flatMap { case (a, b, sa, sb) =>
          if (graft.substr.SuffixArrayStage.hasCommonRun(sa, sb, cfg.substrMinRun))
            Iterator((a, b)) else Iterator.empty }
        .toDF("a", "b").persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  n_substr_edges=${e.count()}")
      e
    }
    val edges = phase("edges_union") {
      val (exactEdges, _) = DedupPipeline.exactDedup(extracted)
      val all = exactEdges.select("a", "b")
        .union(verified.select("a", "b"))
        .union(shEdges.select("a", "b"))
        .union(substrEdges.select("a", "b"))
        .localCheckpoint()
      println(s"  n_edges=${all.count()}")
      all
    }
    val labels = phase("cc") {
      val l = graft.cluster.ConnectedComponents.run(edges); l.count(); l
    }
    phase("final_join") {
      import spark.implicits._
      extracted.select($"url", $"doc_id")
        .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("cluster", coalesce($"comp", $"doc_id"))
        .select($"url", $"doc_id", $"cluster")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
