package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/**
 * IVF serving-index benchmark (round-4 verdict item #8): builds a
 * mutable [[graft.ops.IvfIndex]] at ~10^6 vectors and measures search
 * wall time AND scanned input bytes vs `nProbe`, with the stored-scan
 * partition pruning ON and OFF — the wall-time cash-out of the
 * PartitionFilters evidence in EXPLAIN_r4. Results are recorded in
 * BASELINE.md. Prints one JSON line.
 *
 * Bytes are the scan operators' own `filesSize` metric — the total
 * size of the files each stored-side scan SELECTED after partition
 * pruning (task-level `inputMetrics.bytesRead` proved unreliable on
 * the local filesystem: a measured full 130 MB vec scan reported
 * 2 MB). `files` is the matching post-pruning file count.
 */
object BenchIvf {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors.min(32))
    val nVecs = sys.env.get("SPARK_GRAFT_IVF_DOCS").map(_.toInt)
      .getOrElse(1000000)
    val dim = 32
    val nCells = 256
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-ivf")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plain (non-adaptive) executed plans so the scan metrics are
      // collectible by a simple tree walk
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
        val shm = new java.io.File("/dev/shm/graft-spark")
        if (shm.isDirectory || shm.mkdirs()) shm.getAbsolutePath
        else System.getProperty("java.io.tmpdir", "/tmp")
      }))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-bench-ivf")
      .toString

    // ---- build: 4 batches of nVecs/4 (the mutable-put path) ----
    val t0 = System.nanoTime()
    val idx = new graft.ops.IvfIndex(spark, s"$base/ivf",
      nCells = nCells, nProbe = 8)
    val per = nVecs / 4
    (0 until 4).foreach { b =>
      idx.put(spark.range(b.toLong * per, (b + 1).toLong * per, 1,
          spark.sparkContext.defaultParallelism)
        .as[Long]
        .map(i => (i, graft.data.SyntheticVectors.vectorOf(i, dim).toSeq))
        .toDF("id", "vec"))
    }
    val buildSec = (System.nanoTime() - t0) / 1e9

    val queries = spark.range(0, 32).as[Long]
      .map(i => (1000000000L + i,
        graft.data.SyntheticVectors.vectorOf(i * 31 + 7, dim).toSeq))
      .toDF("id", "vec")
      .localCheckpoint(true)

    def scanStats(plan: SparkPlan): (Long, Long) = {
      val scans = plan.collect {
        case s: FileSourceScanExec =>
          (s.metrics.get("filesSize").map(_.value).getOrElse(0L),
            s.metrics.get("numFiles").map(_.value).getOrElse(0L))
      }
      (scans.map(_._1).sum, scans.map(_._2).sum)
    }

    def measure(nProbe: Int, prune: Boolean): (Double, Long, Long, Long) = {
      val ix = new graft.ops.IvfIndex(spark, s"$base/ivf",
        nCells = nCells, nProbe = nProbe, pruneScan = prune)
      // cold plan over the stored files each time. The LAZY frame, not
      // search(): search() snapshot-validates by cutting the plan at a
      // localCheckpoint, so its executedPlan is a LogicalRDD with NO
      // FileSourceScanExec — scanStats over it reads 0 bytes/0 files
      // at every probe level and the pruned-vs-unpruned bytes evidence
      // (this benchmark's whole point) silently vanishes. searchPlan
      // executes the identical scan+join; the only production delta is
      // the stamp check around it.
      val t = System.nanoTime()
      val (df, pin) = ix.searchPlanPinned(queries, 10)
      val n = df.collect().length.toLong
      val sec = (System.nanoTime() - t) / 1e9
      val (b, f) = scanStats(df.queryExecution.executedPlan)
      // the plan is spent (collected + scanned for metrics): release
      // its query pin so 17 measure() calls don't accrete 17 block sets
      graft.ckpt.Checkpoints.free(pin)
      (sec, b, f, n)
    }

    val probes = sys.env.get("SPARK_GRAFT_IVF_PROBES")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(1, 4, 16, 64))
    // warmup: the first large-candidate search pays codegen/JIT and the
    // build's GC residue (measured 55 s first vs 7-10 s settled at the
    // same nProbe); min-of-2 per point absorbs window noise after it
    measure(probes.max, prune = true)
    def minOf2(p: Int, prune: Boolean) = {
      val a = measure(p, prune); val b = measure(p, prune)
      if (a._1 <= b._1) a else b
    }
    val pruned = probes.map(p => p -> minOf2(p, prune = true))
    val full = probes.map(p => p -> minOf2(p, prune = false))

    def fmt(rs: Seq[(Int, (Double, Long, Long, Long))]) =
      rs.map { case (p, (s, b, f, n)) =>
        s""""$p":{"sec":${"%.2f".format(s)},"scan_mb":${b / (1 << 20)},""" +
        s""""files":$f,"rows":$n}"""
      }.mkString("{", ",", "}")

    println(
      s"""{"metric":"ivf_serving","vectors":$nVecs,"dim":$dim,""" +
      s""""cells":$nCells,"queries":32,"k":10,""" +
      s""""build_sec":${"%.1f".format(buildSec)},""" +
      s""""pruned":${fmt(pruned)},"unpruned":${fmt(full)}}""")
    System.out.flush()
    spark.stop()
    sys.exit(0)
  }
}
