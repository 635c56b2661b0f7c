package graft

/**
 * Optimization-round helper main (guide §1.4): times each declared query
 * in isolation with the noop sink (min over N passes in one warmed
 * session) and optionally dumps `.explain("formatted")` per query.
 * NOT part of the driver contract — Bench.scala remains the measured
 * artifact; this exists so per-query iteration doesn't pay the full
 * bench's dedup levels.
 *
 * Usage: sbt "runMain graft.BenchExtra [passes] [queryName ...]"
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as Bench;
 *      SPARK_GRAFT_EXPLAIN_DIR=plans/r06 dumps <query>.txt explains.
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors.min(32))
    val parts = math.max(cpus, 330000 / 100000)
    val spark = Bench.session(cpus, parts)
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    explainDir.foreach(d => new java.io.File(d).mkdirs())
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => names.isEmpty || names.contains(q._1))
    // SPARK_GRAFT_JOBLOG=1: per-job wall attribution (job id, duration,
    // first-stage name) — the fixture-scale queries are job-floor-bound
    // and this shows which serial action owns the floor
    if (sys.env.get("SPARK_GRAFT_JOBLOG").contains("1")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, (System.nanoTime(),
              j.stageInfos.headOption.map(_.name.take(60)).getOrElse("?")))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(j.jobId)
            if (s != null) System.err.println(
              f"[joblog] job=${j.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%6.3f s  ${s._2}")
          }
        })
    }
    // warmup identical to Bench's
    try {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .groupBy("lang").count()
        .write.mode("overwrite").format("noop").save()
      SparkEntry.queries.get("q1_agg")
        .foreach(fn => fn(spark, sfDir)
          .write.mode("overwrite").format("noop").save())
    } catch { case _: Throwable => () }
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val all = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    (1 to passes).foreach { p =>
      qs.foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"$name pass $p")
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          df.write.mode("overwrite").format("noop").save()
          val sec = (System.nanoTime() - t0) / 1e9
          all(name) = all.getOrElse(name, Nil) :+ sec
          if (best.getOrElse(name, Double.MaxValue) > sec) best(name) = sec
          if (p == 1) explainDir.foreach { d =>
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$d/$name.txt"),
              txt.getBytes("UTF-8"))
          }
        } catch {
          case e: Throwable =>
            System.err.println(s"[benchextra] $name FAILED: ${e.getMessage}")
            best(name) = -1.0
        } finally SparkEntry.releaseCaches(spark)
      }
      System.err.println(s"[benchextra] pass $p done")
    }
    val js = best.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""$k":${"%.3f".format(v)}""" }.mkString("{", ",", "}")
    val samples = all.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""$k":[${v.map("%.3f".format(_)).mkString(",")}]""" }
      .mkString("{", ",", "}")
    println(s"""{"queries_min":$js,"samples":$samples,"sf":"$sfDir","total_min":${
      "%.2f".format(best.values.filter(_ >= 0).sum)}}""")
    spark.stop()
    sys.exit(0)
  }
}
