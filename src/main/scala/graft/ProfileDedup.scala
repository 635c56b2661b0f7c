package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/**
 * Diagnostic main: runs the dedup pipeline once at a given parallelism
 * and prints a per-job timing table — job wall time, task-time sum,
 * effective parallelism (taskTime/wall), and the DRIVER GAP before each
 * job (time since the previous job ended: pure driver planning /
 * analysis / collect-deserialise work that does not scale with cores).
 * The gaps plus low-parallelism jobs ARE the fixed floor F in the
 * t = F + W/cores scaling model (BASELINE.md) — this tool exists to
 * attribute F to specific stages so it can be engineered away.
 *
 * Usage: sbt "runMain graft.ProfileDedup [cores] [docs]"
 */
object ProfileDedup {

  final case class JobRec(id: Int, desc: String, submitted: Long,
                          var completed: Long = 0L,
                          var taskTimeMs: Long = 0L,
                          var gcMs: Long = 0L,
                          var tasks: Int = 0)

  final case class StageRec(id: Int, name: String,
                            var submitted: Long = 0L, var completed: Long = 0L,
                            var taskTimeMs: Long = 0L, var gcMs: Long = 0L,
                            var tasks: Int = 0)

  class Listener extends SparkListener {
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stages = mutable.LinkedHashMap.empty[Int, StageRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("callSite.short")))
        .getOrElse(e.stageInfos.lastOption.map(_.name).getOrElse("?"))
      jobs(e.jobId) = JobRec(e.jobId,
        (desc + " | " + e.stageInfos.map(_.name.takeWhile(_ != ' ')).distinct
          .mkString(",")).take(90), e.time)
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      e.stageInfos.foreach(si =>
        stages.getOrElseUpdate(si.stageId, StageRec(si.stageId, si.name.take(90))))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.completed = e.time)
    }
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
      val si = e.stageInfo
      val r = stages.getOrElseUpdate(si.stageId, StageRec(si.stageId, si.name.take(90)))
      r.submitted = si.submissionTime.getOrElse(System.currentTimeMillis())
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val si = e.stageInfo
      stages.get(si.stageId).foreach { r =>
        r.completed = si.completionTime.getOrElse(0L)
        if (r.submitted == 0L) r.submitted = si.submissionTime.getOrElse(0L)
      }
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      Option(e.taskMetrics).foreach { m =>
        stageToJob.get(e.stageId).flatMap(jobs.get).foreach { r =>
          r.taskTimeMs += m.executorRunTime; r.gcMs += m.jvmGCTime; r.tasks += 1
        }
        stages.get(e.stageId).foreach { r =>
          r.taskTimeMs += m.executorRunTime; r.gcMs += m.jvmGCTime; r.tasks += 1
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val docs = args.drop(1).headOption.map(_.toInt).getOrElse(60000)
    val partitions = args.drop(2).headOption.map(_.toInt).getOrElse(cores)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-profile-$cores")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.default.parallelism", partitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARFIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.sql.autoBroadcastJoinThreshold", (1 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
        val shm = new java.io.File("/dev/shm/graft-spark")
        if (shm.isDirectory || shm.mkdirs()) shm.getAbsolutePath
        else System.getProperty("java.io.tmpdir", "/tmp")
      }))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.functions._
    def corpus(n: Int) = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(concat(lit("doc://"), col("doc_id")).as("url"), col("text"))
      val (pages, _) = graft.data.SyntheticPages.generate(spark, n)
      pages.select(col("url"), col("text")).union(d)
    }

    // warmup (JIT + codegen cache), same shape as Bench
    val warm = corpus(2000).cache(); warm.count()
    DedupPipeline.run(warm, DedupConfig())
      .write.mode("overwrite").format("noop").save()
    warm.unpersist()

    val input = corpus(docs).cache()
    val n = input.count()
    val listener = new Listener
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    DedupPipeline.run(input, DedupConfig())
      .write.mode("overwrite").format("noop").save()
    val wallSec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // let the listener bus drain

    println(f"%n=== profile cores=$cores docs=$n wall=$wallSec%.2f s ===")
    println(f"${"job"}%4s ${"gap_ms"}%7s ${"wall_ms"}%8s ${"task_ms"}%9s " +
      f"${"par"}%5s ${"tasks"}%6s  desc")
    var prevEnd = 0L
    var totalGap = 0L; var totalWall = 0L; var totalTask = 0L
    listener.jobs.values.toSeq.sortBy(_.submitted).foreach { j =>
      val gap = if (prevEnd == 0) 0 else math.max(0, j.submitted - prevEnd)
      val wall = math.max(1, j.completed - j.submitted)
      val par = j.taskTimeMs.toDouble / wall
      println(f"${j.id}%4d ${gap}%7d ${wall}%8d ${j.taskTimeMs}%9d " +
        f"$par%5.1f ${j.tasks}%6d  ${j.desc}")
      prevEnd = math.max(prevEnd, j.completed)
      totalGap += gap; totalWall += wall; totalTask += j.taskTimeMs
    }
    val totalGc = listener.jobs.values.map(_.gcMs).sum
    println(f"njobs=${listener.jobs.size} sum_gap=${totalGap} ms " +
      f"sum_jobwall=${totalWall} ms sum_task=${totalTask} ms " +
      f"sum_gc=${totalGc} ms ideal_at_${cores}c=${totalTask / cores} ms")
    println(f"%n--- stages > 300 ms wall ---")
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%9s ${"gc_ms"}%7s " +
      f"${"par"}%5s ${"tasks"}%6s  name")
    listener.stages.values.toSeq.filter(s => s.completed - s.submitted > 300)
      .sortBy(-_.taskTimeMs).foreach { s =>
        val wall = s.completed - s.submitted
        println(f"${s.id}%6d ${wall}%8d ${s.taskTimeMs}%9d ${s.gcMs}%7d " +
          f"${s.taskTimeMs.toDouble / math.max(1, wall)}%5.1f ${s.tasks}%6d  ${s.name}")
      }
    spark.stop()
  }
}
