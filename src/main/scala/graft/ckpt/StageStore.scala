package graft.ckpt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Checkpoint / resume store (SURVEY §2.1 S2, §7.4).
 *
 * Emulates Iceberg snapshot-commit semantics on plain Parquet (no
 * Iceberg jars in this zero-egress image): a stage is *committed* only
 * when its JSON manifest exists, and the manifest is published with an
 * atomic rename — a killed job can never leave a half-visible stage. A
 * re-run `stage(...)` call reads the committed data and skips the
 * compute entirely, which is the resume path of the north rule. The
 * trait is narrow so a real Iceberg catalog is a drop-in replacement.
 *
 * All filesystem metadata goes through the Hadoop FS resolved from the
 * root path ([[Fs]]) — the store works on `file:`, HDFS and
 * S3-compatible URIs, in the same namespace the parquet payloads land.
 *
 * Manifests carry per-stage lineage (input stage names) and
 * per-partition metrics (file count/bytes from the filesystem — no
 * extra Spark pass).
 */
trait CheckpointStore {
  /** Run `compute` unless `name` is already committed; returns the
    * committed DataFrame either way. */
  def stage(name: String, inputs: Seq[String] = Nil)(compute: => DataFrame): DataFrame
  def isCommitted(name: String): Boolean
  /** Invalidate a stage and everything that lists it as input. */
  def invalidate(name: String): Unit
}

/** No-op store: always recomputes, never writes. */
class EphemeralStore extends CheckpointStore {
  def stage(name: String, inputs: Seq[String])(compute: => DataFrame): DataFrame = compute
  def isCommitted(name: String): Boolean = false
  def invalidate(name: String): Unit = ()
}

class ParquetStageStore(spark: SparkSession, root: String) extends CheckpointStore {
  private val hconf = spark.sparkContext.hadoopConfiguration
  private def dir(name: String): String = s"$root/$name"
  private def manifest(name: String): String = s"$root/$name.manifest.json"

  def isCommitted(name: String): Boolean = Fs.exists(manifest(name), hconf)

  def stage(name: String, inputs: Seq[String] = Nil)(compute: => DataFrame): DataFrame = {
    if (isCommitted(name)) {
      spark.read.parquet(dir(name))
    } else {
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(dir(name))
      val wallMs = (System.nanoTime() - t0) / 1000000
      commit(name, inputs, wallMs)
      spark.read.parquet(dir(name))
    }
  }

  private def commit(name: String, inputs: Seq[String], wallMs: Long): Unit = {
    val parts = Fs.listFiles(dir(name), hconf)
      .filter(_._1.endsWith(".parquet"))
    val partStats = parts
      .map { case (fn, sz) => s"""{"file":"$fn","bytes":$sz}""" }
      .mkString(",")
    val json =
      s"""{"stage":"$name","committedAtMs":${System.currentTimeMillis()},
         |"wallMs":$wallMs,"files":${parts.size},"bytes":${parts.map(_._2).sum},
         |"inputs":[${inputs.map("\"" + _ + "\"").mkString(",")}],
         |"partitions":[$partStats]}""".stripMargin.replace("\n", "")
    // Iceberg-style atomic publish: write temp, rename into place
    Fs.writeStringAtomic(manifest(name), json, hconf)
  }

  def invalidate(name: String): Unit = {
    // cascade: any committed stage listing `name` as an input is stale too
    val work = scala.collection.mutable.Queue(name)
    val done = scala.collection.mutable.Set.empty[String]
    while (work.nonEmpty) {
      val cur = work.dequeue()
      if (done.add(cur)) {
        Fs.deleteIfExists(manifest(cur), hconf)
        Fs.listNames(root, hconf)
          .filter(_.endsWith(".manifest.json"))
          .foreach { fn =>
            val p = s"$root/$fn"
            if (Fs.exists(p, hconf)) {
              val body = Fs.readString(p, hconf)
              // match INSIDE the inputs array only: the manifest tail
              // after "inputs": also carries the partitions array,
              // whose quoted JSON keys ("file", "bytes") and part-file
              // names would make a stage named like one of them a
              // spurious dependent of EVERY manifest — invalidate()
              // would then cascade-delete the whole committed store
              val tag = "\"inputs\":["
              val start = body.indexOf(tag)
              val end = if (start < 0) -1
                        else body.indexOf(']', start + tag.length)
              if (start >= 0 && end > start &&
                  body.substring(start + tag.length, end)
                    .contains("\"" + cur + "\""))
                work += fn.stripSuffix(".manifest.json")
            }
          }
      }
    }
  }
}
