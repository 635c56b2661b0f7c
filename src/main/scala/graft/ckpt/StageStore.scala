package graft.ckpt

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
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
  private def dir(name: String): Path = Paths.get(root, name)
  private def manifest(name: String): Path = Paths.get(root, s"$name.manifest.json")

  def isCommitted(name: String): Boolean = Files.exists(manifest(name))

  def stage(name: String, inputs: Seq[String] = Nil)(compute: => DataFrame): DataFrame = {
    if (isCommitted(name)) {
      spark.read.parquet(dir(name).toString)
    } else {
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(dir(name).toString)
      val wallMs = (System.nanoTime() - t0) / 1000000
      commit(name, inputs, wallMs)
      spark.read.parquet(dir(name).toString)
    }
  }

  private def commit(name: String, inputs: Seq[String], wallMs: Long): Unit = {
    val d = dir(name)
    val parts = Files.list(d).iterator()
    var files = 0L; var bytes = 0L
    val partStats = new StringBuilder
    while (parts.hasNext) {
      val p = parts.next()
      if (p.getFileName.toString.endsWith(".parquet")) {
        if (files > 0) partStats.append(",")
        partStats.append(s"""{"file":"${p.getFileName}","bytes":${Files.size(p)}}""")
        files += 1; bytes += Files.size(p)
      }
    }
    val json =
      s"""{"stage":"$name","committedAtMs":${System.currentTimeMillis()},
         |"wallMs":$wallMs,"files":$files,"bytes":$bytes,
         |"inputs":[${inputs.map("\"" + _ + "\"").mkString(",")}],
         |"partitions":[${partStats.toString}]}""".stripMargin.replace("\n", "")
    // Iceberg-style atomic publish: write temp, rename into place
    val tmp = Paths.get(root, s".$name.manifest.tmp")
    Files.createDirectories(Paths.get(root))
    Files.writeString(tmp, json)
    Files.move(tmp, manifest(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def invalidate(name: String): Unit = {
    // cascade: any committed stage listing `name` as an input is stale too
    val work = scala.collection.mutable.Queue(name)
    val done = scala.collection.mutable.Set.empty[String]
    while (work.nonEmpty) {
      val cur = work.dequeue()
      if (done.add(cur)) {
        Files.deleteIfExists(manifest(cur))
        val root0 = Paths.get(root)
        if (Files.exists(root0)) {
          val it = Files.list(root0).iterator()
          while (it.hasNext) {
            val p = it.next()
            val fn = p.getFileName.toString
            if (fn.endsWith(".manifest.json") && Files.exists(p) &&
                Files.readString(p).contains("\"inputs\":") &&
                Files.readString(p).split("\"inputs\":")(1)
                  .contains("\"" + cur + "\"")) {
              work += fn.stripSuffix(".manifest.json")
            }
          }
        }
      }
    }
  }
}
