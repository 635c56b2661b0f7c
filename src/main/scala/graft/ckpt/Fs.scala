package graft.ckpt

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/**
 * Minimal Hadoop-FileSystem facade for the repo's operational surfaces
 * (model manifests, incremental index, stage store). Every operation
 * resolves the [[FileSystem]] FROM THE PATH ITSELF, so `file:`, `hdfs:`
 * and `s3a:` URIs (and bare local paths via the default FS) all go
 * through the same code — the `java.io.File` calls these replace only
 * worked on the local filesystem, while the parquet payloads were
 * already being written through Hadoop, landing the two halves of one
 * artifact in different namespaces on any non-local default FS.
 */
object Fs {

  def fileSystem(path: String, conf: Configuration): FileSystem =
    new HPath(path).getFileSystem(conf)

  def exists(path: String, conf: Configuration): Boolean =
    fileSystem(path, conf).exists(new HPath(path))

  def mkdirs(path: String, conf: Configuration): Unit = {
    fileSystem(path, conf).mkdirs(new HPath(path)); ()
  }

  def readString(path: String, conf: Configuration): String = {
    val fs = fileSystem(path, conf)
    val in = fs.open(new HPath(path))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Publish a small file with the Iceberg-style commit protocol: write
    * a sibling temp file, then rename into place (delete-then-rename —
    * rename is atomic on HDFS/posix; object stores approximate, which
    * is the same contract Iceberg's HadoopTableOperations accepts). */
  def writeStringAtomic(path: String, content: String, conf: Configuration): Unit = {
    val fs = fileSystem(path, conf)
    val dst = new HPath(path)
    val tmp = new HPath(dst.getParent, "." + dst.getName + ".tmp")
    fs.mkdirs(dst.getParent)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"atomic publish rename failed: $tmp -> $dst")
  }

  def deleteIfExists(path: String, conf: Configuration): Unit = {
    val fs = fileSystem(path, conf)
    val p = new HPath(path)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Directory-swap commit: remove `dst` and rename `src` over it. */
  def swapInto(src: String, dst: String, conf: Configuration): Unit = {
    val fs = fileSystem(dst, conf)
    val s = new HPath(src); val d = new HPath(dst)
    if (fs.exists(d)) fs.delete(d, true)
    if (!fs.rename(s, d))
      throw new java.io.IOException(s"swap rename failed: $s -> $d")
  }

  /** Child names of a directory (empty if the dir does not exist). */
  def listNames(dir: String, conf: Configuration): Seq[String] = {
    val fs = fileSystem(dir, conf)
    val p = new HPath(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** (name, bytes) of a directory's plain-file children. */
  def listFiles(dir: String, conf: Configuration): Seq[(String, Long)] = {
    val fs = fileSystem(dir, conf)
    val p = new HPath(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isFile)
      .map(st => (st.getPath.getName, st.getLen))
  }
}
