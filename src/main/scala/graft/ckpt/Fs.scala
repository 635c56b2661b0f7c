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

  /** Directory-swap commit with a crash-safe aside protocol: `dst` is
    * renamed aside to `<dst>.old` (never deleted before the new data is
    * in place), `src` renamed in, then the aside copy dropped. A crash
    * between the aside and the commit rename leaves the new data in
    * `src` and the old in `<dst>.old` — [[recoverSwap]] completes the
    * commit on the next open. (The previous delete-then-rename protocol
    * had a window where `dst` was GONE while the only copy sat in the
    * swap dir: an `isEmpty` probe in that window read true and a
    * subsequent put silently started a fresh store over the orphan.) */
  def swapInto(src: String, dst: String, conf: Configuration): Unit =
    swapInto(src, dst, dst + ".old", conf)

  /** [[swapInto]] with an explicit aside path — needed when `dst` sits
    * INSIDE a directory Spark reads (a `batch=<id>` partition dir): the
    * default `<dst>.old` aside would be visible to partition discovery
    * during the swap window, so callers pass a dot-prefixed (hidden)
    * aside instead. */
  def swapInto(src: String, dst: String, aside: String, conf: Configuration): Unit = {
    val fs = fileSystem(dst, conf)
    val s = new HPath(src); val d = new HPath(dst)
    val old = new HPath(aside)
    if (fs.exists(old)) fs.delete(old, true) // stale aside from a prior crash
    if (fs.exists(d) && !fs.rename(d, old))
      throw new java.io.IOException(s"swap aside rename failed: $d -> $old")
    if (!fs.rename(s, d)) {
      // restore the aside copy so the store keeps serving its old state
      if (fs.exists(old)) fs.rename(old, d)
      throw new java.io.IOException(s"swap rename failed: $s -> $d")
    }
    if (fs.exists(old)) { fs.delete(old, true); () }
    // rename preserves the renamed dir's OWN mtime, so after a
    // whole-dir swap `dst` carries the staging dir's (older) write
    // time — mtime-based staleness guards (BatchStore.rowCount's
    // persist gate) would read a committed swap as "nothing mutated".
    // Stamp the commit time explicitly (best-effort: an FS without
    // setTimes keeps the pre-fix behavior, where only guards on the
    // PARENT dir's mtime see the swap).
    try { fs.setTimes(d, System.currentTimeMillis(), -1) }
    catch { case scala.util.control.NonFatal(_) => () } // commit already succeeded
  }

  /** Complete a [[swapInto]] interrupted mid-commit — called by stores
    * on open, BEFORE serving any read. If `dst` is missing but the
    * pending swap dir exists, the commit is finished (rename failures
    * are tolerated when a concurrent recoverer won the race); if only
    * the aside copy survives, it is restored. A leftover aside dir next
    * to an intact `dst` is an already-committed swap's garbage and is
    * dropped. A leftover swap dir next to an intact `dst` is left alone:
    * it may be a concurrent writer's in-progress rewrite (the writer's
    * own overwrite mode reclaims abandoned ones). */
  def recoverSwap(src: String, dst: String, conf: Configuration): Unit =
    recoverSwap(src, dst, dst + ".old", conf)

  /** [[recoverSwap]] for a swap committed with an explicit aside. */
  def recoverSwap(src: String, dst: String, aside: String, conf: Configuration): Unit = {
    val fs = fileSystem(dst, conf)
    val s = new HPath(src); val d = new HPath(dst)
    val old = new HPath(aside)
    if (!fs.exists(d)) {
      if (fs.exists(s)) {
        // promote the staging dir ONLY when it is provably COMPLETE:
        // either the aside exists (swapInto renames dst aside strictly
        // AFTER src is fully written, so a present aside certifies src)
        // or src carries Spark's _SUCCESS commit marker. A staging dir
        // failing both checks is a write that crashed MID-parquet —
        // promoting it would serve a partial batch as committed,
        // violating the "committed dir is complete by construction"
        // invariant every reader relies on. The mutation never returned
        // success, so DROPPING the leftover is the consistent recovery.
        val complete = fs.exists(old) || fs.exists(new HPath(s, "_SUCCESS"))
        if (complete) {
          if (!fs.rename(s, d) && !fs.exists(d))
            throw new java.io.IOException(s"swap recovery rename failed: $s -> $d")
          // same commit-time stamp as swapInto: the promoted dir's own
          // mtime predates the crash it recovers from
          try { fs.setTimes(d, System.currentTimeMillis(), -1) }
          catch { case scala.util.control.NonFatal(_) => () }
        } else {
          fs.delete(s, true); ()
        }
      } else if (fs.exists(old)) {
        if (!fs.rename(old, d) && !fs.exists(d))
          throw new java.io.IOException(s"swap recovery restore failed: $old -> $d")
        try { fs.setTimes(d, System.currentTimeMillis(), -1) }
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    if (fs.exists(d) && fs.exists(old)) { fs.delete(old, true); () }
  }

  /** Build a multi-file artifact directory (model payload + manifest)
    * atomically: `write(staging)` produces the COMPLETE artifact under
    * a sibling staging dir, which is then swap-committed into `path`
    * ([[swapInto]]'s aside protocol). Readers complete a crashed
    * publish with [[recoverPublish]] before reading. Without this,
    * re-saving over an existing artifact overwrites the payload parquet
    * in place — a crash mid-write leaves the old manifest pointing at a
    * partial payload, which a loader reads silently. */
  def publishDir(path: String, conf: Configuration)(write: String => Unit): Unit = {
    val staging = path + ".swap"
    deleteIfExists(staging, conf)
    write(staging)
    swapInto(staging, path, conf)
  }

  /** Complete a [[publishDir]] a crashed writer left mid-swap — called
    * by loaders before reading (cheap existence probes when clean). */
  def recoverPublish(path: String, conf: Configuration): Unit =
    recoverSwap(path + ".swap", path, conf)

  /** Publish a directory artifact by plain rename: `write(staging)`
    * builds it under a sibling temp dir, any stale `path` is dropped,
    * and the staging renamed into place — a crash anywhere leaves
    * either no artifact or the COMPLETE new one, never a partial dir a
    * reader would load silently. For artifacts whose absence is
    * recoverable (first-fit stats/codebooks — the row store is still
    * empty, the next put re-fits; refit/remove intent markers — the
    * mutation simply never happened). Use [[publishDir]] instead when
    * the OLD artifact must survive a crashed re-publish. */
  def publishByRename(path: String, conf: Configuration)(write: String => Unit): Unit = {
    val staging = path + ".tmp"
    deleteIfExists(staging, conf)
    write(staging)
    deleteIfExists(path, conf)
    rename(staging, path, conf)
  }

  /** Atomically create `path` (failing if it already exists) — the
    * claim primitive for single-writer leases. Returns true iff this
    * call created the file. */
  def createExclusive(path: String, content: String, conf: Configuration): Boolean = {
    val fs = fileSystem(path, conf)
    val p = new HPath(path)
    fs.mkdirs(p.getParent)
    try {
      val out = fs.create(p, false)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  /** Rename `src` to `dst`, failing loudly. The atomic-publish
    * primitive for directories: write under a temp name, then rename
    * into place — readers never see a half-written directory. */
  def rename(src: String, dst: String, conf: Configuration): Unit = {
    val fs = fileSystem(dst, conf)
    if (!fs.rename(new HPath(src), new HPath(dst)))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  }

  /** Refresh the modification time of an existing file (lease
    * heartbeat). Never creates the file; a missing path is a no-op —
    * the holder losing its lease mid-beat must not resurrect it.
    *
    * `setTimes` is a silent NO-OP on the base `FileSystem` (bytecode:
    * `return`) and object-store implementations (s3a) inherit it — on
    * exactly the stores this facade advertises, a heartbeat that only
    * called setTimes would never refresh the lock and a live
    * longer-than-TTL lease would be silently breakable (two writers).
    * So the stamp is verified after the call, and when it did not
    * move, the file is rewritten in place with its own bytes — a PUT
    * updates Last-Modified on every store. The rewrite window is
    * benign for the break protocol: a breaker's ownership re-read that
    * catches the rewrite mid-flight reads a partial token, fails its
    * own-token verification, and aborts the break (the safe side). The
    * 2 s tolerance keeps setTimes-supporting stores (local, HDFS — the
    * stamp lands exactly on `now`) on the cheap path. */
  def touch(path: String, conf: Configuration): Unit = try {
    val fs = fileSystem(path, conf)
    val p = new HPath(path)
    if (fs.exists(p)) {
      val now = System.currentTimeMillis()
      fs.setTimes(p, now, -1)
      if (fs.getFileStatus(p).getModificationTime < now - 2000) {
        val in = fs.open(p)
        val bytes = try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toByteArray
        } finally in.close()
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
      }
    }
  } catch { case _: java.io.IOException => () }

  /** Modification time of `path` in epoch millis, if it exists. */
  def modifiedMs(path: String, conf: Configuration): Option[Long] = {
    val fs = fileSystem(path, conf)
    val p = new HPath(path)
    if (fs.exists(p)) Some(fs.getFileStatus(p).getModificationTime) else None
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
