package graft.ops

import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import java.nio.charset.StandardCharsets
import java.util.UUID

/** The transaction log's metadata-plane I/O seam: every listing, read,
  * move, and — critically — every ATOMIC COMMIT PUBLISH the log
  * performs goes through this interface, so the log's correctness
  * contract is stated once and each storage system implements it with
  * its own primitive:
  *
  *  - [[LocalTxIo]] (plain paths / `file:` roots): publish = write to
  *    a temp file, then `link(2)` it at the commit name. POSIX hard
  *    links are atomic for readers (full content appears at once) and
  *    exclusive (EEXIST when the version is already taken) — rename is
  *    NOT used because POSIX rename silently replaces an existing
  *    target, which is exactly the last-writer-wins corruption a log
  *    exists to prevent.
  *  - [[HadoopTxIo]] (any `FileSystem` scheme — HDFS, object stores):
  *    publish = `FileSystem.create(path, overwrite = false)` + one
  *    write + close. Rename-free BY DESIGN: object-store "rename" is a
  *    non-atomic copy, but exclusive create maps to HDFS's atomic
  *    namenode create and to a conditional PUT (if-none-match) on
  *    object stores that support it — the loud-conflict contract
  *    survives storage systems where rename cannot be trusted.
  *
  * Consistency assumptions, stated explicitly for the 100 TB posture:
  * the store must provide (a) exclusive create (two writers racing one
  * commit name: exactly one wins, the loser gets a conflict error),
  * and (b) list-after-put visibility of the log directory (S3 has been
  * strongly consistent since 2020; HDFS always was). Content-level
  * read-after-create atomicity is NOT assumed for [[HadoopTxIo]]: a
  * reader can observe a commit file whose single-digit-KB content is
  * still flushing — commits are one-shot single-block writes, so the
  * window is the close() latency; a reader that fails to parse the TIP
  * commit should retry, the same contract Delta documents for
  * eventually-flushed log stores. The limit case — a publisher that
  * CRASHED between the exclusive create and the close, leaving a
  * zero-byte file that claims the version forever — is detected and
  * self-healed by the log itself: `TxLog.versionsOnDisk` fails loudly
  * on a young zero-byte tip (a live publisher may still be flushing)
  * and QUARANTINES an aged-out one, freeing the version slot (see
  * `TxLog.zeroByteTipGraceMillis`). On object stores where exclusive
  * create is emulated as check-then-put (S3A without conditional PUT
  * enabled), two racing writers can BOTH believe they won — the
  * silent last-writer-wins the log exists to prevent. Such stores are
  * supported only with a conditional-create capability (S3
  * If-None-Match, GCS preconditions) or an external single-writer
  * guarantee per table — the same LogStore requirement Delta
  * documents for S3.
  */
private[graft] trait TxIo {
  /** Publish `content` at `path` atomically and exclusively; throws
    * [[java.nio.file.FileAlreadyExistsException]] when `path` is
    * already committed (the version-conflict signal the log retries
    * on).
    */
  def putIfAbsent(path: String, content: String): Unit

  def read(path: String): String

  /** Child NAMES of `dir` (not paths); empty when `dir` is absent. */
  def list(dir: String): Seq[String]

  /** All regular files under `dir` recursively, as `dir`-relative
    * paths; empty when `dir` is absent.
    */
  def listRecursive(dir: String): Seq[String]

  def exists(path: String): Boolean
  def mkdirs(dir: String): Unit
  def delete(path: String): Unit
  def deleteIfExists(path: String): Unit

  /** Remove `dir` and everything under it (staging-dir cleanup). */
  def deleteRecursive(dir: String): Unit

  /** Move a staged file to its published name. Only used for DATA
    * files under the table root (never for commit files — data names
    * are UUID-unique, so moves never race).
    */
  def move(src: String, dst: String): Unit

  def size(path: String): Long
  def mtime(path: String): Long
}

private[graft] object TxIo {
  /** Implementation for `root`: scheme-less plain paths get the POSIX
    * link-atomic implementation; ANY explicit scheme — `hdfs://`,
    * `s3a://`, and also `file:` (it names a Hadoop `FileSystem`) —
    * goes through the Hadoop API. A `file:` root is therefore how the
    * test suite drives the whole table lifecycle over the Hadoop
    * implementation without a cluster.
    */
  def forRoot(root: String): TxIo = {
    val uri = new org.apache.hadoop.fs.Path(root).toUri
    wrapper(
      if (uri.getScheme == null) LocalTxIo
      else cache.computeIfAbsent(
        s"${uri.getScheme}@${uri.getAuthority}",
        _ => new HadoopTxIo(root)))
  }

  // one TxIo per (scheme, authority): Configuration parsing and
  // FileSystem instantiation are too heavy for the per-listing call
  // cadence
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, TxIo]()

  /** Test seam: every TxIo handed out passes through this wrapper, so
    * specs can interpose a counting/fault-injecting decorator and
    * assert METADATA-PLANE costs (e.g. "a connector read touches
    * O(checkpoint interval) commit files") or race outcomes
    * deterministically. Identity in production.
    */
  @volatile private[graft] var wrapper: TxIo => TxIo = identity
}

private[graft] object LocalTxIo extends TxIo {
  private def p(s: String) = Paths.get(
    new org.apache.hadoop.fs.Path(s).toUri.getPath)

  override def putIfAbsent(path: String, content: String): Unit = {
    val target = p(path)
    val tmp = target.resolveSibling(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, content)
    try {
      // see the trait doc: link, not rename — atomic AND exclusive
      Files.createLink(target, tmp)
      Files.delete(tmp)
    } catch {
      case e: FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw e
    }
  }

  override def read(path: String): String = Files.readString(p(path))

  override def list(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val d = p(dir)
    if (!Files.exists(d)) Seq.empty
    else {
      // `Files.list` holds a directory stream open until closed — leak
      // one per resolve in a long-lived streaming driver and the
      // process runs out of descriptors
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }
  }

  override def listRecursive(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val d = p(dir)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.walk(d)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => d.relativize(f).toString).toList
      finally s.close()
    }
  }

  override def exists(path: String): Boolean = Files.exists(p(path))
  override def mkdirs(dir: String): Unit =
    Files.createDirectories(p(dir)): Unit
  override def delete(path: String): Unit = Files.delete(p(path))
  override def deleteIfExists(path: String): Unit =
    Files.deleteIfExists(p(path)): Unit
  override def deleteRecursive(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val d = p(dir)
    if (Files.exists(d)) {
      val s = Files.walk(d)
      // deepest first, so directories empty out before their delete
      try s.iterator().asScala.toList.reverse.foreach(Files.delete)
      finally s.close()
    }
  }
  override def move(src: String, dst: String): Unit =
    Files.move(p(src), p(dst)): Unit
  override def size(path: String): Long = Files.size(p(path))
  override def mtime(path: String): Long =
    Files.getLastModifiedTime(p(path)).toMillis
}

private[graft] class HadoopTxIo(root: String) extends TxIo {
  import org.apache.hadoop.fs.{FileSystem, Path}

  // the SESSION's Hadoop configuration when one is live — that is
  // where spark.hadoop.* settings (object-store credentials,
  // endpoints, timeouts) land, and a bare `new Configuration()` would
  // silently ignore them all, breaking hdfs:///s3a:// roots on any
  // real deployment
  private val conf = org.apache.spark.sql.SparkSession.getActiveSession
    .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    .map(_.sessionState.newHadoopConf())
    .getOrElse(new org.apache.hadoop.conf.Configuration())
  private val fs: FileSystem = {
    // newInstance, NOT get: the checksum settings below must apply to
    // THIS metadata plane only — mutating the process-wide cached
    // FileSystem would disable checksums for every other user of the
    // same scheme (including Spark's own file: writes). The instance
    // is held for the TxIo cache's lifetime (one per scheme@authority)
    val f = FileSystem.newInstance(new Path(root).toUri, conf)
    // commit JSONs are their own integrity story (grammar-locked,
    // parse-validated); local-FS checksum sidecars would only litter
    // the log directory
    f.setWriteChecksum(false)
    f.setVerifyChecksum(false)
    f
  }

  override def putIfAbsent(path: String, content: String): Unit = {
    val out =
      try fs.create(new Path(path), /* overwrite = */ false)
      catch {
        // normalize both the Hadoop and the java.nio flavor to the one
        // conflict signal the log's retry loops catch
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: FileAlreadyExistsException =>
          throw new FileAlreadyExistsException(path)
        case e: java.io.IOException
            if e.getMessage != null &&
              e.getMessage.contains("already exists") =>
          throw new FileAlreadyExistsException(path)
      }
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  override def read(path: String): String = {
    val in = fs.open(new Path(path))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  override def list(dir: String): Seq[String] = {
    val d = new Path(dir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
  }

  override def listRecursive(dir: String): Seq[String] = {
    val d = new Path(dir)
    if (!fs.exists(d)) Seq.empty
    else {
      val qualified = fs.makeQualified(d).toString
      val it = fs.listFiles(d, /* recursive = */ true)
      val out = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile)
          out += st.getPath.toString.stripPrefix(qualified)
            .stripPrefix("/")
      }
      out.result()
    }
  }

  override def exists(path: String): Boolean = fs.exists(new Path(path))
  override def mkdirs(dir: String): Unit = fs.mkdirs(new Path(dir)): Unit
  override def delete(path: String): Unit = {
    if (!fs.delete(new Path(path), false))
      throw new java.io.IOException(s"delete failed: $path")
  }
  override def deleteIfExists(path: String): Unit =
    fs.delete(new Path(path), false): Unit
  override def deleteRecursive(dir: String): Unit =
    fs.delete(new Path(dir), true): Unit
  override def move(src: String, dst: String): Unit = {
    if (!fs.rename(new Path(src), new Path(dst)))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  }
  override def size(path: String): Long =
    fs.getFileStatus(new Path(path)).getLen
  override def mtime(path: String): Long =
    fs.getFileStatus(new Path(path)).getModificationTime
}
