package graft.ops

import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal parquet transaction log — the Delta/Iceberg commit shape
  * scaled down to its load-bearing core, built to make table mutation
  * SAFE at 100 TB where "overwrite the directory" is not:
  *
  *  - every mutation (append / delete / compact) stages its data files
  *    first, then publishes them with ONE atomic rename of a tiny JSON
  *    commit file — readers see the table before the commit or after
  *    it, never a half-written directory;
  *  - commits never modify or remove existing DATA files (copy-on-
  *    write), so any historical version remains readable: a snapshot
  *    at version v replays the log prefix ≤ v ([[snapshot]] — time
  *    travel);
  *  - two writers racing to the same version collide on the commit
  *    file's `Files.move` (no REPLACE_EXISTING) and the loser fails
  *    LOUDLY with a conflict — optimistic concurrency, not silent
  *    last-writer-wins;
  *  - storage is reclaimed only by an explicit [[vacuum]] with a
  *    retention floor, the same separation Delta draws between logical
  *    delete and physical removal.
  *
  * The log directory holds one `%08d.json` file per version; data
  * files live under `data/` with UUID names (immutable once
  * published). At this scale a JSON-lines log is exactly what Delta
  * ships; checkpoint compaction of the log itself is out of scope —
  * the per-commit cost here is O(files touched), not O(table).
  */
object TxLog {

  private def logDir(root: String) = s"$root/_txlog"
  private def dataDir(root: String) = s"$root/data"

  /** Live data files (relative paths) of the table at `version`
    * (latest when None), with the version actually resolved. Replays
    * add/remove actions in commit order — order matters because a
    * compaction removes files an earlier commit added.
    */
  final case class Snapshot(version: Long, files: Seq[String])

  /** Create an empty table root (no versions yet). */
  def init(root: String): Unit = {
    Files.createDirectories(Paths.get(logDir(root)))
    Files.createDirectories(Paths.get(dataDir(root)))
  }

  private def versionsOnDisk(root: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(logDir(root))
    if (!Files.exists(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted
  }

  // data-file names are UUID-based and commit JSON is hand-rolled, so
  // the path grammar is locked down at write time — a quote or comma
  // in a path would corrupt the log
  private val SafePath = "[A-Za-z0-9._/\\-=]+".r

  private[graft] def writeCommit(root: String, version: Long,
                                 adds: Seq[String],
                                 removes: Seq[String],
                                 batchId: Option[Long] = None): Unit = {
    (adds ++ removes).foreach(p =>
      require(SafePath.matches(p), s"unsafe path in commit: $p"))
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val bid = batchId.map(b => s""","batchId":$b""").getOrElse("")
    val json =
      s"""{"v":$version,"adds":${arr(adds)},"removes":${arr(removes)}$bid}"""
    val tmp = Paths.get(logDir(root), s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, json)
    try {
      // publish via hard link, NOT ATOMIC_MOVE: POSIX rename silently
      // REPLACES an existing target (last-writer-wins — the exact
      // corruption a log exists to prevent), while link(2) is both
      // atomic for readers (full content appears at once) and
      // exclusive (EEXIST when the version is already committed)
      Files.createLink(Paths.get(logDir(root), f"$version%08d.json"), tmp)
      Files.delete(tmp)
    } catch {
      case e: FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"txlog conflict: version $version was committed concurrently; " +
            "re-resolve the snapshot and retry", e)
    }
  }

  private def parseCommit(json: String): (Long, Seq[String], Seq[String]) = {
    val v = "\"v\":(\\d+)".r.findFirstMatchIn(json).get.group(1).toLong
    def arr(key: String): Seq[String] = {
      val body = s""""$key":\\[([^\\]]*)\\]""".r
        .findFirstMatchIn(json).get.group(1)
      if (body.isEmpty) Seq.empty
      else body.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
    }
    (v, arr("adds"), arr("removes"))
  }

  /** Resolve the file set at `version` (latest when None). */
  def resolve(root: String, version: Option[Long] = None): Snapshot = {
    val vs = versionsOnDisk(root)
    require(vs.nonEmpty, s"txlog at $root has no commits")
    val upTo = version.getOrElse(vs.max)
    require(vs.contains(upTo), s"version $upTo not in txlog (have $vs)")
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    vs.filter(_ <= upTo).foreach { v =>
      val (_, adds, removes) =
        parseCommit(Files.readString(Paths.get(logDir(root), f"$v%08d.json")))
      removes.foreach(live -= _)
      adds.foreach(live += _)
    }
    Snapshot(upTo, live.toSeq)
  }

  /** Read the table at `version` (latest when None) — time travel.
    * A fully-deleted snapshot has no files to infer a schema from, so
    * reading one is a loud error rather than a guessed-schema empty
    * frame.
    */
  def snapshot(spark: SparkSession, root: String,
               version: Option[Long] = None): DataFrame = {
    val snap = resolve(root, version)
    require(snap.files.nonEmpty,
      s"version ${snap.version} of $root has no live files")
    // mergeSchema: commits may evolve the schema (append with new
    // columns); older files read the missing columns as null. At
    // production scale the merged schema would live IN the log
    // (Delta's metadata action) instead of being re-derived from
    // footers — the semantics are the same
    spark.read.option("mergeSchema", "true")
      .parquet(snap.files.map(f => s"$root/$f"): _*)
  }

  /** Stage `df` as new immutable data files and return their relative
    * paths (not yet visible — publish via a commit).
    */
  private def stage(spark: SparkSession, root: String,
                    df: DataFrame): Seq[String] = {
    val uid = UUID.randomUUID().toString.take(8)
    val tmp = s"$root/_staged-$uid"
    df.write.parquet(tmp)
    import scala.jdk.CollectionConverters._
    val parts = Files.list(Paths.get(tmp)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    val rels = parts.zipWithIndex.map { case (p, i) =>
      val rel = f"data/part-$uid-$i%05d.parquet"
      Files.move(p, Paths.get(root, rel))
      rel
    }
    // the staging dir (with its _SUCCESS marker) is bookkeeping only
    Files.list(Paths.get(tmp)).iterator().asScala.foreach(Files.delete)
    Files.delete(Paths.get(tmp))
    rels
  }

  /** Append `df` as a new version; returns the committed version. */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    val adds = stage(spark, root, df)
    val next = versionsOnDisk(root).lastOption.map(_ + 1).getOrElse(0L)
    writeCommit(root, next, adds, Seq.empty)
    next
  }

  /** Logged copy-on-write delete: the [[Maintenance.deleteWhere]]
    * mechanics (stats-pruned hit discovery, survivor rewrite of ONLY
    * the hit files) committed through the log instead of mutating the
    * directory — the removed files stay on disk, so every pre-delete
    * version remains time-travel readable until [[vacuum]].
    */
  def deleteWhere(spark: SparkSession, root: String, keyCol: String,
                  keys: Seq[Long]): Long = {
    require(keys.nonEmpty, "txlog deleteWhere: empty key list")
    val snap = resolve(root)
    val hit = col(keyCol).isin(keys: _*)
    val abs = snap.files.map(f => s"$root/$f")
    val affectedAbs = spark.read.parquet(abs: _*)
      .filter(hit)
      .select(col("_metadata.file_path"))
      .distinct().collect().map(_.getString(0))
    val next = snap.version + 1
    if (affectedAbs.isEmpty) {
      writeCommit(root, next, Seq.empty, Seq.empty)
      return next
    }
    val adds = stage(spark,
      root, spark.read.parquet(affectedAbs.toIndexedSeq: _*).filter(!hit))
    // normalize the scan's file URIs back to log-relative paths
    val removes = affectedAbs.toSeq.map { u =>
      val p = Paths.get(new java.net.URI(u)).toString
      p.stripPrefix(Paths.get(root).toAbsolutePath.toString + "/")
    }
    writeCommit(root, next, adds, removes)
    next
  }

  /** MERGE INTO as a commit (logged upsert): rows of `updates` replace
    * same-key rows, unmatched keys append — the most-used lakehouse
    * mutation, in its copy-on-write form. Only the files that CONTAIN
    * a matched key are rewritten (hit discovery is a stats-pruned
    * semi-join, so on a key-clustered layout — sorted or
    * [[optimize]]d — a small update touches a small file set); rows in
    * every other file are untouched on disk. `updates` must be unique
    * per key and share the table's schema (the caller pre-reduces a
    * CDC stream, same contract as [[Maintenance.upsert]]).
    */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
             keyCol: String): Long = {
    val snap = resolve(root)
    val keys = updates.select(keyCol).distinct()
    // _metadata resolves only on the scan itself — project it before
    // the semi-join
    val hitAbs = spark.read.option("mergeSchema", "true")
      .parquet(snap.files.map(f => s"$root/$f"): _*)
      .select(col(keyCol), col("_metadata.file_path").as("__f"))
      .join(keys, Seq(keyCol), "left_semi")
      .select("__f").distinct().collect().map(_.getString(0))
    val survivors =
      if (hitAbs.isEmpty) updates.limit(0)
      else spark.read.option("mergeSchema", "true")
        .parquet(hitAbs.toIndexedSeq: _*)
        .join(keys, Seq(keyCol), "left_anti")
    val adds = stage(spark, root, survivors.unionByName(updates))
    val removes = hitAbs.toSeq.map { u =>
      val p = Paths.get(new java.net.URI(u)).toString
      p.stripPrefix(Paths.get(root).toAbsolutePath.toString + "/")
    }
    writeCommit(root, snap.version + 1, adds, removes)
    snap.version + 1
  }

  /** OPTIMIZE ZORDER BY as a commit: rewrite the live set Z-ordered on
    * `cols` ([[Maintenance.zorderLayout]]) and publish the layout
    * atomically — logically a no-op (a [[changesBetween]] over the
    * interval is empty), physically the clustering that makes later
    * key predicates, [[deleteWhere]] hit discovery, and [[upsert]]
    * rewrites prune to few files. History before the rewrite stays
    * readable.
    */
  def optimize(spark: SparkSession, root: String, cols: Seq[String],
               numFiles: Int): Long = {
    val snap = resolve(root)
    val adds = stage(spark, root,
      Maintenance.zorderLayout(snapshot(spark, root), cols, numFiles))
    writeCommit(root, snap.version + 1, adds, snap.files)
    snap.version + 1
  }

  /** Compaction as a commit: bin-pack the live files toward
    * `targetBytes` and publish the packed files while REMOVING every
    * previous live file — logically a no-op (same rows), physically
    * the small-file cure. History before the compaction stays
    * readable.
    */
  def compact(spark: SparkSession, root: String, targetBytes: Long): Long = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val snap = resolve(root)
    val total = snap.files.map(f => Files.size(Paths.get(root, f))).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val adds = stage(spark, root,
      spark.read.parquet(snap.files.map(f => s"$root/$f"): _*).coalesce(n))
    writeCommit(root, snap.version + 1, adds, snap.files)
    snap.version + 1
  }

  /** Stream-source batch ids already committed to the log (from the
    * commits' optional `batchId` field) — the idempotency ledger for
    * [[streamingAppend]].
    */
  def committedBatchIds(root: String): Set[Long] =
    versionsOnDisk(root).flatMap { v =>
      """"batchId":(\d+)""".r
        .findFirstMatchIn(
          Files.readString(Paths.get(logDir(root), f"$v%08d.json")))
        .map(_.group(1).toLong)
    }.toSet

  /** Commit one micro-batch idempotently: a batch id already present
    * in the log is a REPLAY (Structured Streaming re-delivers the
    * last batch after a failure) and must not land twice — the check
    * here plus the version-conflict guard in [[writeCommit]] give the
    * foreachBatch sink exactly-once table semantics, the same
    * txn-ledger idea as the Delta streaming sink. Returns the
    * committed version, or None when the batch was a replay.
    */
  def commitBatch(spark: SparkSession, root: String, batch: DataFrame,
                  batchId: Long): Option[Long] = {
    if (committedBatchIds(root).contains(batchId)) return None
    val adds = stage(spark, root, batch)
    val next = versionsOnDisk(root).lastOption.map(_ + 1).getOrElse(0L)
    writeCommit(root, next, adds, Seq.empty, Some(batchId))
    Some(next)
  }

  /** Continuous ingestion INTO the log: every micro-batch becomes an
    * atomic, idempotent table version via [[commitBatch]]. Callers
    * own the query lifecycle (start/stop/await).
    */
  def streamingAppend(df: DataFrame, root: String,
                      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch.sparkSession, root, batch, batchId): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Log-based change-data-capture between two versions: rows added
    * and removed, computed from the CHANGED FILES ONLY — the log names
    * exactly which files each interval touched, so the diff never
    * rescans the table (at 100 TB, diffing two snapshots by content is
    * a full double scan; diffing by log is proportional to the
    * change). The net multiset algebra `added \ removed` /
    * `removed \ added` makes rewrites that move rows between files —
    * compaction, copy-on-write survivor rewrites — cancel out, so a
    * compaction interval reports zero changes and a targeted delete
    * reports exactly the deleted rows.
    */
  def changesBetween(spark: SparkSession, root: String, fromV: Long,
                     toV: Long): DataFrame = {
    require(fromV <= toV, s"changesBetween: $fromV > $toV")
    val from = resolve(root, Some(fromV)).files.toSet
    val to = resolve(root, Some(toV)).files.toSet
    val addedF = (to -- from).toSeq.sorted
    val removedF = (from -- to).toSeq.sorted
    if (addedF.isEmpty && removedF.isEmpty) {
      val empty = snapshot(spark, root, Some(toV)).limit(0)
      return empty.withColumn("change", lit(""))
    }
    // ONE read over the union of changed files (mergeSchema unifies an
    // evolved schema across the interval), then split by which side of
    // the diff each file is on — so the two excepts compare identical
    // schemas even when the interval added columns. Files are keyed by
    // NAME: data-file names are UUID-unique by construction, and the
    // name dodges the file-URI scheme variance of `file_path`
    val addedNames = addedF.map(f => Paths.get(f).getFileName.toString)
    val all = spark.read.option("mergeSchema", "true")
      .parquet((addedF ++ removedF).map(f => s"$root/$f"): _*)
      .withColumn("__added",
        element_at(split(col("_metadata.file_path"), "/"), -1)
          .isin(addedNames: _*))
    val added = all.filter(col("__added")).drop("__added")
    val removed = all.filter(!col("__added")).drop("__added")
    added.exceptAll(removed).withColumn("change", lit("insert"))
      .unionByName(removed.exceptAll(added)
        .withColumn("change", lit("delete")))
  }

  /** Physically remove data files unreferenced by every version >=
    * `retainFrom` (and drop the older commit files): the explicit,
    * retention-floored reclamation step. Returns the removed file
    * count. Time travel to versions >= `retainFrom` is unaffected;
    * older versions become unreadable BY CHOICE — that is the
    * contract's point.
    */
  def vacuum(root: String, retainFrom: Long): Int = {
    val vs = versionsOnDisk(root)
    require(vs.contains(retainFrom),
      s"retainFrom $retainFrom must be an existing version (have $vs)")
    val referenced = vs.filter(_ >= retainFrom)
      .flatMap(v => resolve(root, Some(v)).files).toSet
    import scala.jdk.CollectionConverters._
    val onDisk = Files.list(Paths.get(dataDir(root))).iterator().asScala
      .map(p => "data/" + p.getFileName.toString).toSeq
    val doomed = onDisk.filterNot(referenced)
    doomed.foreach(f => Files.delete(Paths.get(root, f)))
    vs.filter(_ < retainFrom).foreach(v =>
      Files.delete(Paths.get(logDir(root), f"$v%08d.json")))
    doomed.size
  }
}
