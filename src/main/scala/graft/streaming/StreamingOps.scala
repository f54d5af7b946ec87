package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table shape
  * `(event_id, ts, user_id, event_type, value, props)`. The reference
  * has no streaming surface (SURVEY.md §2.9); these are the north-star
  * extensions: watermarked windowed aggregation and stateful
  * sessionization, written so the SAME transformations run in batch
  * (tests/oracle) and streaming (readStream) mode.
  */
object StreamingOps {

  /** Tumbling-window aggregation per event type. Works on a batch OR
    * streaming DataFrame; callers add `withWatermark` upstream in
    * streaming mode (late data bound -> state eviction).
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count("*").as("n_events"), sum("value").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming wrapper: parquet-backed file stream -> watermark ->
    * windowed agg. `maxFilesPerTrigger=1` makes local smoke runs
    * deterministic.
    */
  def streamingWindowedCounts(spark: SparkSession, eventsPath: String,
                              windowLen: String = "1 hour"): DataFrame = {
    // normalize either events-ts revision (nanos-as-long or NTZ micros)
    // to TIMESTAMP, same as the batch loader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsPath).schema
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(eventsPath))
    windowedCounts(stream.withWatermark("ts", "1 hour"), windowLen)
  }

  /** Streaming word counts — the streaming form of the reference's
    * word-count job ([[graft.search.Indexer.wordCounts]]): the SAME
    * tokenize -> partial-aggregate DAG over a document file stream.
    * Complete output mode; state is one row per distinct term (bounded
    * by vocabulary size, not stream length), so the running counts — and
    * a top-k over them, the streaming "trending terms" surface — stay
    * cheap for continuous ingestion.
    */
  def streamingWordCounts(spark: SparkSession, docsPath: String): DataFrame = {
    val schema = spark.read.parquet(docsPath).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(docsPath)
    graft.search.Indexer.wordCounts(stream)
  }

  /** Continuous index maintenance: consume a parquet-backed document
    * stream batch-by-batch and land each batch's per-(term, doc)
    * stats in the at-rest stats table — the streaming driver for
    * [[graft.search.Indexer.incrementalPostings]]'s append-only
    * contract. The per-document work (tokenize, stem, position
    * collect) runs exactly once per document, in the arrival batch;
    * scores are NOT stored because every TF-IDF weight depends on the
    * global df/docNum — derive a queryable posting table on demand
    * with [[graft.search.Indexer.postingsFromStats]] over
    * [[maintainedStats]].
    *
    * Exactly-once at rest: each micro-batch OVERWRITES its own
    * `batch=<id>` directory, so foreachBatch's at-least-once replay
    * (after a crash or a restart without `checkpointDir`) rewrites the
    * same rows instead of appending duplicates. Pass `checkpointDir`
    * so a restarted query resumes from the recorded offsets instead of
    * reprocessing the directory; pass `schema` to start the query
    * before any document has arrived (inferring it needs one file).
    * `statsPath` must be owned exclusively by this writer: parquet
    * files laid down flat by anything else make partition discovery
    * reject the mixed layout, and they would never be owned by a
    * replayable batch.
    */
  def streamingIndexMaintenance(spark: SparkSession, docsPath: String,
                                statsPath: String,
                                stopWords: Seq[String] = Seq.empty,
                                schema: Option[org.apache.spark.sql.types.StructType] = None,
                                checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batchOwnedStream(spark, docsPath, schema, checkpointDir) { (batch, batchId) =>
      graft.search.Indexer.termDocStats(batch, stopWords)
        .write.mode("overwrite").parquet(s"$statsPath/batch=$batchId")
    }

  /** The maintained stats table: the `batch=<id>` ownership directories
    * surface as a partition column, dropped here so consumers see
    * exactly the `termDocStats` schema. Before the first micro-batch
    * lands (a query started on an empty ingest dir via the `schema`
    * param) the path does not exist yet — consumers polling the table
    * get an empty stats DataFrame, not a PATH_NOT_FOUND crash.
    */
  def maintainedStats(spark: SparkSession, statsPath: String): DataFrame =
    emptySafeParquet(spark, statsPath,
      "term STRING, doc_id BIGINT, tf BIGINT, positions ARRAY<INT>")

  /** The SERVING read over a [[streamingIndexMaintenance]]-maintained
    * stats table: the posting table a search actually runs against.
    * Two steps on top of [[maintainedStats]]:
    *
    *  1. dedup by `(term, doc_id)` — a cross-version REDELIVERY (an
    *     at-least-once upstream re-emitting an old batch as a brand-new
    *     file) lands the same stats rows under a new `batch=` id, and
    *     the serving read must not double-count them into df/tf. Under
    *     the maintenance path's append-only, content-stable contract
    *     (a document's stats never change once landed) the duplicate
    *     rows are bit-identical, so any-row-wins is EXACT — the same
    *     idempotence argument as the KMV merge, pushed to read time
    *     because the term-stats union itself is additive.
    *  2. derive scores with [[graft.search.Indexer.postingsFromStats]]
    *     — the identical df/docNum aggregate the batch build runs, so
    *     serving equals a from-scratch rebuild to the last bit.
    *
    * `doc_num` counts the INDEXED documents (distinct `doc_id` in the
    * stats): equal to the corpus count whenever every document has at
    * least one indexable term; a corpus with fully-stopworded documents
    * should maintain its own doc-count table alongside.
    */
  def servedPostings(spark: SparkSession, statsPath: String): DataFrame = {
    val stats = maintainedStats(spark, statsPath)
      .dropDuplicates("term", "doc_id")
    val docNum = stats.select("doc_id").distinct()
      .agg(count(lit(1)).as("doc_num"))
    graft.search.Indexer.postingsFromStats(stats, docNum)
  }

  /** Continuous clean-ingest — the end-to-end training-data front
    * door: each arriving micro-batch is normalized
    * ([[graft.ops.TextAnalysis.normalizeText]]), exact-deduped against
    * the at-rest digest table AND within itself
    * ([[graft.ops.Dedup.incrementalExact]]), and only the genuinely
    * new documents land in the clean corpus; their digests join the
    * digest table so later batches see them. NULL-text rows
    * (`invalid` status) are quarantined under `rejectPath` — never
    * silently dropped. All three writes are `batch=<id>`-owned
    * overwrites.
    *
    * Replay subtlety: the digest table is SELF-referential — a
    * replayed batch would find its own first-attempt digests at rest
    * and classify all its documents `dup_corpus`, landing an empty
    * batch. Classification therefore reads the digest table WITH THE
    * BATCH'S OWN `batch=<id>` PARTITION EXCLUDED. That makes a replay
    * idempotent ONLY while the file->batch assignment is stable, so
    * unlike [[streamingIndexMaintenance]] (whose at-rest union is
    * batch-independent) this query ALWAYS runs with a checkpoint: by
    * default it lives at `<digestPath>/_checkpoint`, co-located with
    * the state it guards (underscore-prefixed, so parquet discovery
    * ignores it). Deleting the checkpoint forces a full reprocess,
    * which rewrites identical output only if the directory listing
    * order is unchanged.
    */
  def streamingCleanIngest(spark: SparkSession, docsPath: String,
                           cleanPath: String, rejectPath: String,
                           digestPath: String,
                           schema: Option[org.apache.spark.sql.types.StructType] = None,
                           checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batchOwnedStream(spark, docsPath, schema,
      Some(checkpointDir.getOrElse(s"$digestPath/_checkpoint"))) { (batch, batchId) =>
      val sp = batch.sparkSession
      // one normalize pass feeds the classifier and both doc writes
      val normalized = graft.ops.TextAnalysis.normalizeText(batch)
        .withColumn("text", col("norm_text")).drop("norm_text")
        .localCheckpoint(true)
      val atRest = digestsAtRest(sp, digestPath, excludeBatch = batchId)
      // eager: the digest write below must not re-resolve a plan that
      // reads the digest dir this batch is about to write into
      val classified = graft.ops.Dedup.incrementalExact(atRest, normalized)
        .localCheckpoint(true)
      normalized.join(
          classified.filter(col("status") === "new").select("doc_id"),
          Seq("doc_id"))
        .write.mode("overwrite").parquet(s"$cleanPath/batch=$batchId")
      normalized.join(
          classified.filter(col("status") === "invalid").select("doc_id"),
          Seq("doc_id"))
        .write.mode("overwrite").parquet(s"$rejectPath/batch=$batchId")
      classified.filter(col("status") === "new").select("digest")
        .write.mode("overwrite").parquet(s"$digestPath/batch=$batchId")
    }

  /** The at-rest digest table, minus one batch's own partition (see
    * [[streamingCleanIngest]]'s replay note); empty-safe before the
    * first batch lands.
    */
  private def digestsAtRest(spark: SparkSession, digestPath: String,
                            excludeBatch: Long): DataFrame =
    emptySafeParquet(spark, digestPath, "digest STRING",
      keepBatch = true)
      .filter(col("batch") =!= excludeBatch).select("digest")

  /** The clean corpus written by [[streamingCleanIngest]], ownership
    * column dropped; empty-safe before the first batch lands. Also
    * reads the reject quarantine (same layout).
    */
  def cleanCorpus(spark: SparkSession, cleanPath: String,
                  docSchema: org.apache.spark.sql.types.StructType): DataFrame =
    emptySafeParquet(spark, cleanPath, docSchema.toDDL)

  /** Streaming data-quality gate — [[graft.ops.Quality.audit]] run as
    * an ingest admission check: each arriving micro-batch is audited
    * against the declared constraints; a batch that passes EVERY check
    * lands under `acceptPath`, a batch with any failing check is
    * quarantined WHOLE under `quarantinePath` (batch-level gating: a
    * violating batch signals an upstream fault, and admitting its
    * "clean" rows would publish a sample biased by the very fault
    * being detected). Every batch's audit rows land under `auditPath`
    * with the batch id — the quality time-series is itself a queryable
    * table. All three writes are `batch=<id>`-owned overwrites, so
    * at-least-once replay rewrites instead of double-applying.
    *
    * Per batch: the audit is one aggregation pass + one anti-join per
    * FK check over the BATCH (not the corpus); the verdict that
    * crosses the driver is checks-sized.
    */
  def streamingQualityGate(spark: SparkSession, docsPath: String,
                           acceptPath: String, quarantinePath: String,
                           auditPath: String,
                           checks: Seq[graft.ops.Quality.Check],
                           schema: Option[org.apache.spark.sql.types.StructType] = None,
                           checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batchOwnedStream(spark, docsPath, schema, checkpointDir) { (batch, batchId) =>
      val audit = graft.ops.Quality.audit(batch, checks)
        .localCheckpoint(true)
      val ok = audit.agg(min(col("passed"))).collect()(0).getBoolean(0)
      // the batch id rides on the partition directory (batch=<id>),
      // like every batch-owned write here — readers of the base dir
      // recover it via partition discovery
      audit.write.mode("overwrite").parquet(s"$auditPath/batch=$batchId")
      val dest = if (ok) acceptPath else quarantinePath
      batch.write.mode("overwrite").parquet(s"$dest/batch=$batchId")
    }

  /** Shared scaffold of the batch-owned ingestion streams: parquet file
    * source (one file per trigger), explicit-or-inferred schema, and a
    * foreachBatch body that owns `batch=<id>` output directories.
    */
  private def batchOwnedStream(spark: SparkSession, docsPath: String,
                               schema: Option[org.apache.spark.sql.types.StructType],
                               checkpointDir: Option[String])(
      body: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val docSchema = schema.getOrElse(spark.read.parquet(docsPath).schema)
    val writer = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(docsPath)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        body(batch.toDF(), batchId)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** Streaming SCD-1 snapshot maintenance — the CDC driver for
    * [[graft.ops.Maintenance.upsert]]: consume a parquet-backed change
    * stream (`keyCols` + value columns + `seqCol` + `deleteCol`),
    * reduce each micro-batch to its LATEST row per key (max `seqCol`;
    * remaining columns break exact seq ties deterministically), merge
    * it into the previous snapshot, and write the result as the new
    * at-rest snapshot version.
    *
    * Exactly-once at rest via VERSIONED snapshots: batch `n` reads the
    * latest COMPLETE (`_SUCCESS`-marked) `version=<id>` with `id < n`
    * and OVERWRITES `version=<n>`, so an at-least-once replay of batch
    * `n` reads the same predecessor and rewrites the same result
    * instead of double-applying the changes; a version half-written by
    * a crash (or mid-overwrite during the replay itself) has no
    * `_SUCCESS` marker and is invisible to readers, which fall back to
    * its predecessor. The snapshot schema is the change schema minus
    * `deleteCol` (`seqCol` stays — it records each key's last applied
    * change). The merge passes `seqCol` to
    * [[graft.ops.Maintenance.upsert]], so a change whose sequence is
    * not strictly newer than the snapshot's row is a NO-OP even when
    * it arrives in a later micro-batch (late backfills and redelivered
    * files cannot regress a key). Completed older versions are
    * retained for time travel / concurrent readers; prune them like
    * any retention job once readers move past (the pointer-flip
    * analogue of [[graft.ops.Maintenance.compactParquet]]'s fresh-dir
    * contract).
    *
    * Scale: per batch, one shuffle of the (small) change batch for the
    * latest-per-key reduce, then the [[graft.ops.Maintenance.upsert]]
    * join against the previous snapshot. Rewriting the full snapshot
    * per batch is the simple-and-correct contract at snapshot <<
    * corpus scale (dimension tables, manifests); partition the write
    * by a stable key range before pointing this at a snapshot of
    * corpus scale.
    */
  def streamingUpsert(spark: SparkSession, changesPath: String,
                      snapshotPath: String, keyCols: Seq[String],
                      seqCol: String, deleteCol: String = "_deleted",
                      schema: Option[org.apache.spark.sql.types.StructType] = None,
                      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val changeSchema = schema.getOrElse(spark.read.parquet(changesPath).schema)
    // fail at call time, not asynchronously inside the first
    // micro-batch (where a misconfigured column name would surface
    // only as a StreamingQueryException after the query "started")
    val have = changeSchema.map(_.name).toSet
    val missing = (keyCols :+ seqCol :+ deleteCol).filterNot(have)
    require(missing.isEmpty,
      s"change schema lacks column(s) ${missing.mkString(", ")}; has ${have.mkString(", ")}")
    val snapSchema = org.apache.spark.sql.types.StructType(
      changeSchema.filterNot(_.name == deleteCol))
    batchOwnedStream(spark, changesPath, Some(changeSchema), checkpointDir) {
      (batch, batchId) =>
        val restCols = changeSchema.map(_.name)
          .filterNot(c => keyCols.contains(c) || c == seqCol)
        val latest = batch
          .groupBy(keyCols.map(col): _*)
          .agg(max(struct((seqCol +: restCols).map(col): _*)).as("__m"))
          .select(keyCols.map(col) ++
            (seqCol +: restCols).map(c => col(s"__m.$c")): _*)
        val prev = snapshotVersionBefore(spark, snapshotPath, batchId,
          snapSchema)
        graft.ops.Maintenance
          .upsert(prev, latest, keyCols, deleteCol, seqCol = Some(seqCol))
          .write.mode("overwrite").parquet(s"$snapshotPath/version=$batchId")
    }
  }

  /** Streaming SCD-2 history maintenance — the CDC driver for
    * [[graft.ops.Maintenance.scd2Apply]]: each micro-batch is reduced
    * to its latest row per key (max `tsCol`, remaining columns break
    * exact ties deterministically), versioned into the previous
    * history (changed keys close + re-insert, identical rows no-op,
    * new keys insert), and written as the next at-rest history
    * version. Same exactly-once-at-rest contract as
    * [[streamingUpsert]]: batch `n` reads the latest COMPLETE
    * `version=<id>` with `id < n` and overwrites `version=<n>`, so
    * replays rewrite the same result; half-written versions have no
    * `_SUCCESS` marker and are invisible. The value-identical no-op in
    * scd2Apply gives the same redelivery safety `seqCol` gives the
    * SCD-1 path: a redelivered change matches the version it already
    * created and changes nothing. Changes arriving with a ts OLDER
    * than a key's current `valid_from` would invert intervals, so the
    * driver passes scd2Apply's `failOnOutOfOrder` audit (on by
    * default): a time-disordered batch fails the micro-batch loudly —
    * and, because versions are batch-owned and replayable, a fixed
    * upstream can simply replay it — instead of silently corrupting
    * the at-rest history.
    *
    * History schema: change schema minus `tsCol`, plus
    * `valid_from`/`valid_to` of `tsCol`'s type.
    */
  def streamingScd2(spark: SparkSession, changesPath: String,
                    historyPath: String, keyCols: Seq[String],
                    tsCol: String = "ts",
                    schema: Option[org.apache.spark.sql.types.StructType] = None,
                    checkpointDir: Option[String] = None,
                    failOnOutOfOrder: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val changeSchema = schema.getOrElse(spark.read.parquet(changesPath).schema)
    val have = changeSchema.map(_.name).toSet
    val missing = (keyCols :+ tsCol).filterNot(have)
    require(missing.isEmpty,
      s"change schema lacks column(s) ${missing.mkString(", ")}; has ${have.mkString(", ")}")
    val tsType = changeSchema(tsCol).dataType
    val histSchema = org.apache.spark.sql.types.StructType(
      changeSchema.filterNot(_.name == tsCol) ++ Seq(
        org.apache.spark.sql.types.StructField("valid_from", tsType),
        org.apache.spark.sql.types.StructField("valid_to", tsType)))
    batchOwnedStream(spark, changesPath, Some(changeSchema), checkpointDir) {
      (batch, batchId) =>
        val restCols = changeSchema.map(_.name)
          .filterNot(c => keyCols.contains(c) || c == tsCol)
        val latest = batch
          .groupBy(keyCols.map(col): _*)
          .agg(max(struct((tsCol +: restCols).map(col): _*)).as("__m"))
          .select(keyCols.map(col) ++
            (tsCol +: restCols).map(c => col(s"__m.$c")): _*)
        val prev = snapshotVersionBefore(spark, historyPath, batchId,
          histSchema)
        graft.ops.Maintenance.scd2Apply(prev, latest, keyCols, tsCol,
            failOnOutOfOrder = failOnOutOfOrder)
          .write.mode("overwrite").parquet(s"$historyPath/version=$batchId")
    }
  }

  /** Streaming COUNT(DISTINCT) maintenance — the KMV driver: each
    * micro-batch is sketched ([[graft.ops.Maintenance.kmvState]], only
    * the batch is ever hashed) and merged into the previous at-rest
    * state version ([[graft.ops.Maintenance.mergeKmv]]). Because KMV
    * merge ≡ rebuild at any row split, the state after batch `n`
    * EQUALS the batch-free sketch of every row seen so far — the
    * batch-parity spec asserts set equality, not approximation. Read
    * the per-group estimate with [[graft.ops.Maintenance.kmvDistinct]]
    * over [[currentSnapshot]] (exact below k distinct per group,
    * `(k-1)/θ` beyond). Exactly-once at rest via `version=<id>`
    * ownership: a replayed batch re-reads the same predecessor and
    * rewrites the same ≤ k-rows-per-group state — and the merge is
    * additionally IDEMPOTENT (re-merging rows already in the state is
    * a no-op union of a subset), so even cross-version redelivery
    * cannot inflate a distinct count, unlike a count/sum state.
    */
  def streamingDistinctCount(spark: SparkSession, rowsPath: String,
                             statePath: String, keyCols: Seq[String],
                             valueCol: String, k: Int,
                             schema: Option[org.apache.spark.sql.types.StructType] = None,
                             checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val rowSchema = schema.getOrElse(spark.read.parquet(rowsPath).schema)
    val have = rowSchema.map(_.name).toSet
    val missing = (keyCols :+ valueCol).filterNot(have)
    require(missing.isEmpty,
      s"row schema lacks column(s) ${missing.mkString(", ")}; has ${have.mkString(", ")}")
    val stateSchema = org.apache.spark.sql.types.StructType(
      keyCols.map(c => rowSchema(c)) :+
        org.apache.spark.sql.types.StructField("h",
          org.apache.spark.sql.types.LongType))
    batchOwnedStream(spark, rowsPath, Some(rowSchema), checkpointDir) {
      (batch, batchId) =>
        val prev = graft.ops.Maintenance.KmvState(k,
          snapshotVersionBefore(spark, statePath, batchId, stateSchema))
        graft.ops.Maintenance.mergeKmv(prev,
            graft.ops.Maintenance.kmvState(batch, keyCols, valueCol, k),
            keyCols)
          .mins.write.mode("overwrite").parquet(s"$statePath/version=$batchId")
    }
  }

  /** Streaming heavy-hitter maintenance: each micro-batch is sketched
    * into a mergeable Misra-Gries state
    * ([[graft.ops.HeavyHitters.mgState]] — only the batch is scanned)
    * and folded into the previous at-rest state version
    * ([[graft.ops.HeavyHitters.mergeMg]]). The state after batch `n`
    * carries the standard merged-MG deficit bound over EVERY row seen
    * so far (`true - est <= N/(capacity+1)`), so
    * [[graft.ops.HeavyHitters.topKFromState]] over [[currentSnapshot]]
    * reads an exact, completeness-checked top-k without ever
    * re-sketching history. Exactly-once at rest via the same
    * `version=<id>` ownership as the KMV driver: a replayed batch
    * re-reads the same predecessor and rewrites the same state.
    * Unlike KMV, the MG merge is NOT idempotent (counters are additive),
    * so cross-version redelivery of raw rows would inflate counts —
    * the batch-owned versioning is the correctness boundary here.
    */
  def streamingTopKState(spark: SparkSession, rowsPath: String,
                         statePath: String, keyCol: String, capacity: Int,
                         schema: Option[org.apache.spark.sql.types.StructType] = None,
                         checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val rowSchema = schema.getOrElse(spark.read.parquet(rowsPath).schema)
    require(rowSchema.map(_.name).contains(keyCol),
      s"row schema lacks column $keyCol; has ${rowSchema.map(_.name).mkString(", ")}")
    val stateSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType)))
    batchOwnedStream(spark, rowsPath, Some(rowSchema), checkpointDir) {
      (batch, batchId) =>
        val prev = snapshotVersionBefore(spark, statePath, batchId, stateSchema)
        graft.ops.HeavyHitters.mergeMg(prev,
            graft.ops.HeavyHitters.mgState(batch, keyCol, capacity), capacity)
          .write.mode("overwrite").parquet(s"$statePath/version=$batchId")
    }
  }

  /** Retention for the versioned-snapshot stores ([[streamingUpsert]] /
    * [[streamingScd2]]): delete all but the newest `keepLast` COMPLETE
    * versions, plus crashed half-writes older than the oldest survivor
    * (an incomplete dir NEWER than a kept version may be a write in
    * flight and is left alone). Readers pinned to a pruned version must
    * have moved on — same contract as any warehouse VACUUM. Returns the
    * deleted version ids.
    */
  def pruneSnapshotVersions(spark: SparkSession, snapshotPath: String,
                            keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val p = new org.apache.hadoop.fs.Path(snapshotPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val dirs = fs.listStatus(p).filter(st => st.isDirectory &&
      st.getPath.getName.startsWith("version="))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("version=").toLong).toOption
        .map(_ -> st.getPath))
    val complete = dirs.filter { case (_, path) =>
      fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")) }
    val keep = complete.map(_._1).sorted.takeRight(keepLast).toSet
    if (keep.isEmpty) return Seq.empty // nothing complete: prune nothing
    val oldestKept = keep.min
    val doomed = dirs.filter { case (id, _) =>
      (complete.exists(_._1 == id) && !keep.contains(id)) || // old complete
        (!complete.exists(_._1 == id) && id < oldestKept) // stale half-write
    }
    doomed.foreach { case (_, path) => fs.delete(path, true) }
    doomed.map(_._1).sorted.toSeq
  }

  /** The latest written snapshot version (empty with `fallbackSchema`'s
    * shape before the first batch lands).
    */
  def currentSnapshot(spark: SparkSession, snapshotPath: String,
                      fallbackSchema: org.apache.spark.sql.types.StructType)
      : DataFrame =
    snapshotVersionBefore(spark, snapshotPath, Long.MaxValue, fallbackSchema)

  /** Latest COMPLETE `version=<id>` snapshot with `id < ltVersion`; an
    * empty frame of `snapSchema` when none exists (first batch, or a
    * replay of the first batch after a crash mid-write). Complete =
    * the writer's `_SUCCESS` marker is present — a dir half-written by
    * a crash, or currently being overwritten by a replay (overwrite
    * deletes the marker first), is skipped in favor of its
    * predecessor.
    */
  private def snapshotVersionBefore(spark: SparkSession, snapshotPath: String,
                                    ltVersion: Long,
                                    snapSchema: org.apache.spark.sql.types.StructType)
      : DataFrame = {
    val p = new org.apache.hadoop.fs.Path(snapshotPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions =
      if (!fs.exists(p)) Array.empty[Long]
      else fs.listStatus(p).flatMap { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("version=") &&
            fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          scala.util.Try(n.stripPrefix("version=").toLong).toOption
        else None
      }.filter(_ < ltVersion)
    if (versions.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snapSchema)
    else spark.read.parquet(s"$snapshotPath/version=${versions.max}")
  }

  /** Read a `batch=<id>`-partitioned parquet table, returning an empty
    * DataFrame of `fallbackDdl` when the path does not exist yet (a
    * consumer polling before the first micro-batch lands must see an
    * empty table, not PATH_NOT_FOUND). The ownership column is dropped
    * unless `keepBatch` is set. When the path exists but the fallback
    * schema omits `batch`, consumers see exactly the payload schema.
    */
  private def emptySafeParquet(spark: SparkSession, path: String,
                               fallbackDdl: String,
                               keepBatch: Boolean = false): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // "no data yet" covers both a missing path and an existing-but-
    // dataless one (e.g. only the co-located _checkpoint dir, which
    // parquet discovery ignores but schema inference chokes on)
    def visible(f: org.apache.hadoop.fs.Path): Boolean = {
      val n = f.getName; !n.startsWith("_") && !n.startsWith(".")
    }
    def hasData(dir: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(dir).exists { st =>
        visible(st.getPath) &&
          (if (st.isFile) st.getPath.getName.endsWith(".parquet")
           else hasData(st.getPath))
      }
    if (!fs.exists(p) || !hasData(p)) {
      val base = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(fallbackDdl))
      if (keepBatch) base.withColumn("batch", lit(0)) else base
    }
    else if (keepBatch) spark.read.parquet(path)
    else spark.read.parquet(path).drop("batch")
  }

  /** Streaming exact dedup: `dropDuplicates` on the content key with a
    * watermark bounding state — the streaming form of
    * [[graft.ops.Dedup.exact]] for continuous ingestion (state evicts
    * once an id is older than the watermark; at 100 TB/day the state
    * store holds one row per key per watermark window, not the corpus).
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Streaming dedup where duplicates of a key may carry DIFFERENT
    * event times (re-crawl, producer retry, backfill overlap) —
    * [[streamingDedup]]'s `ts`-in-key form would pass those through.
    * `dropDuplicatesWithinWatermark` keeps the first arrival per key
    * and GUARANTEES state eviction once the watermark passes the first
    * occurrence plus `delay`: state is one row per distinct key per
    * delay window, bounded regardless of how late duplicates straggle
    * in (they are only deduped if within the window — the documented
    * trade for bounded state at 100 TB/day).
    */
  def streamingDedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                                    delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join — the streaming form of
    * [[graft.ops.TemporalJoins.rangeJoin]]: pairs of rows in the same
    * key group with `0 < ts_b - ts_a <= maxGap`. Both sides carry a
    * watermark and the join condition bounds the match window in both
    * directions, so the streaming engine can evict a buffered row once
    * the watermark passes its `ts + maxGap` — state is O(rows per gap
    * window), not O(stream). Output columns match the batch operator:
    * `keys`, `*_a`, `*_b`, `gap_us`.
    */
  def streamRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      tsCol: String, maxGap: String = "6 hours",
                      watermark: String = "1 hour"): DataFrame = {
    val lSide = left.select(keys.map(col) ++
      left.columns.filterNot(keys.contains).map(c => col(c).as(s"${c}_a")): _*)
      .withWatermark(s"${tsCol}_a", watermark)
    val rKeys = keys.map(k => s"__rk_$k")
    val rSide = right.select(keys.zip(rKeys).map { case (k, rk) => col(k).as(rk) } ++
      right.columns.filterNot(keys.contains).map(c => col(c).as(s"${c}_b")): _*)
      .withWatermark(s"${tsCol}_b", watermark)
    val cond = keys.zip(rKeys).map { case (k, rk) => col(k) === col(rk) }
      .reduce(_ && _) &&
      col(s"${tsCol}_b") > col(s"${tsCol}_a") &&
      col(s"${tsCol}_b") <= col(s"${tsCol}_a") + expr(s"interval $maxGap")
    lSide.join(rSide, cond)
      .withColumn("gap_us",
        unix_micros(col(s"${tsCol}_b")) - unix_micros(col(s"${tsCol}_a")))
      .drop(rKeys: _*)
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Int, total_value: Double)

  /** Stateful sessionization with a gap timeout: events from one user
    * belong to one session while consecutive events are < `gapMillis`
    * apart. `flatMapGroupsWithState` keeps one small state record per
    * user — the 100 TB-posture design (state size is O(users), not
    * O(events); watermark timeout evicts idle users).
    */
  def sessionize(events: Dataset[Event], gapMillis: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          val sorted = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Vector.newBuilder[Session]
          var cur = state.getOption
          for (e <- sorted) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.end < gapMillis =>
                cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
              case Some(s) =>
                out += Session(userId, new Timestamp(s.start), new Timestamp(s.end),
                  s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
        })
  }

  /** Catalyst-native sessionization via `session_window` — the
    * idiomatic form: a dynamic-gap session window the optimizer merges
    * and the streaming engine maintains under a watermark (out-of-order
    * events within the watermark merge correctly, unlike the
    * arrival-order `flatMapGroupsWithState` form). Emits
    * `(user_id, session_start, session_end_gap, n_events, total_value)`
    * where `session_end_gap` = last event + gap (the window's exclusive
    * end — subtract the gap to compare with [[sessionizeBatch]]).
    */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count("*").as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end_gap"), col("n_events"), col("total_value"))

  /** Batch sessionization of the same semantics via window functions —
    * the oracle-checkable form: a session starts where the gap to the
    * previous event of the same user is >= gapMillis; session id = count
    * of starts so far (running sum); then one aggregate per session.
    * Two shuffles (both on user_id), no state.
    */
  def sessionizeBatch(events: DataFrame, gapMillis: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_start",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) >= gapMillis, 1)
          .otherwise(0))
      .withColumn("session_seq", sum("is_start").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count("*").as("n_events"), sum("value").as("total_value"))
  }
}
