package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance operators — the operational half of a 100 TB
  * pipeline. Continuous ingestion (e.g.
  * [[graft.streaming.StreamingOps.streamingIndexMaintenance]]'s
  * per-micro-batch appends) leaves a table as thousands of small
  * parquet files; every later scan then pays per-file open + footer
  * decode plus a scheduler split per file. Compaction bin-packs the
  * data back toward a target file size.
  */
object Maintenance {

  /** Total data bytes + file count of a parquet directory, RECURSIVE —
    * partitioned layouts (e.g. streaming maintenance's `batch=<id>`
    * ownership dirs) keep their data one level down, and a
    * non-recursive listing would report an empty table.
    */
  def parquetStats(spark: SparkSession, path: String): (Long, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var bytes = 0L
    var n = 0
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { bytes += f.getLen; n += 1 }
    }
    (bytes, n)
  }

  /** Rewrite `inPath` into `outPath` with files bin-packed toward
    * `targetBytes` each (`numFiles = ceil(total / targetBytes)`).
    * Default is `coalesce` — merges co-located read splits with NO
    * shuffle, the right call for the common many-tiny-files case;
    * `shuffle = true` swaps in a round-robin `repartition` when the
    * inputs are so skewed that merged splits would be unbalanced,
    * at the cost of one exchange. Returns the target file count.
    *
    * Output goes to a fresh directory rather than in-place: at scale
    * the swap must be atomic (rename / metastore pointer flip), and
    * overwriting the directory being read is not.
    *
    * Compacting a partitioned layout surfaces the partition dirs as
    * data columns in the flat output — pass them in `dropColumns` when
    * they are pure bookkeeping (e.g. streaming maintenance's `batch`
    * ownership column, which is meaningless once the files are merged;
    * a compacted stats table must not be replayed into without a
    * checkpoint).
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetBytes: Long, shuffle: Boolean = false,
                     dropColumns: Seq[String] = Nil): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val (total, _) = parquetStats(spark, inPath)
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val df = dropColumns.foldLeft(spark.read.parquet(inPath))(_ drop _)
    (if (shuffle) df.repartition(n) else df.coalesce(n))
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** Result of a [[deleteWhere]]: how much of the table the delete
    * physically touched. `filesTotal` counts the layout BEFORE the
    * rewrite.
    */
  final case class DeleteResult(filesTotal: Int, filesRewritten: Int,
                                rowsDeleted: Long)

  /** Targeted-rewrite delete (the GDPR / right-to-be-forgotten
    * primitive): remove every row whose `keyCol` is in `keys` by
    * rewriting ONLY the parquet files that contain a hit, leaving
    * every other file byte-identical on disk. Copy-on-write delete, the
    * Delta/Iceberg `DELETE WHERE` shape.
    *
    * Two scans, both bounded: (1) hit discovery — the `IN` predicate is
    * pushed into the parquet scan, so on a key-sorted / range- or
    * Z-ordered layout the footer min/max stats skip every file whose
    * key range misses the list and the job reads only candidate row
    * groups (plan-asserted in the spec); `_metadata.file_path` names
    * the files that actually contain hits. (2) rewrite — only those
    * files are re-read and anti-filtered; survivors land as new files
    * and the originals are dropped. At 100 TB deleting a handful of
    * keys from a sorted layout rewrites a handful of files, not the
    * table — and the more selective the layout (sort/Z-order), the
    * cheaper the delete, which is why erasure SLAs are a LAYOUT
    * decision, not just a compute one.
    *
    * The swap here is plain FS delete+rename; at scale the same two
    * phases commit through a transaction log / metastore pointer flip
    * (remove(old files) + add(new files) atomically). Append-only
    * readers are unaffected: untouched files keep their identity.
    */
  def deleteWhere(spark: SparkSession, path: String, keyCol: String,
                  keys: Seq[Long]): DeleteResult = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "deleteWhere: empty key list")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, nTotal) = parquetStats(spark, path)
    val hit = col(keyCol).isin(keys: _*)
    // per-file hit counts: one stats-pruned scan; the aggregate output
    // is file-sized (bounded by the candidate file count), never
    // row-sized
    val affected = spark.read.parquet(path)
      .filter(hit)
      .select(col("_metadata.file_path").as("f"))
      .groupBy("f").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (affected.isEmpty) return DeleteResult(nTotal, 0, 0L)
    // flat layouts only: replacement files land directly under `root`,
    // so a hit inside a partition subdirectory would silently lose its
    // partition values on rewrite — refuse instead
    affected.foreach { case (f, _) =>
      val parent = new Path(new java.net.URI(f)).getParent
      require(fs.makeQualified(parent) == fs.makeQualified(root),
        s"deleteWhere supports flat parquet layouts only; $f sits in a " +
          "partition subdirectory (rewrite would drop its partition values)")
    }
    val rowsDeleted = affected.map(_._2).sum
    val tmp = new Path(root.getParent, root.getName + "__delete_tmp")
    // NULL-safe survivor filter: `!isin` is NULL for a NULL key and a
    // bare filter would silently erase NULL-key rows from the rewrite
    spark.read.parquet(affected.map(_._1): _*)
      .filter(col(keyCol).isNull || !hit)
      .write.mode("overwrite").parquet(tmp.toString)
    // publish replacements BEFORE dropping originals, and fail loudly
    // on a false rename (Hadoop FileSystems report failure by boolean,
    // not exception): a partial failure then leaves survivor rows
    // duplicated — recoverable — never destroyed. True atomicity is
    // [[graft.ops.TxLog.deleteWhere]]'s job.
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val parts = fs.listStatus(tmp)
      .filter(_.getPath.getName.endsWith(".parquet"))
    parts.zipWithIndex.foreach { case (st, i) =>
      val target = new Path(root, f"part-del-$uid-$i%05d.parquet")
      require(fs.rename(st.getPath, target),
        s"deleteWhere: rename ${st.getPath} -> $target failed; " +
          "originals left in place, survivors still in " + tmp)
    }
    affected.foreach { case (f, _) =>
      fs.delete(new Path(new java.net.URI(f)), false)
    }
    fs.delete(tmp, true)
    DeleteResult(nTotal, affected.length, rowsDeleted)
  }

  /** Z-order (Morton) key: bit-interleave the low 16 bits of each
    * column, first column taking the most significant position of each
    * bit group. Values are clamped into [0, 2^16) — pre-scale (e.g.
    * `pmod`, range-bucket) anything wider. Up to 3 columns fit a
    * positive long. Pure shift/mask algebra — fully codegen'd, no UDF.
    *
    * Null policy: a NULL dimension (including a non-null value whose
    * cast to long is null, e.g. a non-numeric string) contributes 0 —
    * such rows cluster
    * into the minimum corner of the curve (the multi-dim analogue of
    * NULLS FIRST in a sort layout), keeping their files' min/max stats
    * narrow instead of polluting the max corner. (Without the explicit
    * guard, `greatest`/`least` SKIP nulls, so a null would silently
    * clamp to 65535 — the max corner.)
    */
  def zorderKey(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val bits = 16
    val n = cols.length
    require(n >= 1 && n * bits < 64, s"1..3 columns supported, got $n")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      // guard on the POST-cast value: a non-null input whose cast to
      // long is null (e.g. a non-numeric string) must also take the
      // null policy, not slip past isNull into null-skipping
      // greatest/least (which would clamp it to the max corner)
      asLong = c.cast("long")
      clamped = when(asLong.isNull, lit(0L))
        .otherwise(greatest(lit(0L), least(lit((1L << bits) - 1), asLong)))
      i <- 0 until bits
    } yield shiftleft(shiftright(clamped, i).bitwiseAND(lit(1L)),
      i * n + (n - 1 - j))
    terms.reduce(_ + _)
  }

  /** Rewrite a table Z-ordered on `cols`: range-partition by the
    * interleaved key, sort each partition by it, drop the key. Rows
    * close in ALL `cols` land in the same parquet files, so each
    * file's min/max footer stats are narrow in EVERY dimension and a
    * filter on any one of them prunes most files — the multi-dim
    * analogue of a single-column sort layout (same idea as Delta/
    * Iceberg `OPTIMIZE ZORDER BY`). One shuffle, scales with the scan.
    * Rows with a NULL layout column cluster into the minimum-corner
    * files (see [[zorderKey]]'s null policy).
    */
  def zorderLayout(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
                   numFiles: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    require(cols.nonEmpty, "need at least one layout column")
    df.withColumn("__zkey", zorderKey(cols.map(col): _*))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Column profile — the standard pre-migration / data-quality audit:
    * per column, row count, null count, exact distinct count, and
    * min/max rendered as strings (one uniform output schema across
    * column types). Avoid floating-point columns: engines disagree on
    * decimal text rendering, and a profile exists to be compared.
    *
    * Plan shape: a single multi-`count_distinct` aggregate would make
    * Catalyst EXPAND the input — every row replicated once per
    * profiled column (a 20-column audit of a 100 TB table streams
    * 2.1 PB of rows through one aggregate chain). Instead the
    * non-distinct stats (count / nulls / min / max) run as ONE
    * Expand-free pass, and each column's exact distinct count is its
    * OWN aggregate branch: a column-pruned scan (parquet reads just
    * that column) partial-aggregates map-side, so only the column's
    * distinct values cross the wire. The 1-row branch results
    * broadcast-cross back together — independent stages, no barrier
    * between branches, input rows never replicated.
    */
  def profile(df: org.apache.spark.sql.DataFrame,
              cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "need at least one column to profile")
    // ONE shared total-row count; per-column aggregates after it
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
    // exact distinct per column, one pruned-scan branch each:
    // distinct-collapse shuffles only distinct values, count(col)
    // excludes the null row — identical to count_distinct semantics
    val one = cols.foldLeft(base) { (acc, c) =>
      acc.crossJoin(df.select(col(c).as("__v")).distinct()
        .agg(count(col("__v")).as(s"__nd_$c")))
    }
    // pivot the single stat row to one row per column
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** SCD-1 MERGE: apply a change batch to a snapshot, returning the new
    * snapshot — the Delta/Iceberg `MERGE INTO` pattern as one full
    * outer join (matched + `deleteCol` → drop; matched → change row
    * wins; unmatched change → insert; unmatched snapshot → carry).
    *
    * `changes` must carry every snapshot column plus the boolean
    * `deleteCol`, and be UNIQUE per key (pre-reduce a CDC stream to
    * its latest row per key first — see
    * [[graft.streaming.StreamingOps]] for the streaming half).
    * A delete for an absent key is a no-op, an upsert for an absent
    * key an insert — the usual idempotent-merge contract.
    *
    * With `seqCol` set (it must be a snapshot column), a matched
    * change — update OR delete — only applies when its sequence is
    * STRICTLY newer than the snapshot's: a stale or redelivered change
    * (late backfill, at-least-once replay landing in a later batch)
    * is a no-op instead of silently regressing the key. Unmatched
    * changes always apply.
    *
    * Scale: one shuffle of each side on the key. With the snapshot
    * bucketed on the key at rest ([[graft.ops.Bucketing]]) only the
    * (small) change batch moves; AQE handles the skewed-key case. The
    * anti-join-free single-join form means each side is scanned once.
    */
  def upsert(snapshot: org.apache.spark.sql.DataFrame,
             changes: org.apache.spark.sql.DataFrame,
             keyCols: Seq[String],
             deleteCol: String = "_deleted",
             seqCol: Option[String] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "need at least one key column")
    val valueCols = snapshot.columns.filterNot(keyCols.contains)
    seqCol.foreach(s => require(valueCols.contains(s),
      s"seqCol $s must be a non-key snapshot column"))
    // rename the change side's values: after a full outer join both
    // sides' columns survive and bare names would be ambiguous
    val ch = changes.select(
      (keyCols.map(col) :+ col(deleteCol).as("__del") :+
        lit(true).as("__chp")) ++
        valueCols.map(c => col(c).as(s"__ch_$c")): _*)
    // newer-than-snapshot guard; carry/insert rows (either side absent)
    // pass it vacuously
    val fresh = seqCol match {
      case None => lit(true)
      case Some(s) => col(s).isNull || col(s"__ch_$s") > col(s)
    }
    snapshot
      .join(ch, keyCols, "full_outer")
      // matched-and-deleted rows drop (stale deletes do not); carry
      // rows have no change row (an explicit presence marker, NOT
      // __del.isNotNull — a sloppy NULL delete flag must read as
      // "upsert", never as "carry")
      .filter(!(coalesce(col("__del"), lit(false)) && fresh))
      .select(keyCols.map(col) ++ valueCols.map(c =>
        when(coalesce(col("__chp"), lit(false)) && fresh, col(s"__ch_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** Mergeable histogram state — the QUANTILE sibling of
    * [[mergeCountSum]]: exact fixed-width bucket counts are
    * associative-commutative over any row partition, so appending a
    * batch to a 100 TB fact table re-buckets ONLY the batch and merges
    * two bucket-sized states ([[mergeHistograms]] — exactly equal to
    * re-bucketing the union, unlike `percentile_approx`, whose
    * quantile-summary partials depend on the split). Quantiles read
    * from the merged state carry a deterministic ±`width` error bound
    * — tighten by re-bucketing at a smaller width, never by rescanning
    * history. NULLs are excluded (SQL aggregate semantics).
    *
    * The state CARRIES its bucket width (constructor-checked field,
    * not a caller-remembered convention): bucket ids are meaningless
    * without it, and merging states built at different widths would
    * silently produce garbage counts — [[mergeHistograms]] refuses
    * instead.
    */
  final case class HistState(width: Double,
                             buckets: org.apache.spark.sql.DataFrame) {
    require(width > 0, s"width must be > 0: $width")
  }

  def histogramState(df: org.apache.spark.sql.DataFrame, valueCol: String,
                     width: Double): HistState = {
    import org.apache.spark.sql.functions._
    require(width > 0, s"width must be > 0: $width")
    HistState(width, df.filter(col(valueCol).isNotNull)
      .select(floor(col(valueCol) / width).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n")))
  }

  /** Exact state merge: bucket-sized shuffle, result ≡ re-bucketing
    * the unioned inputs at any split. Widths must agree — bucket id k
    * means [k·width, (k+1)·width), so a cross-width merge is not a
    * histogram of anything.
    */
  def mergeHistograms(a: HistState, b: HistState): HistState = {
    import org.apache.spark.sql.functions._
    require(a.width == b.width,
      s"cannot merge histogram states with different bucket widths: " +
        s"${a.width} vs ${b.width}")
    HistState(a.width, a.buckets.unionByName(b.buckets)
      .groupBy("bucket").agg(sum("n").as("n")))
  }

  /** Quantile read over a histogram state: for each q the LOWER BOUND
    * of the bucket holding the ceil(q·total)-th value — deterministic,
    * engine-portable (integer ranks, no interpolation), true quantile
    * within +width. The cumulative window runs over the BUCKET table —
    * state-sized (value_range / width rows), not corpus-sized; a
    * single-partition sort over it is the intended cost.
    */
  def histogramQuantiles(state: HistState, qs: Seq[Double])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1]: $qs")
    val width = state.width
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = state.buckets.withColumn("__cum", sum("n").over(w))
      .crossJoin(state.buckets.agg(sum("n").as("__total")))
    qs.map { q =>
      cum.filter(col("__cum") >= ceil(lit(q) * col("__total")))
        .orderBy("bucket").limit(1)
        .select(lit(q).as("q"), (col("bucket") * width).as("value_lo"))
    }.reduce(_ unionByName _)
  }

  /** Mergeable DISTINCT-COUNT state: a KMV (k-minimum-values) sketch
    * per group key, stored RELATIONALLY as `(keys..., h)` rows — the
    * k smallest distinct `xxhash64` values of the counted column
    * (public design: Bar-Yossef et al. 2002 "Counting distinct
    * elements in a data stream"; the θ-sketch family). The estimator
    * is EXACT while a group holds fewer than k distinct values (the
    * state IS the distinct hash set) and (k-1)/θ once it saturates,
    * with standard error ≈ 1/√(k−2) — so the same state that is an
    * exact incremental COUNT(DISTINCT) at validation scale degrades
    * gracefully into a bounded-error sketch at 100 TB, where the
    * exact recompute would rescan the corpus.
    *
    * Contract with [[mergeCountSum]]/[[HistState]]: the state of a
    * row-partition union is EXACTLY `mergeKmv` of the parts' states
    * (min-k of a union = min-k of the union of min-k's — proven by
    * the merge-equals-rebuild spec), so appending a batch to a fact
    * table re-sketches ONLY the batch. State size ≤ k rows per group.
    *
    * Build is two-level like a map-side combine: each input partition
    * contracts to its own ≤ k hashes per group FIRST (the
    * `spark_partition_id` pre-group bounds every `collect_set` buffer
    * by one partition's rows), then the global contraction merges
    * partials — no corpus-sized per-key set ever materializes.
    */
  final case class KmvState(k: Int, mins: org.apache.spark.sql.DataFrame) {
    require(k >= 2, s"k must be >= 2: $k")
  }

  def kmvState(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
               valueCol: String, k: Int): KmvState = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "need at least one key column")
    val partial = df
      .filter(col(valueCol).isNotNull)
      .select(keyCols.map(col) :+ xxhash64(col(valueCol)).as("h") :+
        spark_partition_id().as("__pid"): _*)
      .groupBy((keyCols :+ "__pid").map(col): _*)
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("__hs"))
      .select(keyCols.map(col) :+ explode(col("__hs")).as("h"): _*)
    KmvState(k, contract(partial, keyCols, k))
  }

  /** Re-contract a hash-row table to ≤ k smallest distinct per group. */
  private def contract(rows: org.apache.spark.sql.DataFrame,
                       keyCols: Seq[String], k: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    rows.groupBy(keyCols.map(col): _*)
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("__hs"))
      .select(keyCols.map(col) :+ explode(col("__hs")).as("h"): _*)
  }

  /** Merge two KMV states over the same grouping: union + re-contract.
    * Equals the full rebuild over the unioned inputs at ANY split.
    */
  def mergeKmv(a: KmvState, b: KmvState, keyCols: Seq[String]): KmvState = {
    require(a.k == b.k,
      s"cannot merge KMV states with different k: ${a.k} vs ${b.k}")
    KmvState(a.k, contract(a.mins.unionByName(b.mins), keyCols, a.k))
  }

  /** Read the distinct-count estimate per group: exact row count below
    * k; `(k-1)/θ` at saturation, where θ is the k-th smallest hash
    * normalized into (0,1) over the full unsigned 64-bit hash space.
    * Output `n_distinct` is BIGINT (rounded at saturation) so the
    * schema — and, below k, the VALUE — matches an exact
    * `COUNT(DISTINCT)`.
    */
  def kmvDistinct(state: KmvState, keyCols: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // unsigned normalization: map the signed Long hash range onto
    // (0,1); the greatest() floor keeps the (ANSI-throwing) division
    // defined even for the 2^-64 corner hash
    val theta = greatest(
      max(col("h")).cast("double") / pow(lit(2d), lit(64d)) + lit(0.5),
      lit(java.lang.Double.MIN_VALUE))
    state.mins.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), theta.as("__theta"))
      .select(keyCols.map(col) :+
        when(col("__n") < state.k, col("__n"))
          .otherwise(round(lit(state.k - 1) / col("__theta")))
          .cast("long").as("n_distinct"): _*)
  }

  /** SCD-2 MERGE: apply a change batch to a versioned history table,
    * returning the new history — the warehouse `valid_from`/`valid_to`
    * interval pattern ([[upsert]] is the SCD-1 "overwrite in place"
    * sibling). History rows with `validTo IS NULL` are current; a
    * matched change whose values DIFFER closes the current row
    * (`validTo = change ts`) and inserts a new current version
    * (`validFrom = ts`); a value-identical change is a NO-OP (replayed
    * batches are idempotent); an unmatched change inserts a first
    * version; closed history is carried verbatim.
    *
    * `changes` must carry every key/value column plus `tsCol`, be
    * UNIQUE per key (pre-reduce a CDC stream to its latest row per
    * key), have non-null `tsCol`, and each ts must be later than the
    * matched current row's `validFrom` for intervals to stay sane.
    * With `failOnOutOfOrder = true` that precondition is AUDITED: a
    * matched, value-differing change whose ts is `<= validFrom` —
    * i.e. one that would actually WRITE a crossed interval (a
    * value-identical replay is a no-op and exempt) — fails the whole
    * apply loudly instead of silently corrupting history. The audit
    * is a count over the join result the apply materializes anyway
    * (localCheckpoint), so it costs one pass over the current∪batch
    * rows, never the closed bulk — same guard pattern as
    * `Dedup.fuzzyPairs`' hot-bucket `failOnDrop`. At 100 TB an
    * out-of-order CDC batch (late backfill, clock skew, a replayed
    * topic) is a when, not an if — `q_scd2` and the streaming SCD-2
    * driver both opt in.
    *
    * Scale: the key-shuffle join touches ONLY the current rows and the
    * (small) change batch; the closed partition — the bulk of a
    * year-old 100 TB history — is a scan-through union that never
    * shuffles. Value comparison is null-safe (`<=>`), so NULL→value
    * and value→NULL transitions version correctly.
    */
  def scd2Apply(history: org.apache.spark.sql.DataFrame,
                changes: org.apache.spark.sql.DataFrame,
                keyCols: Seq[String],
                tsCol: String = "ts",
                validFrom: String = "valid_from",
                validTo: String = "valid_to",
                failOnOutOfOrder: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "need at least one key column")
    val valueCols = history.columns
      .filterNot(c => keyCols.contains(c) || c == validFrom || c == validTo)
    val cur = history.filter(col(validTo).isNull)
      .withColumn("__curp", lit(true))
    val closed = history.filter(col(validTo).isNotNull)
    val ch = changes.select(
      keyCols.map(k => col(k).as(s"__k_$k")) ++
        valueCols.map(v => col(v).as(s"__ch_$v")) :+
        col(tsCol).cast(history.schema(validFrom).dataType).as("__ts") :+
        lit(true).as("__chp"): _*)
    val cond = keyCols.map(k => cur(k) <=> ch(s"__k_$k")).reduce(_ && _)
    val j = cur.join(ch, cond, "full_outer").localCheckpoint(false)
    val matched = coalesce(col("__curp"), lit(false)) &&
      coalesce(col("__chp"), lit(false))
    val differ = valueCols.map(v => !(col(v) <=> col(s"__ch_$v")))
      .reduceOption(_ || _).getOrElse(lit(false))
    if (failOnOutOfOrder) {
      // only changes that would WRITE can cross an interval; an
      // identical replay is a no-op regardless of its ts
      val bad = j.filter(matched && differ && col("__ts") <= col(validFrom))
        .count()
      require(bad == 0,
        s"scd2Apply: $bad matched change(s) have $tsCol <= the current " +
          s"row's $validFrom — out-of-order CDC batch would write " +
          "crossed intervals; reorder or drop the stale changes")
    }
    val outCols = keyCols ++ valueCols ++ Seq(validFrom, validTo)
    // branch 1: closed-out versions of matched-and-changed current rows
    val closedOut = j.filter(matched && differ)
      .select(keyCols.map(col) ++ valueCols.map(col) :+
        col(validFrom) :+ col("__ts").as(validTo): _*)
    // branch 2: surviving current rows (no change row, or identical)
    val carried = j.filter(coalesce(col("__curp"), lit(false)) &&
        (!coalesce(col("__chp"), lit(false)) || !differ))
      .select(outCols.map(col): _*)
    // branch 3: new current versions (changed or brand-new keys)
    val inserted = j.filter(coalesce(col("__chp"), lit(false)) &&
        (!coalesce(col("__curp"), lit(false)) || differ))
      .select(keyCols.map(k => col(s"__k_$k").as(k)) ++
        valueCols.map(v => col(s"__ch_$v").as(v)) :+
        col("__ts").as(validFrom) :+
        lit(null).cast(history.schema(validTo).dataType).as(validTo): _*)
    closed.select(outCols.map(col): _*)
      .unionByName(closedOut).unionByName(carried).unionByName(inserted)
  }

  /** Incremental aggregate maintenance: merge two partial
    * `(count, sum)` aggregation states into the state of their union —
    * the materialized-view refresh primitive. Appending a batch to a
    * 100 TB fact table re-aggregates ONLY the batch and merges the two
    * group-sized state tables; the base table is never rescanned.
    * count/sum (and anything derived from them — avg = sum/count) are
    * the classic self-merging states; the merged output is exactly the
    * full recompute because both are associative-commutative over a
    * disjoint row partition.
    *
    * One full-outer join on the group key (group-sized sides). Sums
    * must be exact-typed (integer-valued doubles, longs, or decimals)
    * for the merge to be bit-equal to the recompute at any batch
    * split; the zero fill-ins and the merged output are cast to the
    * BASE state's own column types, so a long or decimal sum state
    * merges exactly (never widened through double) and the output
    * schema equals the recompute's. The join is null-safe on the
    * keys (`<=>`), so a NULL group key merges into ONE row — the
    * same grouping a one-pass GROUP BY produces — instead of two
    * never-matching ones.
    */
  def mergeCountSum(base: org.apache.spark.sql.DataFrame,
                    delta: org.apache.spark.sql.DataFrame,
                    keyCols: Seq[String],
                    countCol: String = "n",
                    sumCol: String = "total"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "need at least one key column")
    val cntType = base.schema(countCol).dataType
    val sumType = base.schema(sumCol).dataType
    // rename EVERY delta column: the null-safe join keeps both sides'
    // key columns and bare names would be ambiguous
    val d = delta.select(keyCols.map(k => col(k).as(s"__dk_$k")) :+
      col(countCol).cast(cntType).as("__dn") :+
      col(sumCol).cast(sumType).as("__ds"): _*)
    val cond = keyCols.map(k => base(k) <=> d(s"__dk_$k")).reduce(_ && _)
    base
      .join(d, cond, "full_outer")
      // coalesce re-unifies the keys; a NULL-key group (both sides
      // null) correctly stays null
      .select(keyCols.map(k => coalesce(base(k), d(s"__dk_$k")).as(k)) :+
        (coalesce(col(countCol), lit(0).cast(cntType)) +
          coalesce(col("__dn"), lit(0).cast(cntType)))
          .cast(cntType).as(countCol) :+
        (coalesce(col(sumCol), lit(0).cast(sumType)) +
          coalesce(col("__ds"), lit(0).cast(sumType)))
          .cast(sumType).as(sumCol): _*)
  }

  /** Keyed diff of two snapshot versions — the audit half of the
    * versioned-store family ([[upsert]] / [[scd2Apply]] /
    * `pruneSnapshotVersions`): WHAT changed between version A and
    * version B, as one row per differing key with
    * `status ∈ {added, removed, changed}` and, for changed rows, the
    * sorted comma-joined list of value columns whose values differ
    * (NULL-safe: NULL→x and x→NULL both count as a change, NULL→NULL
    * does not). Unchanged keys produce NO row, so the output is
    * delta-sized — the property that makes snapshot diffing usable as
    * a 100 TB regression gate (diff two daily versions, alert on an
    * unexpected churn profile) rather than a full-table dump.
    *
    * Both inputs must share the full schema; keys must be unique per
    * side (the versioned-store invariant [[upsert]] maintains).
    *
    * Scale: one full outer join — one shuffle of each side on the
    * key, delta-sized output. With both versions bucketed on the key
    * at rest ([[graft.ops.Bucketing]]) the shuffle disappears
    * entirely; there is no window, no collect, no skew-prone
    * secondary key.
    */
  def snapshotDiff(oldSnap: org.apache.spark.sql.DataFrame,
                   newSnap: org.apache.spark.sql.DataFrame,
                   keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "need at least one key column")
    require(oldSnap.columns.sorted.sameElements(newSnap.columns.sorted),
      s"snapshot schemas differ: ${oldSnap.columns.mkString(",")} vs " +
        newSnap.columns.mkString(","))
    val valueCols = oldSnap.columns.filterNot(keyCols.contains).toSeq
    // rename the new side wholesale: after a full outer join both
    // sides' columns survive and bare names would be ambiguous
    val n = newSnap.select(
      keyCols.map(k => col(k).as(s"__nk_$k")) ++
        valueCols.map(c => col(c).as(s"__n_$c")) :+
        lit(true).as("__np"): _*)
    val o = oldSnap.select(
      keyCols.map(col) ++ valueCols.map(col) :+ lit(true).as("__op"): _*)
    val cond = keyCols.map(k => o(k) <=> n(s"__nk_$k")).reduce(_ && _)
    val diffs = valueCols.map(c =>
      when(!(col(c) <=> col(s"__n_$c")), lit(c)))
    o.join(n, cond, "full_outer")
      .withColumn("status",
        when(col("__op").isNull, lit("added"))
          .otherwise(when(col("__np").isNull, lit("removed"))
            .otherwise(lit("changed"))))
      // concat_ws skips NULLs, so unchanged columns vanish; the column
      // order is the (fixed) schema order — deterministic, and sorted
      // there so both engines emit the identical string
      .withColumn("changed_cols",
        when(col("status") === "changed",
          concat_ws(",", valueCols.sorted.map(c =>
            when(!(col(c) <=> col(s"__n_$c")), lit(c))): _*))
          .otherwise(lit(null)))
      .filter(col("status") =!= "changed" || col("changed_cols") =!= "")
      .select(keyCols.map(k => coalesce(col(k), col(s"__nk_$k")).as(k)) :+
        col("status") :+ col("changed_cols"): _*)
  }

  /** Target-size compaction plan: assign items (files, row groups,
    * documents) to output bins of roughly `targetBytes` by cumulative
    * size in a stable total order — `bin = floor(exclusive running
    * byte sum / targetBytes)`, i.e. a bin closes once the running sum
    * crosses the next multiple of the target, and an item straddling
    * a boundary belongs to the bin where it STARTS (so bins can
    * exceed the target by at most one item — the same batching
    * contract as Spark's own file-scan packing; no item is ever
    * split). Returns the input plus `bytes` and `bin`.
    *
    * The running sum comes from [[ScalableRank]]'s two-level
    * exclusive-prefix-sum scaffold, NOT `SUM() OVER (ORDER BY …)` —
    * a global-ORDER window plans as a single-partition sort, the one
    * shape that cannot survive a 100 TB file listing. Here the
    * row-sized work stays partitioned by an explicit monotone bucket
    * of the order key; only per-bucket totals (two longs each) cross
    * one partition.
    *
    * `orderCol` must be integral and unique (it is both the packing
    * order and the prefix-sum tie-break); `sizeCol` must be
    * non-negative.
    */
  def compactionPlan(items: org.apache.spark.sql.DataFrame,
                     orderCol: String, sizeCol: String, targetBytes: Long,
                     bucketWidth: Long = 1L << 10)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    ScalableRank.prefixSumBy(items, orderCol, sizeCol, bucketWidth)
      .withColumn("bytes", col(sizeCol).cast("long"))
      .withColumn("bin", floor(col("__prefix") / targetBytes))
      .drop("__prefix")
  }
}
