package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, BoundReference, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or, StartsWith, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.{FileFormat, FileIndex, HadoopFsRelation, PartitionDirectory, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.TxLog

/** The BATCH read side of the [[graft.ops.TxLog]] table as a first-
  * class Spark data source — the Delta architecture in miniature:
  *
  * {{{
  * spark.read.format("graft-table")
  *   .option("versionAsOf", 3)         // or timestampAsOf (millis)
  *   .load(tableRoot)
  *   .filter($"doc_id" <= 100)         // ANY user filter prunes files
  * }}}
  *
  * The relation is a standard `HadoopFsRelation` over Spark's own
  * vectorized parquet reader — full codegen, standard parquet footer
  * pushdown (`PushedFilters` in the plan) — with TWO custom pieces:
  *
  *  - [[GraftFileIndex]]: file listing comes from the LOG's resolved
  *    snapshot, and `listFiles` prunes it with the log-recorded
  *    per-file `[min,max]` (int + safe-string), null-count, and
  *    partition-value metadata against the query's own data filters —
  *    data skipping from ANY predicate, before any listing or footer
  *    I/O, not just the `snapshotSlice(col, lo, hi)` API;
  *  - [[GraftParquetFileFormat]]: when the snapshot carries active
  *    deletion vectors, each reader asks parquet for the real row
  *    index of every row (the `_tmp_metadata_row_index` machinery, so
  *    row-group/page skipping cannot desynchronize positions) and
  *    drops masked rows INSIDE the scan — merge-on-read semantics with
  *    no plan rewrite, the same shape as Delta's DV-aware file format.
  *
  * Time travel: `versionAsOf` pins a committed version,
  * `timestampAsOf` (epoch millis) resolves through
  * [[TxLog.versionAt]]'s monotonized commit-mtime lookup; at most one
  * of the two may be set.
  *
  * LISTING-FREE PLANNING CAVEATS (the deliberate Delta-style
  * trade-offs): when every live file's size is log-recorded, planning
  * performs ZERO storage round trips — consequently
  * `_metadata.file_modification_time` reports the ADDING commit's
  * publish time (checkpoint-carried files: the checkpoint's), an
  * approximation within a checkpoint interval of the real write time,
  * NOT a storage stat; and a file reclaimed by a concurrent
  * `TxLog.vacuum` fails loudly mid-READ instead of at plan time
  * (inside the vacuum retention window this is unreachable — see
  * [[TxLog.vacuum]]). Consumers needing true storage mtimes should
  * stat the paths in `inputFiles` themselves.
  */
private[sources] object GraftTableRelationBuilder {
  import GraftTableSource.opt

  def createRelation(sqlContext: SQLContext,
                     parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = GraftTableSource.rootOf(parameters)
    val versionAsOf = opt(parameters, "versionAsOf").map(_.toLong)
    val timestampAsOf = opt(parameters, "timestampAsOf").map(_.toLong)
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "graft-table: set at most one of versionAsOf / timestampAsOf")
    val version = versionAsOf
      .orElse(timestampAsOf.map(TxLog.versionAt(root, _)))
    // PRUNED planning for million-file tables: when the version bases
    // on a columnar checkpoint whose sidecar crosses the threshold,
    // the live set is never materialized on the driver — listFiles
    // streams the sidecar and retains only the files the query's own
    // predicate admits ([[GraftPrunedFileIndex]]). Requires the log-
    // recorded schema (every table past its first checkpoint since
    // schema recording has one); anything else takes the eager path.
    val threshold = spark.conf
      .getOption("spark.graft.plan.pruneFileThreshold")
      .map(_.toLong).getOrElse(100000L)
    TxLog.prunedPlanInfo(root, version, threshold) match {
      case Some(pi) if TxLog.tableSchema(root, Some(pi.version)).isDefined =>
        val schema = TxLog.tableSchema(root, Some(pi.version)).get
        relationOver(spark, root,
          new GraftPrunedFileIndex(spark, root, pi), schema, pi.dvFiles)
      case _ =>
        val snap = TxLog.resolve(root, version)
        val paths = snap.files.map(f => s"$root/$f")
        // the table schema from the LOG's recorded schema action — one
        // metadata read, no footer sweep of the live set (the 100 TB
        // planning cost this action exists to remove). Tables whose
        // commits predate schema recording fall back to the footer-
        // merged schema; either way evolution reads missing columns as
        // null. An EMPTY live set (everything deleted / overwritten
        // away) is a legitimate head — it reads as zero rows — but only
        // the log can name its schema: with no files there is no
        // footer to fall back to
        val schema = TxLog.tableSchema(root, Some(snap.version)).getOrElse {
          require(snap.files.nonEmpty,
            s"version ${snap.version} of $root has no live files and no " +
              "log-recorded schema to shape an empty relation")
          spark.read.option("mergeSchema", "true").parquet(paths: _*).schema
        }
        relationOver(spark, root, new GraftFileIndex(spark, root, snap),
          schema, snap.dvFiles)
    }
  }

  /** The shared relation tail: DV-mask broadcast + HadoopFsRelation
    * over either file index.
    */
  private def relationOver(spark: SparkSession, root: String,
                           index: FileIndex,
                           schema: StructType,
                           dvFiles: Seq[String]): BaseRelation = {
    // the active masks as (file name -> sorted row positions), KB-
    // scale by the purge/compaction contract (see TxLog.applyDvMask);
    // shipped to readers as an explicit BROADCAST — one copy per
    // executor via the torrent protocol, instead of riding every
    // task's serialized reader closure
    TxLog.dvGuard(spark, root, dvFiles)
    val mask: Map[String, Array[Long]] =
      if (dvFiles.isEmpty) Map.empty
      else spark.read.parquet(dvFiles.map(f => s"$root/$f"): _*)
        .select("file", "pos").distinct().collect()
        .groupBy(_.getString(0))
        .map { case (f, rows) => f -> rows.map(_.getLong(1)).sorted }
    val maskBc = spark.sparkContext.broadcast(mask)
    // a masked table arms the plan-time batch/row split on this
    // session (idempotent): unmasked files regain columnar reads
    // through it — see [[MaskedTableSplit]]
    if (mask.nonEmpty) MaskedTableSplit.ensureInstalled(spark)
    HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new GraftParquetFileFormat(maskBc,
        TxLog.columnMapping(schema)),
      options = Map("mergeSchema" -> "true"))(spark)
  }
}

/** File listing from the transaction log: the live set of one resolved
  * snapshot, pruned in `listFiles` by the log's recorded per-file
  * stats against the query's data filters. Skipping is always
  * conservative — a file without usable stats for a referenced column
  * is kept, and Spark re-applies the full predicate to every row — so
  * pruning is an optimization, never the filter.
  */
class GraftFileIndex(spark: SparkSession, root: String,
                     snap: TxLog.Snapshot) extends FileIndex {

  /** The snapshot's live files / session — what [[MaskedTableSplit]]
    * needs to partition the scan, and [[restrictTo]] to rebuild the
    * halves.
    */
  private[sources] def liveFiles: Seq[String] = snap.files
  private[sources] def session: SparkSession = spark

  /** This index restricted to a subset of the snapshot's files — same
    * version, same skipping stats (entry-cached, so the rebuild costs
    * no metadata I/O), listing only the subset.
    */
  private[sources] def restrictTo(files: Seq[String]): GraftFileIndex =
    new GraftFileIndex(spark, root, snap.copy(files = files))

  // all four skipping indexes from ONE replay of checkpoint + suffix
  // at the snapshot's own version — O(checkpoint interval) metadata
  // reads, the same cost resolve pays, however long the log has lived
  private val idx = TxLog.skippingIndex(root, Some(snap.version))

  // logical -> physical: stats/partition values are keyed by the
  // PHYSICAL column names files store; query filters carry logical
  // names (empty map = identity on every unmapped table)
  private val colMap = TxLog.columnMappingAt(root, Some(snap.version))
  private def phys(c: String): String = colMap.getOrElse(c, c)

  // the hidden partition-transform spec: source-column filters imply
  // skipping predicates on the hidden partition columns
  // ([[graft.ops.PartitionTransforms.expand]])
  private val ptspec =
    TxLog.partitionTransforms(root, Some(snap.version))
  private val intStats = idx.int
  private val strStats = idx.str
  private val nullStats = idx.nulls
  private val partVals = idx.parts

  /** Did this index plan WITHOUT touching storage? True when every
    * live file's size is log-recorded (commits since the size action
    * + checkpoint carry) — the 1M-file planning posture: zero
    * listStatus round trips, statuses fabricated from the log,
    * exactly Delta's listing-free planning. Exposed for specs.
    */
  private[graft] val usedLogSizes: Boolean = {
    val sizes = idx.sizes
    snap.files.nonEmpty && snap.files.forall(sizes.contains)
  }

  // file statuses for split planning: fabricated from the LOG's
  // recorded sizes when every live file has one (no storage I/O at
  // all — a concurrently vacuumed file then fails loudly in the
  // reader instead of at plan time, the same contract Delta has);
  // otherwise one statusful listing, BATCHED by parent directory —
  // one listStatus per directory, O(directories) round trips, not
  // O(live files). Fabricated mtimes are the ADDING commit's publish
  // time (checkpoint-carried files: the checkpoint's) — the
  // approximation `_metadata.file_modification_time` reports when no
  // storage stat happened, within a checkpoint interval of the real
  // write time
  private val statuses: Seq[(String, FileStatus)] =
    if (usedLogSizes) {
      val sizes = idx.sizes
      val mtimes = idx.mtimes
      snap.files.sorted.map(f =>
        f -> new FileStatus(sizes(f), false, 1, 128L << 20,
          mtimes.getOrElse(f, 0L), new Path(s"$root/$f")))
    } else {
      val conf = spark.sessionState.newHadoopConf()
      snap.files.groupBy(f => f.take(f.lastIndexOf('/').max(0)))
        .toSeq.flatMap { case (dir, files) =>
          val dirPath = new Path(s"$root/$dir")
          val listed = dirPath.getFileSystem(conf).listStatus(dirPath)
            .map(st => st.getPath.getName -> st).toMap
          files.map { f =>
            val name = f.substring(f.lastIndexOf('/') + 1)
            f -> listed.getOrElse(name,
              throw new IllegalStateException(
                s"live file $f of $root is missing on storage " +
                  "(vacuumed concurrently?)"))
          }
        }.sortBy(_._1) // deterministic listing order
    }

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    // hidden-transform expansion: a filter on `ts` also prunes on
    // `_tp_days_ts` through the recorded partition values
    val filters = dataFilters ++
      graft.ops.PartitionTransforms.expand(dataFilters, ptspec)
    val kept = statuses.filter { case (f, _) =>
      filters.forall(StatsPrune.mayMatch(view(f), _))
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
  }

  private def view(file: String): StatsPrune.View = new StatsPrune.View {
    def intRange(c: String): Option[(Long, Long)] =
      intStats.get(file).flatMap(_.get(phys(c)))
    def strRange(c: String): Option[(String, String)] =
      strStats.get(file).flatMap(_.get(phys(c)))
        .orElse(partVals.get(file).flatMap(_.get(phys(c)))
          .map(v => (v, v)))
    def nulls(c: String): Option[(Long, Long)] =
      nullStats.get(file).flatMap { case (rows, m) =>
        m.get(phys(c)).map(n => (rows, n))
      }
  }
}

/** The skipping predicate shared by both file indexes: could a file
  * with the given recorded stats hold a row satisfying `filter`?
  * Unknown shapes and stat-less columns answer true (read it) —
  * pruning is an optimization, never the filter.
  */
private[sources] object StatsPrune {

  /** One file's recorded planning stats, however they are stored. */
  trait View {
    def intRange(c: String): Option[(Long, Long)]
    /** String [min,max]; partition values count as point ranges. */
    def strRange(c: String): Option[(String, String)]
    /** (row count, null count) when both are recorded. */
    def nulls(c: String): Option[(Long, Long)]
  }

  def mayMatch(v: View, filter: Expression): Boolean = {
    def attrOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      // a cast that only widens preserves order against the recorded
      // longs; anything else is conservatively opaque
      case Cast(a: AttributeReference, LongType, _, _) => Some(a.name)
      case _ => None
    }
    def litLong(l: Literal): Option[Long] = l.value match {
      case null => None
      case x: java.lang.Long => Some(x)
      case x: java.lang.Integer => Some(x.toLong)
      case x: java.lang.Short => Some(x.toLong)
      case _ => None
    }
    def litStr(l: Literal): Option[String] = l.value match {
      case x: UTF8String => Some(x.toString)
      case _ => None
    }
    // can a value cmp v hold for some value in the recorded range?
    def cmp(attr: Expression, lit: Literal,
            intOk: ((Long, Long), Long) => Boolean,
            strOk: ((String, String), String) => Boolean): Boolean =
      attrOf(attr).forall { c =>
        val byInt = litLong(lit)
          .forall(x => v.intRange(c).forall(r => intOk(r, x)))
        val byStr = litStr(lit)
          .forall(x => v.strRange(c).forall(r => strOk(r, x)))
        byInt && byStr
      }
    def rec(filter: Expression): Boolean = filter match {
      case And(l, r) => rec(l) && rec(r)
      case Or(l, r) => rec(l) || rec(r)
      case EqualTo(a, l: Literal) =>
        cmp(a, l, { case ((mn, mx), x) => x >= mn && x <= mx },
          { case ((mn, mx), x) => x >= mn && x <= mx })
      case EqualTo(l: Literal, a) => rec(EqualTo(a, l))
      case EqualNullSafe(a, l: Literal) => rec(EqualTo(a, l))
      case EqualNullSafe(l: Literal, a) => rec(EqualTo(a, l))
      case GreaterThan(a, l: Literal) =>
        cmp(a, l, { case ((_, mx), x) => mx > x },
          { case ((_, mx), x) => mx > x })
      case GreaterThan(l: Literal, a) => rec(LessThan(a, l))
      case GreaterThanOrEqual(a, l: Literal) =>
        cmp(a, l, { case ((_, mx), x) => mx >= x },
          { case ((_, mx), x) => mx >= x })
      case GreaterThanOrEqual(l: Literal, a) =>
        rec(LessThanOrEqual(a, l))
      case LessThan(a, l: Literal) =>
        cmp(a, l, { case ((mn, _), x) => mn < x },
          { case ((mn, _), x) => mn < x })
      case LessThan(l: Literal, a) => rec(GreaterThan(a, l))
      case LessThanOrEqual(a, l: Literal) =>
        cmp(a, l, { case ((mn, _), x) => mn <= x },
          { case ((mn, _), x) => mn <= x })
      case LessThanOrEqual(l: Literal, a) =>
        rec(GreaterThanOrEqual(a, l))
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(x => rec(EqualTo(a, x.asInstanceOf[Literal])))
      case InSet(a, vs) =>
        vs.exists(x => rec(EqualTo(a, Literal.create(x, a.dataType))))
      case StartsWith(a, l: Literal) =>
        attrOf(a).forall { c =>
          litStr(l).forall { p =>
            v.strRange(c).forall { case (mn, mx) =>
              // some s in [mn,mx] starts with p  <=>  the range
              // overlaps [p, p + maxSuffix]
              mx >= p && mn <= p + "￿"
            }
          }
        }
      case IsNull(a) =>
        attrOf(a).forall(c => v.nulls(c).forall { case (_, n) => n > 0 })
      case IsNotNull(a) =>
        attrOf(a).forall(c =>
          v.nulls(c).forall { case (rows, n) => n < rows })
      case _ => true
    }
    rec(filter)
  }
}

/** Catalyst data filters translated to a parquet [[FilterPredicate]]
  * over the checkpoint sidecar's FLAT synopsis columns — what lets the
  * pruned planner skip whole sidecar ROW GROUPS instead of decoding
  * every row per planned query. Strictly CONSERVATIVE relative to
  * [[StatsPrune.mayMatch]]: anything not safely translatable (unknown
  * shapes, non-ASCII string literals — parquet compares binary columns
  * in unsigned BYTE order while StatsPrune compares in UTF-16 code
  * units, and the two orders agree only when one side is pure ASCII —
  * StartsWith, null checks) contributes "admit", and a row with no
  * recorded stats always survives (every leaf carries an IS NULL arm).
  * StatsPrune remains the authority on every row the filter yields.
  */
private[sources] object SidecarPushdown {
  import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
  import org.apache.parquet.io.api.Binary

  def translate(filters: Seq[Expression], phys: String => String,
                syn: graft.ops.TxLog.SidecarSynopsis)
      : Option[(FilterPredicate, Set[String])] = {
    if (filters.isEmpty || syn.cols.isEmpty) return None
    val intIdx = syn.cols.zipWithIndex.collect {
      case ((p, true), i) => p -> i
    }.toMap
    val strIdx = syn.cols.zipWithIndex.collect {
      case ((p, false), i) => p -> i
    }.toMap
    val refs = scala.collection.mutable.Set.empty[String]

    def attrOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case Cast(a: AttributeReference, LongType, _, _) => Some(a.name)
      case _ => None
    }
    def litLong(l: Literal): Option[Long] = l.value match {
      case null => None
      case x: java.lang.Long => Some(x)
      case x: java.lang.Integer => Some(x.toLong)
      case x: java.lang.Short => Some(x.toLong)
      case _ => None
    }
    def litStr(l: Literal): Option[String] = l.value match {
      case x: UTF8String =>
        val s = x.toString
        if (s.forall(_ < 0x80)) Some(s) else None
      case _ => None
    }
    // admit iff stats absent OR the [min,max] range satisfies
    // (loCond on zi{i}x / hiCond on zi{i}n) — the same shape as
    // StatsPrune's cmp, expressed against the flat columns
    def intLeaf(i: Int)(cond: (org.apache.parquet.filter2.predicate
        .Operators.LongColumn, org.apache.parquet.filter2.predicate
        .Operators.LongColumn) => FilterPredicate): FilterPredicate = {
      val (zn, zx) = (FilterApi.longColumn(s"zi${i}n"),
        FilterApi.longColumn(s"zi${i}x"))
      refs += s"zi${i}n"; refs += s"zi${i}x"
      FilterApi.or(FilterApi.eq(zn, null.asInstanceOf[java.lang.Long]),
        cond(zn, zx))
    }
    def strLeaf(i: Int)(cond: (org.apache.parquet.filter2.predicate
        .Operators.BinaryColumn, org.apache.parquet.filter2.predicate
        .Operators.BinaryColumn) => FilterPredicate): FilterPredicate = {
      val (zn, zx) = (FilterApi.binaryColumn(s"zs${i}n"),
        FilterApi.binaryColumn(s"zs${i}x"))
      refs += s"zs${i}n"; refs += s"zs${i}x"
      FilterApi.or(FilterApi.eq(zn, null.asInstanceOf[Binary]),
        cond(zn, zx))
    }
    def both(a: Option[FilterPredicate], b: Option[FilterPredicate])
        : Option[FilterPredicate] = (a, b) match {
      case (Some(x), Some(y)) => Some(FilterApi.and(x, y))
      case (x, y) => x.orElse(y)
    }
    // value-vs-range leaves per comparison kind; None = untranslatable
    // = admit. A numeric literal binds the int synopsis, an ASCII
    // string literal the string synopsis (mirrors StatsPrune's
    // byInt/byStr conjunction — at most one applies per literal).
    def cmpLeaf(attr: Expression, l: Literal,
                intC: (Long, org.apache.parquet.filter2.predicate
                  .Operators.LongColumn, org.apache.parquet.filter2
                  .predicate.Operators.LongColumn) => FilterPredicate,
                strC: (Binary, org.apache.parquet.filter2.predicate
                  .Operators.BinaryColumn, org.apache.parquet.filter2
                  .predicate.Operators.BinaryColumn) => FilterPredicate)
        : Option[FilterPredicate] =
      attrOf(attr).flatMap { c =>
        val p = phys(c)
        val viaInt = for {
          x <- litLong(l); i <- intIdx.get(p)
        } yield intLeaf(i)((zn, zx) => intC(x, zn, zx))
        val viaStr = for {
          s <- litStr(l); i <- strIdx.get(p)
        } yield strLeaf(i)((zn, zx) => strC(Binary.fromString(s), zn, zx))
        both(viaInt, viaStr)
      }
    def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    def rec(e: Expression): Option[FilterPredicate] = e match {
      case And(l, r) => both(rec(l), rec(r))
      case Or(l, r) =>
        for { a <- rec(l); b <- rec(r) } yield FilterApi.or(a, b)
      case EqualTo(a, l: Literal) =>
        cmpLeaf(a, l,
          (x, zn, zx) => FilterApi.and(FilterApi.ltEq(zn, jl(x)),
            FilterApi.gtEq(zx, jl(x))),
          (b, zn, zx) => FilterApi.and(FilterApi.ltEq(zn, b),
            FilterApi.gtEq(zx, b)))
      case EqualTo(l: Literal, a) => rec(EqualTo(a, l))
      case EqualNullSafe(a, l: Literal) => rec(EqualTo(a, l))
      case EqualNullSafe(l: Literal, a) => rec(EqualTo(a, l))
      case GreaterThan(a, l: Literal) =>
        cmpLeaf(a, l, (x, _, zx) => FilterApi.gt(zx, jl(x)),
          (b, _, zx) => FilterApi.gt(zx, b))
      case GreaterThan(l: Literal, a) => rec(LessThan(a, l))
      case GreaterThanOrEqual(a, l: Literal) =>
        cmpLeaf(a, l, (x, _, zx) => FilterApi.gtEq(zx, jl(x)),
          (b, _, zx) => FilterApi.gtEq(zx, b))
      case GreaterThanOrEqual(l: Literal, a) =>
        rec(LessThanOrEqual(a, l))
      case LessThan(a, l: Literal) =>
        cmpLeaf(a, l, (x, zn, _) => FilterApi.lt(zn, jl(x)),
          (b, zn, _) => FilterApi.lt(zn, b))
      case LessThan(l: Literal, a) => rec(GreaterThan(a, l))
      case LessThanOrEqual(a, l: Literal) =>
        cmpLeaf(a, l, (x, zn, _) => FilterApi.ltEq(zn, jl(x)),
          (b, zn, _) => FilterApi.ltEq(zn, b))
      case LessThanOrEqual(l: Literal, a) =>
        rec(GreaterThanOrEqual(a, l))
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        vs.map(x => rec(EqualTo(a, x.asInstanceOf[Literal])))
          .reduce((l, r) => for { x <- l; y <- r }
            yield FilterApi.or(x, y))
      case InSet(a, vs) if vs.nonEmpty =>
        vs.toSeq.map(x =>
            rec(EqualTo(a, Literal.create(x, a.dataType))))
          .reduce((l, r) => for { x <- l; y <- r }
            yield FilterApi.or(x, y))
      case _ => None
    }
    // conjuncts translate independently — an untranslatable one just
    // drops out (it still applies through StatsPrune and the query's
    // own row-level filter)
    filters.flatMap(rec).reduceOption(FilterApi.and)
      .map(p => (p, refs.toSet))
  }
}

/** The MILLION-FILE planning path: a [[org.apache.spark.sql.execution.datasources.FileIndex]]
  * that never materializes the live set. Where [[GraftFileIndex]]
  * loads the whole skipping index eagerly (right for the thousands-
  * of-files common case — and what masked-table splitting needs),
  * this index holds only the SUFFIX state (commits after the base
  * checkpoint — small by the checkpoint cadence) and answers
  * `listFiles` by STREAMING the checkpoint sidecar, retaining exactly
  * the files the query's own filters admit: the Delta move of pushing
  * the query's partition/stats predicates into the checkpoint read.
  * A selective query over a 1M-file table costs one sidecar stream
  * (MBs, row-at-a-time) and holds the matching fraction of entries;
  * the EntryCache is never asked to host an O(table) LogEntry at all.
  * Chosen by `createRelation` when the sidecar row count crosses
  * `spark.graft.plan.pruneFileThreshold` (default 100k).
  */
class GraftPrunedFileIndex(spark: SparkSession, root: String,
                           pi: TxLog.PrunedPlanInfo) extends FileIndex {

  // last-wins liveness + suffix-recorded stats of every path a
  // suffix commit touched ([[TxLog.suffixStateOf]] — shared with the
  // keyed mutation paths): absent = the checkpoint's verdict stands,
  // true = live with suffix stats, false = removed
  private val sfx = TxLog.suffixStateOf(pi.suffix)
  private def touched: Map[String, Boolean] = sfx.touched
  private def suffixLive: Seq[String] = sfx.live
  private def sInt = sfx.int
  private def sStr = sfx.str
  private def sNulls = sfx.nulls
  private def sParts = sfx.parts
  private def sSizes = sfx.sizes
  private def sMtimes = sfx.mtimes

  private val colMap = TxLog.columnMappingAt(root, Some(pi.version))
  private def phys(c: String): String = colMap.getOrElse(c, c)

  private def suffixView(f: String): StatsPrune.View =
    new StatsPrune.View {
      def intRange(c: String): Option[(Long, Long)] =
        sInt.get(f).flatMap(_.get(phys(c)))
      def strRange(c: String): Option[(String, String)] =
        sStr.get(f).flatMap(_.get(phys(c)))
          .orElse(sParts.get(f).flatMap(_.get(phys(c)))
            .map(x => (x, x)))
      def nulls(c: String): Option[(Long, Long)] =
        sNulls.get(f).flatMap { case (rows, m) =>
          m.get(phys(c)).map(n => (rows, n))
        }
    }

  private def feView(fe: TxLog.FileEntry): StatsPrune.View =
    new StatsPrune.View {
      def intRange(c: String): Option[(Long, Long)] =
        fe.int.get(phys(c))
      def strRange(c: String): Option[(String, String)] =
        fe.str.get(phys(c)).orElse(fe.parts.get(phys(c))
          .map(x => (x, x)))
      def nulls(c: String): Option[(Long, Long)] =
        for { r <- fe.rows; n <- fe.nulls.get(phys(c)) } yield (r, n)
    }

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def partitionSchema: StructType = StructType(Nil)

  // from the checkpoint JSON's recorded totals (one cached sweep on
  // pre-totals checkpoints) + suffix deltas — never a per-query scan.
  // DELIBERATE OVERESTIMATE: suffix commits record sizes only for
  // their own adds, so a suffix REMOVE of a checkpoint-base file (the
  // common delete/compact case) subtracts nothing here — looking the
  // removed bytes up would cost the sidecar scan this field exists to
  // avoid. Overestimating is the safe direction for a planner input:
  // it can only suppress a broadcast that might have been legal,
  // never broadcast a table that is too big; the next checkpoint's
  // recorded totals re-tighten it.
  override lazy val sizeInBytes: Long = {
    val removedB = touched.collect { case (p, false) => p }
      .map(p => sSizes.getOrElse(p, 0L)).sum
    TxLog.sidecarTotalBytes(root, pi.cp) - removedB +
      suffixLive.map(p => sSizes.getOrElse(p, 0L)).sum
  }

  override def inputFiles: Array[String] = {
    val out = Array.newBuilder[String]
    TxLog.scanCheckpointSidecar(root, pi.cp) { fe =>
      if (!touched.contains(fe.path)) out += s"$root/${fe.path}"
      false
    }
    out ++= suffixLive.map(p => s"$root/$p")
    out.result()
  }

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val sized = Seq.newBuilder[FileStatus]
    val unsized = Seq.newBuilder[String]
    def emit(path: String, bytes: Option[Long], mtime: Long): Unit =
      bytes match {
        case Some(b) => sized += new FileStatus(b, false, 1, 128L << 20,
          mtime, new Path(s"$root/$path"))
        case None => unsized += path
      }
    // base: stream the sidecar, materializing ONLY survivors — paths
    // the suffix touched are skipped here (their final state, stats
    // included, is the suffix's to declare). The query's predicate
    // ALSO pushes into the parquet read itself ([[SidecarPushdown]]):
    // row groups the sidecar's own statistics refute are never
    // decoded, so a selective query over a sorted 10M-row sidecar
    // costs a footer read plus the matching groups, not a full
    // row-at-a-time decode per planned query
    // hidden-transform expansion first: the rewritten partition
    // predicates prune through BOTH layers — the row-group pushdown
    // (the synopsis carries partition columns) and the per-row
    // StatsPrune pass
    val filters = dataFilters ++ graft.ops.PartitionTransforms
      .expand(dataFilters,
        TxLog.partitionTransforms(root, Some(pi.version)))
    val pd = SidecarPushdown.translate(filters, phys,
      TxLog.sidecarSynopsisAt(root, pi.cp))
    TxLog.scanCheckpointSidecar(root, pi.cp, pd) { fe =>
      !touched.contains(fe.path) &&
        filters.forall(StatsPrune.mayMatch(feView(fe), _))
    }.foreach(fe => emit(fe.path, fe.bytes, pi.cpMtime))
    // suffix-added files (small): same predicate over the commit-
    // recorded stats
    suffixLive
      .filter(p => filters.forall(
        StatsPrune.mayMatch(suffixView(p), _)))
      .foreach(p => emit(p, sSizes.get(p), sMtimes.getOrElse(p, 0L)))
    // legacy files without log-recorded sizes: one batched listing
    // per parent directory, never one stat per file
    val fallback = GraftPrunedFileIndex.listBatched(spark, root,
      unsized.result())
    Seq(PartitionDirectory(InternalRow.empty,
      (sized.result() ++ fallback).toArray))
  }
}

private[sources] object GraftPrunedFileIndex {
  /** Statuses for files whose sizes the log does not record: one
    * listStatus per parent DIRECTORY (O(directories) round trips).
    * A listed-but-missing live file fails loudly — vacuumed under a
    * concurrent reader.
    */
  def listBatched(spark: SparkSession, root: String,
                  files: Seq[String]): Seq[FileStatus] =
    if (files.isEmpty) Seq.empty
    else {
      val conf = spark.sessionState.newHadoopConf()
      files.groupBy(f => f.take(f.lastIndexOf('/').max(0)))
        .toSeq.sortBy(_._1).flatMap { case (dir, fs) =>
          val dirPath = new Path(s"$root/$dir")
          val listed = dirPath.getFileSystem(conf).listStatus(dirPath)
            .map(st => st.getPath.getName -> st).toMap
          fs.sorted.map { f =>
            val name = f.substring(f.lastIndexOf('/') + 1)
            listed.getOrElse(name,
              throw new IllegalStateException(
                s"live file $f of $root is missing on storage " +
                  "(vacuumed concurrently?)"))
          }
        }
    }
}

/** Spark's parquet format with the table's deletion-vector masks
  * applied INSIDE the scan. `maskBc` broadcasts (data-file NAME →
  * sorted masked row positions) — one copy per executor, not one per
  * task closure. When the mask is empty this is exactly
  * ParquetFileFormat; when not, the reader SPLITS PER FILE:
  *
  *  - a file with no active mask entry takes the base reader with no
  *    row-index column decoded;
  *  - a masked file's reader appends parquet's row-index column to the
  *    read schema (real positions, immune to row-group/page skipping
  *    by pushed filters), drops masked rows, and projects the column
  *    back off.
  *
  * EVERY per-file path emits OWNED UnsafeRow copies — with batching
  * off the readers yield ColumnarBatchRow VIEWS over a recycled
  * batch, and the row-based metadata-column machinery can hold one
  * across a batch boundary (fuzz-caught NPE). Do NOT "optimize" the
  * unmasked branch back to a raw passthrough.
  *
  * Batch (columnar) output is disabled on masked tables as a whole:
  * one FileSourceScanExec's readers must all yield the same shape, so
  * a per-file batch/row mix is not expressible in a V1 scan — but with
  * `supportBatch` off Spark's parquet reader still DECODES through the
  * vectorized path and iterates rows off the column batches, so the
  * cost is the lost batch-at-a-time codegen, not vectorized decode.
  */
class GraftParquetFileFormat(
    maskBc: org.apache.spark.broadcast.Broadcast[Map[String, Array[Long]]],
    mapping: Map[String, String] = Map.empty)
    extends ParquetFileFormat {

  /** Masked data-file NAMES — [[MaskedTableSplit]]'s partition key. */
  private[sources] def maskedNames: Set[String] = maskBc.value.keySet

  /** logical -> physical column mapping — [[MaskedTableSplit]] hands
    * it to the clean half's format.
    */
  private[sources] def colMapping: Map[String, String] = mapping

  // under column mapping, the PHYSICAL parquet layer (read schema,
  // pushed footer filters) speaks physical names; the rows come back
  // POSITIONALLY, so nothing above the reader changes
  private def physFields(st: StructType): StructType =
    if (mapping.isEmpty) st
    else StructType(st.fields.map(f =>
      mapping.get(f.name).map(p => f.copy(name = p)).getOrElse(f)))

  /** A pushed filter with attribute names translated to physical —
    * None drops the filter (pushdown is an optimization; Spark
    * re-applies the exact predicate above the scan).
    */
  private def physFilter(f: org.apache.spark.sql.sources.Filter)
      : Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.{sources => sf}
    def ph(a: String): String = mapping.getOrElse(a, a)
    f match {
      case sf.EqualTo(a, v) => Some(sf.EqualTo(ph(a), v))
      case sf.EqualNullSafe(a, v) => Some(sf.EqualNullSafe(ph(a), v))
      case sf.GreaterThan(a, v) => Some(sf.GreaterThan(ph(a), v))
      case sf.GreaterThanOrEqual(a, v) =>
        Some(sf.GreaterThanOrEqual(ph(a), v))
      case sf.LessThan(a, v) => Some(sf.LessThan(ph(a), v))
      case sf.LessThanOrEqual(a, v) => Some(sf.LessThanOrEqual(ph(a), v))
      case sf.In(a, vs) => Some(sf.In(ph(a), vs))
      case sf.IsNull(a) => Some(sf.IsNull(ph(a)))
      case sf.IsNotNull(a) => Some(sf.IsNotNull(ph(a)))
      case sf.StringStartsWith(a, v) =>
        Some(sf.StringStartsWith(ph(a), v))
      case sf.StringEndsWith(a, v) => Some(sf.StringEndsWith(ph(a), v))
      case sf.StringContains(a, v) => Some(sf.StringContains(ph(a), v))
      case sf.And(l, r) =>
        for { a <- physFilter(l); b <- physFilter(r) } yield sf.And(a, b)
      case sf.Or(l, r) =>
        for { a <- physFilter(l); b <- physFilter(r) } yield sf.Or(a, b)
      case sf.Not(c) => physFilter(c).map(sf.Not)
      case sf.AlwaysTrue() => Some(f)
      case sf.AlwaysFalse() => Some(f)
      case _ => None
    }
  }

  // ParquetFileFormat.equals is class-based — two Graft formats with
  // DIFFERENT masks would compare equal and could alias in plan/scan
  // reuse. Reference equality keeps every masked relation distinct.
  override def equals(other: Any): Boolean = other match {
    case g: GraftParquetFileFormat => g eq this
    case _ => false
  }
  override def hashCode(): Int = System.identityHashCode(this)

  override def supportBatch(sparkSession: SparkSession,
                            schema: StructType): Boolean =
    maskBc.value.isEmpty && super.supportBatch(sparkSession, schema)

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      options: Map[String, String],
      hadoopConf: org.apache.hadoop.conf.Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    // column mapping: the parquet layer reads PHYSICAL names; the
    // output rows are positional, so the logical plan above is
    // untouched (the row-index temp column is not a table column and
    // never maps)
    val pData = physFields(dataSchema)
    val pReq = physFields(requiredSchema)
    val pFilters =
      if (mapping.isEmpty) filters else filters.flatMap(physFilter)
    if (maskBc.value.isEmpty)
      return super.buildReaderWithPartitionValues(sparkSession,
        pData, partitionSchema, pReq, pFilters, options,
        hadoopConf)
    // unmasked files in a masked table: the plain reader, untouched
    val basePlain = super.buildReaderWithPartitionValues(sparkSession,
      pData, partitionSchema, pReq, pFilters, options,
      hadoopConf)
    // the query may ALREADY request the row-index column (a selected
    // `_metadata.row_index`, or the row-level-operation scan's `_pos`)
    // — reuse it for the mask filter instead of appending a duplicate
    val existingIdx = pReq.fieldNames.indexOf(
      ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME)
    // the row-index request column: the TEMPORARY name is what the
    // readers' row-index generators recognize, and it must be NULLABLE
    // — the reader rejects a required-but-absent column as a data
    // error before the generator ever runs
    val withIdx =
      if (existingIdx >= 0) pReq
      else StructType(pReq.fields :+ StructField(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME, LongType,
        nullable = true))
    val baseMasked = super.buildReaderWithPartitionValues(sparkSession,
      pData, partitionSchema, withIdx, pFilters, options, hadoopConf)
    val idxAt = if (existingIdx >= 0) existingIdx else pReq.length
    // EVERY per-file path emits OWNED UnsafeRow copies: with batching
    // off the readers emit ColumnarBatchRow VIEWS over a recycled
    // batch, and downstream metadata-column machinery (FileScanRDD's
    // joined row) may hold one across a batch boundary — reading a
    // freed vector NPEs (fuzz-caught). The strip projection doubles as
    // that copy for masked files; unmasked files (and masked files
    // whose query owns the row-index column) pay an identity copy.
    // The batch-output path of unmasked TABLES is untouched
    val dataTypes = pReq.fields.map(_.dataType)
    val localMask = maskBc // the broadcast HANDLE rides the closure
    def identityProj(types: Array[org.apache.spark.sql.types.DataType]) =
      UnsafeProjection.create(types.zipWithIndex.map { case (dt, i) =>
        BoundReference(i, dt, nullable = true): Expression
      }.toIndexedSeq)
    (file: PartitionedFile) => {
      val name = file.toPath.getName
      localMask.value.get(name) match {
        case None =>
          basePlain(file).map(identityProj(dataTypes))
        case Some(m) =>
          // one projection serves both shapes: when the query already
          // owns the row-index column, requiredSchema == withIdx and
          // this is the identity copy; when the column was appended,
          // reading indices 0..n-1 strips it
          baseMasked(file).filter(r =>
              java.util.Arrays.binarySearch(m, r.getLong(idxAt)) < 0)
            .map(identityProj(dataTypes))
      }
    }
  }
}

/** The Structured-Streaming WRITE side: each micro-batch becomes one
  * atomic, idempotent commit via [[TxLog.commitBatch]] — the medallion
  * chain composes as
  * `df.writeStream.format("graft-table").start(root)` with exactly-
  * once table semantics across restarts (replayed batch ids are
  * no-ops against the log's ledger). Append output mode only: the
  * log's streaming contract is append-is-a-commit; aggregations
  * should flow through foreachBatch + upsert.
  */
class GraftTableSink(root: String)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is the streaming micro-batch plan; re-wrap it
    // as a batch frame over the SAME physical rows before handing it
    // to the log's writer (the standard V1 sink move)
    val batch = org.apache.spark.sql.graft.StreamingFrame.unstream(data)
    TxLog.commitBatch(batch.sparkSession, root, batch, batchId): Unit
  }

  override def toString: String = s"GraftTableSink($root)"
}
