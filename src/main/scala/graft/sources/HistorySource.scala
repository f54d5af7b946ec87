package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.TxLog

/** `DESCRIBE HISTORY` for the [[graft.ops.TxLog]] table, as a full
  * DataSource V2 connector — the commit ledger is a TABLE:
  *
  * {{{ spark.read.format("graft-table-history").load(tableRoot) }}}
  *
  * The connector owns its whole data plane (each partition reader
  * parses its own slice of commit-JSON files), which is what makes the
  * optimizer contracts REAL rather than decorative:
  *
  *  - **filter pushdown to the listing**: `version` range predicates
  *    ([[SupportsPushDownFilters]]) narrow which commit files are even
  *    opened — the file NAME is the version, so pushdown prunes I/O
  *    the way parquet footer stats do on data;
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): a
  *    `select(version, op)` never materializes the adds/removes path
  *    arrays;
  *  - **micro-batch streaming** ([[TableCapability.MICRO_BATCH_READ]]):
  *    the ledger is also an exactly-once stream of commit events with
  *    offsets = versions — the audit/monitoring feed of a continuously
  *    ingesting table.
  *
  * At 100 TB the ledger is tiny next to the data (one small JSON per
  * commit), but it is the table you ask "what happened": per-version
  * op, footer-exact rows added/removed, streaming batch ids, and the
  * exact file sets each commit touched.
  */
class GraftHistoryProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-table-history"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftHistoryTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val root = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-table-history requires a path: .load(tableRoot)"))
    new GraftHistoryTable(root)
  }
}

object GraftHistoryTable {
  /** The ledger's fixed schema; `rows_added`/`rows_removed` are the
    * footer-exact counts logged at commit time (null on pre-stats
    * commits), `batch_id` only on streaming commits.
    */
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("n_adds", IntegerType, nullable = false),
    StructField("n_removes", IntegerType, nullable = false),
    StructField("rows_added", LongType, nullable = true),
    StructField("rows_removed", LongType, nullable = true),
    StructField("batch_id", LongType, nullable = true),
    StructField("adds", ArrayType(StringType, containsNull = false)),
    StructField("removes", ArrayType(StringType, containsNull = false))))

  /** Coarse chunking: a partition reads up to this many commit files.
    * Ledger rows are tiny — the point is only that a million-commit
    * history still fans out across executors instead of one task.
    */
  val VersionsPerPartition = 256
}

class GraftHistoryTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft_table_history(`$root`)"
  override def schema(): StructType = GraftHistoryTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftHistoryScanBuilder(root)
}

/** Accumulates `version` bounds from pushed filters and the pruned
  * column set; everything else stays a residual filter for Spark.
  */
class GraftHistoryScanBuilder(root: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var lo = Long.MinValue
  private var hi = Long.MaxValue
  private var pushed = Array.empty[Filter]
  private var required: StructType = GraftHistoryTable.Schema
  private var aggFuncs: Option[Seq[String]] = None
  private var limit: Option[Int] = None

  private def isVersion(e: org.apache.spark.sql.connector.expressions
      .Expression): Boolean = e match {
    case nr: NamedReference => nr.fieldNames.toSeq == Seq("version")
    case _ => false
  }

  /** Ungrouped COUNT(*) / MIN(version) / MAX(version) are answered
    * from the log LISTING alone — no commit file is ever opened (the
    * file name IS the version). Pushed as partial results; Spark's
    * final aggregate over the single returned row is a no-op
    * sum/min/max.
    */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (agg.groupByExpressions.nonEmpty) return false
    val fs = agg.aggregateExpressions
    val tokens = fs.toSeq.map {
      case _: CountStar => "count"
      case m: Min if isVersion(m.column) => "min"
      case m: Max if isVersion(m.column) => "max"
      case _ => return false
    }
    if (tokens.isEmpty) return false
    aggFuncs = Some(tokens)
    true
  }

  /** LIMIT over the ledger: only the first N in-bounds commit files
    * are opened. Spark re-applies the limit (partial push).
    */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    true
  }

  private def long(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case EqualTo("version", v) => long(v).exists { n =>
        lo = math.max(lo, n); hi = math.min(hi, n); true }
      // Long-extreme literals would overflow the +-1: leave those as
      // residual filters for Spark instead of claiming them
      case GreaterThan("version", v) => long(v).exists { n =>
        n != Long.MaxValue && { lo = math.max(lo, n + 1); true } }
      case GreaterThanOrEqual("version", v) => long(v).exists { n =>
        lo = math.max(lo, n); true }
      case LessThan("version", v) => long(v).exists { n =>
        n != Long.MinValue && { hi = math.min(hi, n - 1); true } }
      case LessThanOrEqual("version", v) => long(v).exists { n =>
        hi = math.min(hi, n); true }
      // version is non-nullable: IsNotNull is vacuously true
      case IsNotNull("version") => true
      case _ => false
    }
    pushed = filters.diff(residual)
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftHistoryScan(root, lo, hi, required, aggFuncs, limit)
}

class GraftHistoryScan(root: String, lo: Long, hi: Long,
                       required: StructType,
                       agg: Option[Seq[String]] = None,
                       limit: Option[Int] = None) extends Scan {

  override def readSchema(): StructType = agg match {
    case Some(fs) => StructType(fs.map {
      case "count" => StructField("count(*)", LongType, nullable = false)
      case f => StructField(s"$f(version)", LongType, nullable = true)
    })
    case None => required
  }

  // bounds + columns + pushed aggregates/limit in the plan text: the
  // pushdowns are assertable from .explain, the same way parquet's
  // PushedFilters are
  override def description(): String = {
    val b = s"[${if (lo == Long.MinValue) "-inf" else lo}, " +
      s"${if (hi == Long.MaxValue) "inf" else hi}]"
    val extras = agg.map(fs => s" pushedAggregates=${fs.mkString("[", ",", "]")}")
      .getOrElse("") + limit.map(n => s" pushedLimit=$n").getOrElse("")
    s"GraftHistoryScan versionBounds=$b cols=" +
      required.fieldNames.mkString("[", ",", "]") + extras
  }

  override def toBatch: Batch = agg match {
    case Some(fs) => new GraftHistoryAggBatch(root, lo, hi, fs)
    case None => new GraftHistoryBatch(root, lo, hi, required, limit)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new GraftHistoryMicroBatch(root, lo, hi, required)
}

/** The listing-only answer to a pushed aggregate: one row, computed on
  * the driver from the (bounds-filtered) version list. No commit file
  * is opened — count/min/max over a corrupted-ledger table still work,
  * which is how the spec proves the pushdown is real.
  */
case class GraftHistoryAggPartition(n: Long, min: Option[Long],
                                    max: Option[Long],
                                    funcs: Seq[String]) extends InputPartition

class GraftHistoryAggBatch(root: String, lo: Long, hi: Long,
                           funcs: Seq[String]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val vs = TxLog.versions(root).filter(v => v >= lo && v <= hi)
    Array(GraftHistoryAggPartition(vs.size.toLong, vs.headOption,
      vs.lastOption, funcs))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    GraftHistoryAggReaderFactory
}

object GraftHistoryAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftHistoryAggPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(gp.funcs.map {
          case "count" => Long.box(gp.n)
          case "min" => gp.min.map(Long.box).orNull
          case "max" => gp.max.map(Long.box).orNull
        }.toArray[Any])
      override def close(): Unit = ()
    }
  }
}

/** One partition = one slice of commit files. The version LIST is
  * resolved at plan time on the driver (a directory listing); only
  * versions inside the pushed bounds are ever opened.
  */
case class GraftHistoryPartition(root: String, versions: Array[Long])
    extends InputPartition

class GraftHistoryBatch(root: String, lo: Long, hi: Long,
                        required: StructType,
                        limit: Option[Int] = None) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    GraftHistoryRead.partitions(root, lo, hi, limit)
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftHistoryReaderFactory(required)
}

object GraftHistoryRead {
  def partitions(root: String, lo: Long, hi: Long,
                 limit: Option[Int] = None): Array[InputPartition] = {
    val inBounds = TxLog.versions(root).filter(v => v >= lo && v <= hi)
    limit.fold(inBounds)(n => inBounds.take(n))
      .grouped(GraftHistoryTable.VersionsPerPartition)
      .map(g => GraftHistoryPartition(root, g.toArray): InputPartition)
      .toArray
  }
}

class GraftHistoryReaderFactory(required: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftHistoryPartition]
    new PartitionReader[InternalRow] {
      private val it = gp.versions.iterator
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else { row = toRow(TxLog.commitInfoAt(gp.root, it.next())); true }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }

  private def strings(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  /** Only the PRUNED columns are materialized — `adds`/`removes`
    * arrays are never built for a `select(version, op)`.
    */
  private def toRow(ci: TxLog.CommitInfo): InternalRow =
    new GenericInternalRow(required.fieldNames.map {
      case "version" => ci.version
      case "op" => UTF8String.fromString(ci.op)
      case "n_adds" => ci.adds.size
      case "n_removes" => ci.removes.size
      case "rows_added" => ci.rows.map(Long.box).orNull
      case "rows_removed" => ci.rowsRemoved.map(Long.box).orNull
      case "batch_id" => ci.batchId.map(Long.box).orNull
      case "adds" => strings(ci.adds)
      case "removes" => strings(ci.removes)
      case other => throw new IllegalArgumentException(
        s"unknown history column: $other")
    }.asInstanceOf[Array[Any]])
}

/** The ledger as a micro-batch stream: offsets are versions, a batch
  * is the half-open commit interval (start, end] — each commit event
  * is delivered exactly once, replayable from the checkpointed offset.
  */
class GraftHistoryMicroBatch(root: String, lo: Long, hi: Long,
                             required: StructType) extends MicroBatchStream {

  // json-equality from the Offset base; no case class (see TableStream)
  private class VOffset(val v: Long) extends Offset {
    override def json: String = v.toString
  }

  private def floor: Long = if (lo == Long.MinValue) -1L else lo - 1

  override def initialOffset(): Offset = new VOffset(floor)

  override def latestOffset(): Offset = {
    val latest = TxLog.versions(root).lastOption.getOrElse(-1L)
    new VOffset(math.max(floor, math.min(hi, latest)))
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.json.toLong
    val e = end.json.toLong
    GraftHistoryRead.partitions(root, math.max(lo, s + 1), math.min(hi, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftHistoryReaderFactory(required)

  override def deserializeOffset(json: String): Offset =
    new VOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
