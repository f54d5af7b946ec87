package graft.sources

import java.util.Collections

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, MetadataColumn, ProcedureCatalog, SupportsDelete, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TxLog

/** SQL catalog for transaction-log tables — the DSv2 front door that
  * makes the table addressable from PURE SQL, time travel included:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft_table",
  *   "graft.sources.GraftCatalog")
  * spark.sql("SELECT * FROM graft_table.`/path/to/root`")
  * spark.sql("SELECT * FROM graft_table.`/path/to/root` VERSION AS OF 3")
  * spark.sql("... TIMESTAMP AS OF '2026-01-01 00:00:00'")
  * }}}
  *
  * The identifier IS the table root (one back-quoted part — no
  * namespace levels, like Delta's path-based `delta.`/path``), and
  * `VERSION AS OF` / `TIMESTAMP AS OF` route through the catalog's
  * versioned `loadTable` overloads into the same [[TxLog]] resolution
  * the DataFrame reader uses. SQL DML that maps onto the commit
  * protocol is supported — `INSERT INTO` appends one atomic version,
  * `INSERT OVERWRITE` is the logged INSERT OVERWRITE (history
  * intact, masks deactivated) — because both route THROUGH
  * [[TxLog]]'s writers. DDL that would bypass or destroy the log
  * (CREATE/DROP/RENAME/ALTER) is refused with the writer API named:
  * tables are created by writing (`df.write.format("graft-table")`)
  * and destroyed by retention policy ([[TxLog.vacuum]]), not by a
  * DROP that silently deletes 100 TB.
  *
  * Scans reuse the V1 relation ([[GraftTableRelationBuilder]] — the
  * log-stats-pruning `GraftFileIndex` + DV-masking parquet format)
  * through the DSv2 [[V1Scan]] bridge, so SQL and DataFrame reads
  * plan through ONE code path. Data filters are replayed onto the
  * inner relation (see [[GraftSqlTable.filterColumn]]) so the
  * FileIndex prunes files for SQL queries exactly as it does for
  * DataFrame reads; Spark re-applies the full predicate above the
  * scan, so the replay is an optimization, never the filter.
  */
class GraftCatalog extends CatalogPlugin with TableCatalog
    with ProcedureCatalog {

  private var catalogName: String = "graft_table"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def rootOf(ident: Identifier): String = {
    // `graft_table.`/root`` parses as one name part; tolerate dotted
    // namespace crumbs by re-joining (a root path never contains dots
    // that matter here — data-file grammar forbids none of this, the
    // path is handed to TxLog verbatim)
    val root = (ident.namespace() :+ ident.name()).mkString(".")
    require(TxLog.isTable(root),
      s"$catalogName: no committed graft table at '$root'")
    root
  }

  override def loadTable(ident: Identifier): Table =
    new GraftSqlTable(rootOf(ident), None)

  /** `VERSION AS OF n` — the SQL spelling of `versionAsOf`. */
  override def loadTable(ident: Identifier, version: String): Table =
    new GraftSqlTable(rootOf(ident), Some(version.toLong))

  /** `TIMESTAMP AS OF ts` — Spark hands epoch MICROSECONDS; the log's
    * monotonized commit-mtime lookup works in millis.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    new GraftSqlTable(root, Some(TxLog.versionAt(root, timestamp / 1000L)))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed, like delta.`/path` — nothing to list

  override def tableExists(ident: Identifier): Boolean =
    TxLog.isTable((ident.namespace() :+ ident.name()).mkString("."))

  /** `CALL graft_table.system.<proc>(...)` — the maintenance surface
    * ([[GraftProcedures]]): checkpoint, vacuum, compact, optimize
    * (whole-table or partition-scoped), restore, purge_masks, clone.
    * Each routes through the same logged [[TxLog]] operation the
    * Scala API runs and returns its committed version as one row.
    */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"$catalogName procedures live in the 'system' namespace: " +
        s"CALL $catalogName.system.${ident.name()}(...)")
    GraftProcedures.byName.getOrElse(ident.name(),
      throw new NoSuchElementException(
        s"$catalogName: no procedure '${ident.name()}' (have " +
          s"${GraftProcedures.byName.keys.toSeq.sorted.mkString(", ")})"))
  }

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (!namespace.sameElements(Array("system"))) Array.empty
    else GraftProcedures.byName.keys.toSeq.sorted
      .map(n => Identifier.of(Array("system"), n)).toArray

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    s"$catalogName supports SELECT / INSERT INTO / INSERT OVERWRITE; " +
      "create tables through df.write.format(\"graft-table\") and " +
      "reclaim storage through TxLog.vacuum — DDL that bypasses the " +
      "commit log is refused")

  @deprecated("inherited DSv2 signature", "")
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String])
      : Table = readOnly

  /** The ALTER shapes that map onto the commit protocol — each ONE
    * data-free metadata commit: ADD COLUMN(S) (logged schema
    * widening, [[TxLog.addColumns]]), RENAME COLUMN (logical name
    * changes, physical parquet name stays —
    * [[TxLog.renameColumn]]), and DROP COLUMN(S)
    * ([[TxLog.dropColumns]]; the stored bytes become invisible, a
    * later re-ADD binds a fresh physical name). Every other ALTER
    * still refuses. Top-level columns only; added columns forced
    * nullable: existing rows read them as NULL.
    */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val root = rootOf(ident)
    val spark = SparkSession.active
    def one(names: Array[String], what: String): String = {
      require(names.length == 1,
        s"$catalogName: nested $what is not supported " +
          s"(${names.mkString(".")})")
      names(0)
    }
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val others = changes.filterNot(_.isInstanceOf[TableChange.AddColumn])
    others.foreach {
      case r: TableChange.RenameColumn =>
        TxLog.renameColumn(spark, root,
          one(r.fieldNames(), "RENAME COLUMN"), r.newName()): Unit
      case d: TableChange.DeleteColumn =>
        TxLog.dropColumns(spark, root,
          Seq(one(d.fieldNames(), "DROP COLUMN"))): Unit
      case t: TableChange.UpdateColumnType =>
        // WIDENING only (byte<short<int<long, float->double) — one
        // data-free metadata commit; the physical parquet type stays
        // and reads upcast per file. TxLog refuses everything else.
        TxLog.widenColumnType(spark, root,
          one(t.fieldNames(), "ALTER COLUMN TYPE"),
          t.newDataType()): Unit
      case other => throw new UnsupportedOperationException(
        s"$catalogName supports ALTER TABLE ... ADD/RENAME/DROP " +
          "COLUMN and ALTER COLUMN ... TYPE (widening); " +
          s"$other bypasses the commit log and is refused")
    }
    if (adds.nonEmpty) {
      val fields = adds.map { a =>
        val n = one(a.fieldNames(), "ADD COLUMN")
        // modifiers must refuse LOUDLY, not silently drop: a NOT NULL
        // the log cannot honor (existing rows read the column as
        // NULL) and a FIRST/AFTER position the widened schema does
        // not implement (columns append last)
        require(a.isNullable,
          s"$catalogName: ADD COLUMN $n NOT NULL is " +
            "not supported — existing rows read an added column as " +
            "NULL, which would violate the constraint from birth")
        require(a.position() == null,
          s"$catalogName: ADD COLUMN ... FIRST/AFTER is not " +
            "supported — added columns append at the end")
        org.apache.spark.sql.types.StructField(
          n, a.dataType(), nullable = true)
      }
      TxLog.addColumns(spark, root, fields.toSeq): Unit
    }
    new GraftSqlTable(root, None)
  }
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = readOnly
}

/** One resolved (root, version) as a DSv2 table. The scan is the V1
  * relation behind the [[V1Scan]] bridge — Spark plans a
  * RowDataSourceScanExec whose rows come from the inner
  * HadoopFsRelation execution, log-stats pruning and DV masks intact.
  * Writes bridge the same way ([[V1Write]]): `INSERT INTO` lands as
  * one [[TxLog.append]] commit, `INSERT OVERWRITE` (Spark's
  * truncate-style static overwrite) as one [[TxLog.overwrite]] —
  * the full constraint/stats/schema machinery applies, and a lost
  * version race fails loudly like every other writer. `DELETE FROM`
  * ([[SupportsDelete]]) lands as one [[TxLog.deleteWherePredicate]]
  * copy-on-write commit — hit files discovered through the
  * connector's own log-stats-pruned scan, survivors rewritten, every
  * pre-delete version still time-travel readable.
  */
private[sources] class GraftSqlTable(root: String, version: Option[Long])
    extends Table with SupportsRead with SupportsWrite
    with SupportsDelete with SupportsMetadataColumns
    with SupportsRowLevelOperations {

  private def spark: SparkSession = SparkSession.active

  private lazy val relation: BaseRelation =
    GraftTableRelationBuilder.createRelation(spark.sqlContext,
      Map("path" -> root) ++ version.map("versionAsOf" -> _.toString))

  override def name(): String =
    version.fold(root)(v => s"$root@v$v")

  override def schema(): StructType = relation.schema

  /** `_file` / `_pos` — the physical row address (data-file path,
    * parquet row index) as queryable metadata columns, and the rowId
    * the row-level operations mask by. On a masked table the reported
    * positions stay the PHYSICAL indexes (masked rows are skipped, not
    * renumbered), which is exactly what a deletion vector written
    * against them needs.
    */
  override def metadataColumns(): Array[MetadataColumn] = {
    // data columns SHADOW metadata columns (the SupportsMetadataColumns
    // contract): a table with a real `_file`/`_pos` column keeps its
    // own values and simply loses the metadata alias
    val dataCols = schema().fieldNames.toSet
    Array(
      GraftSqlTable.metaCol(GraftTableScans.FileCol, StringType,
        "data file path of the row"),
      GraftSqlTable.metaCol(GraftTableScans.PosCol, LongType,
        "physical parquet row index of the row"))
      .filterNot(mc => dataCols(mc.name()))
  }

  /** SQL UPDATE / MERGE / rewrite-based DELETE as MERGE-ON-READ
    * ([[GraftRowLevelOperation]]): the matched rows' (file, position)
    * addresses become one deletion-vector sidecar and the new rows
    * one set of appended files — a single commit that rewrites NO
    * live data file, the 100 TB answer to a 1000-row UPDATE.
    */
  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo)
      : RowLevelOperationBuilder = {
    require(version.isEmpty,
      s"cannot mutate $name: the relation is pinned to a historical " +
        "version (VERSION/TIMESTAMP AS OF is a read-only view)")
    // the operation's rowId IS (_file, _pos); on a table whose DATA
    // columns shadow those names the discovery scan would hand the
    // delta writer stored values instead of physical addresses —
    // masking the wrong rows. Refuse loudly; such tables keep every
    // other surface (SELECT, INSERT, metadata DELETE)
    val dataCols = schema().fieldNames.toSet
    val shadowed = Seq(GraftTableScans.FileCol, GraftTableScans.PosCol)
      .filter(dataCols)
    require(shadowed.isEmpty,
      s"cannot run row-level UPDATE/MERGE/DELETE on $name: data " +
        s"column(s) ${shadowed.mkString(", ")} shadow the physical " +
        "row-address metadata columns the operation masks by")
    () => new GraftRowLevelOperation(root, info.command())
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(version.isEmpty,
      s"cannot write to $name: the relation is pinned to a historical " +
        "version (VERSION/TIMESTAMP AS OF is a read-only view)")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame,
                                ignored: Boolean): Unit =
              if (overwrite)
                TxLog.overwrite(data.sparkSession, root, data): Unit
              else {
                // INSERT INTO keeps the table's declared layout:
                // transform-partitioned tables re-derive their hidden
                // partition values, identity-partitioned tables
                // partition by their declared columns — partition
                // purity (and therefore pruning) must not degrade
                // just because the write arrived via SQL
                val pts = TxLog.partitionTransforms(root)
                val pcs = TxLog.partitionColumns(root)
                if (pts.nonEmpty)
                  TxLog.appendTransformPartitioned(
                    data.sparkSession, root, data): Unit
                else if (pcs.nonEmpty &&
                    pcs.forall(data.columns.contains))
                  TxLog.appendPartitioned(
                    data.sparkSession, root, data, pcs): Unit
                else TxLog.append(data.sparkSession, root, data): Unit
              }
          }
      }
    }
  }

  /** DELETE needs the WHERE clause converted EXACTLY — a superset (the
    * pruning replay's And fallback) would delete rows the user never
    * asked to delete. Unconvertible shapes refuse here; because the
    * table also supports row-level operations, Spark then plans them
    * as the merge-on-read row-level DELETE (a deletion-vector commit)
    * instead — refusing here picks the commit shape, it does not
    * reject the statement.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftSqlTable.exactFilterColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(version.isEmpty,
      s"cannot delete from $name: the relation is pinned to a " +
        "historical version (VERSION/TIMESTAMP AS OF is a read-only view)")
    // no WHERE clause (or SQL TRUNCATE's AlwaysTrue) → remove every
    // live file by pure metadata: no scan, no rewrite, one commit —
    // history stays time-travel readable, this is NOT a vacuum
    if (filters.forall(_.isInstanceOf[sources.AlwaysTrue])) {
      TxLog.removeAll(root): Unit
      return
    }
    val cond = filters.toSeq.map(f => GraftSqlTable.exactFilterColumn(f)
        .getOrElse(throw new UnsupportedOperationException(
          s"DELETE predicate not convertible: $f")))
      .reduceOption(_ && _).getOrElse(lit(true))
    TxLog.deleteWherePredicate(spark, root, cond): Unit
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = GraftTableScans.builder(relation)
}

/** The shared DSv2 scan over the V1 table relation — used by the SQL
  * catalog's SELECT path and by the row-level operations' discovery
  * scan. Three jobs: replay pushed filters onto the inner relation as
  * Columns (so the GraftFileIndex prunes files for SQL exactly as for
  * DataFrame reads — always residual, Spark re-applies the full
  * predicate above), push COLUMN PRUNING through to the inner scan
  * (the select below reaches the parquet ReadSchema), and materialize
  * the `_file` / `_pos` metadata columns from the file source's
  * `_metadata` struct when the query (or a row-level rewrite) asks
  * for them.
  */
private[sources] object GraftTableScans {
  val FileCol = "_file"
  val PosCol = "_pos"

  def builder(relation: BaseRelation,
              capture: java.util.concurrent.atomic.AtomicReference[
                Array[Filter]] = null): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with SupportsPushDownRequiredColumns {
      private var pushed: Array[Filter] = Array.empty
      private var required: StructType = relation.schema

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters
        // a row-level operation records its discovery predicate here,
        // so its COMMIT can declare the partition scope the predicate
        // implies (conflict detection lets a provably-elsewhere
        // concurrent write through)
        if (capture != null) capture.set(filters)
        filters // ALL stay residual: Spark re-applies the exact
        // predicate above the scan; the replay below only prunes
      }

      override def pushedFilters(): Array[Filter] = pushed

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required

        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T = {
          val conds = pushed.flatMap(GraftSqlTable.filterColumn)
          val req = required
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = req
            // the inner execution already produces InternalRows; with
            // needConversion = false Spark consumes them directly —
            // the default `.rdd` path would materialize every row as
            // an external Row only for Spark to convert it straight
            // back (two full-row copies per row on every SQL read)
            override def needConversion: Boolean = false
            override def buildScan(): RDD[Row] = {
              val base = context.sparkSession
                .baseRelationToDataFrame(relation)
              val filtered = conds.foldLeft(base)(_ filter _)
              // metadata names resolve to _metadata ONLY when the
              // table has no data column of that name — data columns
              // shadow metadata columns (the SupportsMetadataColumns
              // contract); a table with a real `_file` column reads
              // its own values
              val dataCols = relation.schema.fieldNames.toSet
              val cols = req.fields.toIndexedSeq.map(f => f.name match {
                case FileCol if !dataCols(FileCol) =>
                  col("_metadata.file_path").as(FileCol)
                case PosCol if !dataCols(PosCol) =>
                  col("_metadata.row_index").as(PosCol)
                case n => col(n)
              })
              filtered.select(cols: _*).queryExecution.toRdd
                .asInstanceOf[RDD[Row]]
            }
          }.asInstanceOf[T]
        }
      }
    }
}

private[graft] object GraftSqlTable {
  private[sources] def metaCol(colName: String, dt: DataType,
                               doc: String): MetadataColumn =
    new MetadataColumn {
      override def name(): String = colName
      override def dataType(): DataType = dt
      override def isNullable: Boolean = false
      override def comment(): String = doc
    }

  /** A source Filter replayed as a Column on the inner relation, so
    * the GraftFileIndex prunes and the parquet reader pushes down for
    * SQL exactly as for DataFrame reads. Unsupported shapes drop out
    * (None) — always safe, because the FULL predicate re-applies
    * above the V1 scan; for AND the convertible side alone is still a
    * superset, for OR both sides must convert or the whole shape
    * drops. NOT's child converts in EXACT mode: the complement of a
    * superset is a SUBSET, so a relaxed And under Not would over-prune
    * rows the true predicate keeps.
    */
  def filterColumn(f: Filter): Option[Column] = convert(f, exact = false)

  /** The EXACT conversion — every shape converts completely or the
    * whole filter refuses. This is the DELETE contract: a pruning
    * superset would delete too much.
    */
  def exactFilterColumn(f: Filter): Option[Column] = convert(f, exact = true)

  private def convert(f: Filter, exact: Boolean): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case sources.StringEndsWith(a, p) => Some(col(a).endsWith(p))
    case sources.StringContains(a, p) => Some(col(a).contains(p))
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case sources.And(l, r) =>
      (convert(l, exact), convert(r, exact)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (one, other) if !exact => one.orElse(other) // superset
        case _ => None
      }
    case sources.Or(l, r) =>
      for (a <- convert(l, exact); b <- convert(r, exact)) yield a || b
    case sources.Not(c) => convert(c, exact = true).map(not)
    case _ => None
  }
}
