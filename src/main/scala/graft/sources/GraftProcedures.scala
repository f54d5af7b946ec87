package graft.sources

import java.util.{Collections => JCollections}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.TxLog

/** The table's MAINTENANCE surface as SQL stored procedures — the
  * Iceberg `CALL catalog.system.proc(...)` shape, bound to
  * [[GraftCatalog]]:
  *
  * {{{
  * CALL graft_table.system.checkpoint(table => '/path/to/root')
  * CALL graft_table.system.vacuum(table => '/p', retain_from => 7)
  * CALL graft_table.system.compact(table => '/p',
  *                                 target_bytes => 134217728)
  * CALL graft_table.system.optimize(table => '/p',
  *                                  zorder_by => 'doc_id,lang',
  *                                  num_files => 4)
  * CALL graft_table.system.optimize(table => '/p', zorder_by => 'x',
  *                                  num_files => 1,
  *                                  partition => 'lang=fr')
  * CALL graft_table.system.restore(table => '/p', version => 3)
  * CALL graft_table.system.purge_masks(table => '/p',
  *                                     min_fraction => 0.1)
  * }}}
  *
  * Every procedure routes through the SAME logged [[TxLog]] operation
  * the Scala API runs — one atomic commit, version races fail loudly,
  * staged files of a lost race are cleaned up — and returns its
  * committed version (or reclamation count) as a one-row result. This
  * is deliberately the ONLY SQL spelling of maintenance: mutating DDL
  * stays refused, and reclamation (`vacuum`) takes an explicit
  * retention floor rather than a DROP-style erase-everything verb.
  */
private[sources] object GraftProcedures {

  private def spark: SparkSession = SparkSession.active

  private val Table =
    ProcedureParameter.in("table", StringType)
      .comment("table root path (the graft_table.`/root` identifier)")
      .build()

  /** One maintenance verb: unbound and bound in one object (binding
    * is positional/named-argument alignment, which the analyzer does
    * from `parameters` — there is nothing else to specialize).
    */
  private abstract class Proc(procName: String, doc: String,
                              params: ProcedureParameter*)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = doc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false

    def output: StructType
    def run(s: SparkSession, in: InternalRow): InternalRow

    /** Override for multi-row results ([[run]] is then unused). */
    def runAll(s: SparkSession, in: InternalRow): Array[InternalRow] =
      Array(run(s, in))

    override def call(in: InternalRow): java.util.Iterator[Scan] = {
      val out = runAll(spark, in)
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = output
        override def description(): String = s"graft $procName result"
      }
      JCollections.singletonList(scan).iterator()
    }
  }

  private def row1(v: Long): InternalRow =
    new GenericInternalRow(Array[Any](v))

  private def versionOut = StructType(
    Seq(StructField("version", LongType, nullable = false)))

  private def table(in: InternalRow): String = {
    val t = in.getUTF8String(0).toString
    require(TxLog.isTable(t), s"no committed graft table at '$t'")
    t
  }

  private val all: Seq[Proc] = Seq(
    new Proc("checkpoint",
      "write a log checkpoint at the tip (replay base; every version " +
        "stays readable)", Table) {
      override def output: StructType = versionOut
      override def run(s: SparkSession, in: InternalRow): InternalRow =
        row1(TxLog.checkpoint(table(in)))
    },

    new Proc("vacuum",
      "reclaim files unreferenced from retain_from on and truncate " +
        "older history (explicit retention floor — versions below it " +
        "become unreadable BY CHOICE); versions younger than the " +
        "retention window are kept regardless unless force => true",
      Table,
      ProcedureParameter.in("retain_from", LongType)
        .comment("oldest version that must stay readable").build(),
      ProcedureParameter.in("retention_millis", LongType)
        .defaultValue(TxLog.DefaultRetentionMillis.toString)
        .comment("minimum commit age before a version may be " +
          "truncated (default 7 days)").build(),
      ProcedureParameter.in("force", BooleanType).defaultValue("false")
        .comment("skip the retention check and honor retain_from " +
          "exactly").build()) {
      override def output: StructType = StructType(Seq(
        StructField("removed_files", IntegerType, nullable = false)))
      override def run(s: SparkSession, in: InternalRow): InternalRow =
        new GenericInternalRow(
          Array[Any](TxLog.vacuum(table(in), in.getLong(1),
            retentionMillis = in.getLong(2), force = in.getBoolean(3))))
    },

    new Proc("upgrade_protocol",
      "raise the table's required reader/writer protocol (ONE " +
        "data-free metadata commit, Delta's protocol action): older " +
        "binaries then refuse the table BY NAME instead of silently " +
        "dropping commit actions they do not understand; the demand " +
        "never lowers and only versions this binary itself supports " +
        "may be required", Table,
      ProcedureParameter.in("min_reader", LongType)
        .comment("minimum reader protocol the table demands").build(),
      ProcedureParameter.in("min_writer", LongType)
        .comment("minimum writer protocol the table demands").build()) {
      override def output: StructType = StructType(Seq(
        StructField("version", LongType, nullable = false)))
      override def run(s: SparkSession, in: InternalRow): InternalRow =
        new GenericInternalRow(Array[Any](
          TxLog.upgradeProtocol(table(in), in.getLong(1),
            in.getLong(2))))
    },

    new Proc("cache_stats",
      "parsed-entry cache health since process start: a rising " +
        "eviction count means hot checkpoint metadata exceeds the " +
        "cache weight bound and planning is re-parsing it") {
      override def output: StructType = StructType(Seq(
        StructField("hits", LongType, nullable = false),
        StructField("misses", LongType, nullable = false),
        StructField("evictions", LongType, nullable = false)))
      override def run(s: SparkSession, in: InternalRow): InternalRow = {
        val (h, m, e) = TxLog.entryCacheStats
        new GenericInternalRow(Array[Any](h, m, e))
      }
    },

    new Proc("compact",
      "bin-pack small live files toward target_bytes as one logically " +
        "no-op commit", Table,
      ProcedureParameter.in("target_bytes", LongType)
        .comment("target output file size in bytes").build()) {
      override def output: StructType = versionOut
      override def run(s: SparkSession, in: InternalRow): InternalRow =
        row1(TxLog.compact(s, table(in), in.getLong(1)))
    },

    new Proc("optimize",
      "Z-order rewrite: the whole table, or one partition when " +
        "partition => 'col=v[,col=v]' is set (partition metadata " +
        "re-recorded on the outputs)", Table,
      ProcedureParameter.in("zorder_by", StringType)
        .comment("comma-separated layout columns").build(),
      ProcedureParameter.in("num_files", IntegerType)
        .comment("output file count").build(),
      ProcedureParameter.in("partition", StringType)
        .defaultValue("''")
        .comment("optional 'col=v[,col=v]' partition scope").build()) {
      override def output: StructType = versionOut
      override def run(s: SparkSession, in: InternalRow): InternalRow = {
        val cols = in.getUTF8String(1).toString.split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq
        require(cols.nonEmpty, "optimize: empty zorder_by")
        val n = in.getInt(2)
        val part = in.getUTF8String(3).toString.trim
        if (part.isEmpty) row1(TxLog.optimize(s, table(in), cols, n))
        else {
          val eq = part.split(",").map(_.trim).filter(_.nonEmpty).map {
            kv =>
              val i = kv.indexOf('=')
              require(i > 0 && i < kv.length - 1,
                s"optimize: malformed partition pair '$kv' " +
                  "(want col=value)")
              kv.take(i).trim -> kv.drop(i + 1).trim
          }.toMap
          row1(TxLog.optimizePartition(s, table(in), eq, cols, n))
        }
      }
    },

    new Proc("restore",
      "RESTORE TO VERSION as a commit: re-publish an older version's " +
        "live set + mask state at the head (pure metadata — no data " +
        "files move)", Table,
      ProcedureParameter.in("version", LongType)
        .comment("version to restore the head to").build()) {
      override def output: StructType = versionOut
      override def run(s: SparkSession, in: InternalRow): InternalRow =
        row1(TxLog.restore(s, table(in), in.getLong(1)))
    },

    new Proc("purge_masks",
      "rewrite only the files whose deletion-vector masked fraction " +
        "reached min_fraction; version is NULL when no file crossed " +
        "the threshold (no commit written)", Table,
      ProcedureParameter.in("min_fraction", DoubleType)
        .comment("masked-fraction rewrite threshold in (0, 1]")
        .build()) {
      override def output: StructType = StructType(Seq(
        StructField("version", LongType, nullable = true)))
      override def run(s: SparkSession, in: InternalRow): InternalRow =
        new GenericInternalRow(Array[Any](
          TxLog.purgeMasks(s, table(in), in.getDouble(1))
            .map(v => v: Any).orNull))
    },

    new Proc("add_constraint",
      "register a CHECK constraint as a commit: every later insert " +
        "(SQL or writer) is gated on it; rows already in the table " +
        "are validated first", Table,
      ProcedureParameter.in("name", StringType)
        .comment("constraint name").build(),
      ProcedureParameter.in("expr", StringType)
        .comment("boolean SQL expression over the table's columns")
        .build()) {
      override def output: StructType = versionOut
      override def run(s: SparkSession, in: InternalRow): InternalRow =
        row1(TxLog.addConstraint(s, table(in),
          in.getUTF8String(1).toString, in.getUTF8String(2).toString))
    },

    new Proc("drop_constraint",
      "retire a CHECK constraint as a commit", Table,
      ProcedureParameter.in("name", StringType)
        .comment("constraint name").build()) {
      override def output: StructType = versionOut
      override def run(s: SparkSession, in: InternalRow): InternalRow =
        row1(TxLog.dropConstraint(table(in),
          in.getUTF8String(1).toString))
    },

    new Proc("history",
      "the commit ledger, oldest first: one row per version still on " +
        "disk (vacuum truncates history by contract)", Table) {
      override def output: StructType = StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("op", StringType, nullable = false),
        StructField("n_adds", IntegerType, nullable = false),
        StructField("n_removes", IntegerType, nullable = false),
        StructField("rows", LongType, nullable = true),
        StructField("rows_removed", LongType, nullable = true)))
      override def run(s: SparkSession, in: InternalRow): InternalRow =
        throw new IllegalStateException("multi-row procedure")
      override def runAll(s: SparkSession,
                          in: InternalRow): Array[InternalRow] =
        TxLog.history(table(in)).map { ci =>
          new GenericInternalRow(Array[Any](ci.version,
            UTF8String.fromString(ci.op), ci.adds.size, ci.removes.size,
            ci.rows.map(v => v: Any).orNull,
            ci.rowsRemoved.map(v => v: Any).orNull)): InternalRow
        }.toArray
    },

    new Proc("clone",
      "zero-copy shallow clone: target's v0 references the source's " +
        "live files + mask at `version` (-1 = tip); the branches " +
        "diverge from there", Table,
      ProcedureParameter.in("target", StringType)
        .comment("root path for the new branch").build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1")
        .comment("source version to branch from (-1 = tip)").build()) {
      override def output: StructType = versionOut
      override def run(s: SparkSession, in: InternalRow): InternalRow = {
        val v = in.getLong(2)
        row1(TxLog.clone(s, table(in), in.getUTF8String(1).toString,
          if (v < 0) None else Some(v)))
      }
    })

  val byName: Map[String, UnboundProcedure] =
    all.map(p => p.name() -> (p: UnboundProcedure)).toMap
}
