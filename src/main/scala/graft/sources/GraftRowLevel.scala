package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.{TxIo, TxLog}

/** SQL UPDATE / MERGE INTO / rewrite-based DELETE for the txlog table,
  * implemented MERGE-ON-READ through Spark's delta-based row-level
  * operation machinery ([[org.apache.spark.sql.connector.write.SupportsDelta]]):
  *
  *  - the DISCOVERY scan is the same stats-pruning V1 relation every
  *    other read plans through ([[GraftTableScans]]), pinned at the
  *    operation's base version, and it exposes each matched row's
  *    physical address as the `_file` / `_pos` metadata columns
  *    (parquet row indexes — exact under row-group skipping, and on an
  *    already-masked table the surviving rows keep their PHYSICAL
  *    positions);
  *  - the WRITE is a [[DeltaWriter]] per task: deleted/updated row
  *    addresses stream into a per-task deletion-vector FRAGMENT
  *    parquet, inserted/updated-new rows into per-task data files —
  *    nothing buffers on the heap, nothing rides the commit message
  *    but file names;
  *  - the COMMIT ([[TxLog.commitRowDelta]]) merges the fragments into
  *    ONE sidecar and publishes mask + adds as ONE version:
  *    `UPDATE t SET x = ... WHERE k = 7` at 100 TB masks a handful of
  *    row positions and appends a KB-scale file — no live data file
  *    is rewritten, the same merge-on-read shape as
  *    [[TxLog.deleteWhereDv]], atomic with its re-inserts.
  *
  * Updates are represented as delete + insert
  * (`representUpdateAsDeleteAndInsert`), so all three commands reduce
  * to the two writer verbs. A concurrent commit between the scan and
  * the publish fails the version race LOUDLY (the scanned row
  * addresses would be stale) and the staged files are cleaned up —
  * the same derived-mutation contract every other TxLog rewrite
  * follows.
  */
private[sources] class GraftRowLevelOperation(
    root: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  /** The snapshot this operation reads AND writes against: the scan
    * pins it, the commit lands at `baseVersion + 1`.
    */
  private[sources] val baseVersion: Long = TxLog.resolve(root).version

  override def command(): RowLevelOperation.Command = cmd

  /** The discovery scan's pushed filters, captured so the commit can
    * declare the partition scope the predicate implies — the
    * conflict-detection input that lets two UPDATEs on DISJOINT
    * partitions both land (see [[graft.ops.TxLog.commitDerived]]).
    */
  private val pushedFilters =
    new java.util.concurrent.atomic.AtomicReference[
      Array[org.apache.spark.sql.sources.Filter]](Array.empty)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    GraftTableScans.builder(
      GraftTableRelationBuilder.createRelation(
        SparkSession.active.sqlContext,
        Map("path" -> root, "versionAsOf" -> baseVersion.toString)),
      capture = pushedFilters)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(root, baseVersion, cmd, info.schema(),
          () => TxLog.partitionEqOfFilters(
            pushedFilters.get().toSeq,
            TxLog.partitionColumns(root, Some(baseVersion))))
    }

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftTableScans.FileCol),
    Expressions.column(GraftTableScans.PosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def description(): String = s"graft row-level $cmd on $root"
}

/** Hadoop Configuration with Java serialization (Spark's own
  * SerializableConfiguration is private[spark]).
  */
private[sources] class GraftSerializableConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] case class GraftDeltaTaskResult(
    dataFiles: Seq[String], dvFragments: Seq[String])
    extends WriterCommitMessage

private[sources] class GraftDeltaWrite(
    root: String, baseVersion: Long, cmd: RowLevelOperation.Command,
    rowSchema: StructType,
    partitionEq: () => Map[String, String]) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite =
    new GraftDeltaBatchWrite(root, baseVersion, cmd, rowSchema,
      partitionEq)
}

private[sources] class GraftDeltaBatchWrite(
    root: String, baseVersion: Long, cmd: RowLevelOperation.Command,
    rowSchema: StructType,
    partitionEq: () => Map[String, String]) extends DeltaBatchWrite {

  private def spark: SparkSession = SparkSession.active
  private val uid = UUID.randomUUID().toString.take(8)
  private val stagingDir = s"$root/_staged-rl-$uid"
  private def io: TxIo = TxIo.forRoot(root)

  private val dvSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DeltaWriterFactory = {
    io.mkdirs(stagingDir)
    // parquet writer factories prepared ONCE on the driver (the same
    // prepareWrite Spark's own file write exec runs); each schema
    // needs its own Job conf — prepareWrite records the write schema
    // in the configuration
    val dataJob = Job.getInstance(spark.sessionState.newHadoopConf())
    val dataFactory = new ParquetFileFormat()
      .prepareWrite(spark, dataJob, Map.empty, rowSchema)
    val dvJob = Job.getInstance(spark.sessionState.newHadoopConf())
    val dvFactory = new ParquetFileFormat()
      .prepareWrite(spark, dvJob, Map.empty, dvSchema)
    new GraftDeltaWriterFactory(stagingDir, rowSchema, dvSchema,
      dataFactory, dvFactory,
      new GraftSerializableConf(dataJob.getConfiguration),
      new GraftSerializableConf(dvJob.getConfiguration))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val res = messages.collect { case m: GraftDeltaTaskResult => m }
    val op = cmd match {
      case RowLevelOperation.Command.DELETE => "delete-dv"
      case RowLevelOperation.Command.UPDATE => "update-dv"
      case _ => "merge-dv"
    }
    try TxLog.commitRowDelta(spark, root, baseVersion,
      res.flatMap(_.dataFiles).toSeq, res.flatMap(_.dvFragments).toSeq,
      op, partitionEq = partitionEq()): Unit
    finally io.deleteRecursive(stagingDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    io.deleteRecursive(stagingDir)
}

private[sources] class GraftDeltaWriterFactory(
    stagingDir: String, rowSchema: StructType, dvSchema: StructType,
    dataFactory: OutputWriterFactory, dvFactory: OutputWriterFactory,
    dataConf: GraftSerializableConf, dvConf: GraftSerializableConf)
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaTaskWriter(stagingDir, rowSchema, dvSchema,
      dataFactory, dvFactory, dataConf, dvConf, partitionId, taskId)
}

/** One task's delta writer: two lazily-created parquet outputs —
  * deleted row addresses (as sidecar-grammar (file NAME, position)
  * rows) and inserted rows. Both stream straight to parquet; task
  * memory is O(1).
  */
private[sources] class GraftDeltaTaskWriter(
    stagingDir: String, rowSchema: StructType, dvSchema: StructType,
    dataFactory: OutputWriterFactory, dvFactory: OutputWriterFactory,
    dataConf: GraftSerializableConf, dvConf: GraftSerializableConf,
    partitionId: Int, taskId: Long) extends DeltaWriter[InternalRow] {

  private def ctx(conf: Configuration) =
    new TaskAttemptContextImpl(conf,
      new TaskAttemptID("graft-rl", 0, TaskType.MAP, partitionId,
        (taskId % Int.MaxValue).toInt))

  private var dataWriter: OutputWriter = _
  private var dvWriter: OutputWriter = _
  private val dataPath =
    f"$stagingDir/data-$partitionId%05d-$taskId.parquet"
  private val dvPath = f"$stagingDir/dv-$partitionId%05d-$taskId.parquet"
  private val dvRow = new GenericInternalRow(2)

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    // id = (_file, _pos) in rowId order; the sidecar stores file NAMES
    val path = id.getUTF8String(0).toString
    val name = path.substring(path.lastIndexOf('/') + 1)
    dvRow.update(0, UTF8String.fromString(name))
    dvRow.update(1, id.getLong(1))
    if (dvWriter == null)
      dvWriter = dvFactory.newInstance(dvPath, dvSchema, ctx(dvConf.value))
    dvWriter.write(dvRow)
  }

  override def insert(row: InternalRow): Unit = {
    if (dataWriter == null)
      dataWriter =
        dataFactory.newInstance(dataPath, rowSchema, ctx(dataConf.value))
    dataWriter.write(row)
  }

  override def update(meta: InternalRow, id: InternalRow,
                      row: InternalRow): Unit = {
    // unreachable with representUpdateAsDeleteAndInsert = true, but
    // the decomposition is the semantics either way
    delete(meta, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    close()
    GraftDeltaTaskResult(
      if (dataWriter != null) Seq(dataPath) else Seq.empty,
      if (dvWriter != null) Seq(dvPath) else Seq.empty)
  }

  override def abort(): Unit = {
    close()
    val fs = new org.apache.hadoop.fs.Path(stagingDir)
      .getFileSystem(dataConf.value)
    Seq(dataPath, dvPath).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), false): Unit)
  }

  private var closed = false

  override def close(): Unit = if (!closed) {
    closed = true
    if (dataWriter != null) dataWriter.close()
    if (dvWriter != null) dvWriter.close()
  }
}
