package graft.sources

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnionExec}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Planner strategy that restores COLUMNAR reads to the unmasked
  * fraction of a deletion-vector-masked table.
  *
  * A V1 scan has ONE row shape, so a masked table's relation runs
  * row-based table-wide ([[GraftParquetFileFormat.supportBatch]] is
  * false whenever any mask is active) — even though typically only a
  * handful of files carry mask entries and everything else could use
  * the stock vectorized-batch parquet path. This strategy splits the
  * scan at PLAN time instead:
  *
  * {{{
  * Project(p, Filter(f, maskedGraftRelation))
  *   ==>  Union( Project(p, Filter(f, unmaskedFiles as stock parquet)),
  *               Project(p', Filter(f', maskedFiles as row-filter)) )
  * }}}
  *
  * Both children go back through `planLater`, so FileSourceStrategy
  * gives each one full filter pushdown, column pruning, and log-stats
  * file skipping ([[GraftFileIndex]] restricted to its half); the
  * unmasked child regains `supportBatch` (its format carries no mask)
  * and whole-stage batch codegen — an executed plan shows
  * ColumnarToRow on the unmasked branch ONLY. The masked child keeps
  * the in-scan row-index mask filter and its owned-row copies (the
  * fuzz-caught recycled-batch contract), now paid only on the files
  * that actually carry masks. Results are a disjoint row partition of
  * the original scan, so the union is exact.
  *
  * Registered idempotently on any session that builds a masked
  * relation ([[MaskedTableSplit.ensureInstalled]]) — the library
  * self-arms; no builder-time configuration needed.
  */
object MaskedTableSplit extends SparkStrategy {

  // the install is a read-modify-write of the session's
  // extraStrategies list — two threads building masked relations
  // concurrently must serialize it or one could double-install this
  // strategy / drop a strategy the other just added. The session's
  // own experimental-methods object is the natural per-session lock
  // (a user mutating extraStrategies directly without it remains
  // outside this guard, as with any unsynchronized Spark session use)
  def ensureInstalled(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(this))
        spark.experimental.extraStrategies =
          this +: spark.experimental.extraStrategies
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PhysicalOperation(projects, filters,
        lr @ LogicalRelation(fsRel: HadoopFsRelation, _, _, _, _))
        if splittable(fsRel) =>
      val idx = fsRel.location.asInstanceOf[GraftFileIndex]
      val fmt = fsRel.fileFormat.asInstanceOf[GraftParquetFileFormat]
      val masked = fmt.maskedNames
      def nameOf(f: String) = f.substring(f.lastIndexOf('/') + 1)
      val (mFiles, cFiles) =
        idx.liveFiles.partition(f => masked(nameOf(f)))
      val spark = idx.session
      // unmasked half: the STOCK parquet format — batch decode, batch
      // output, no mask machinery at all. A column-mapped table keeps
      // a mask-free graft format instead: physical-name translation
      // must ride along, and with no mask it still supports batch
      val cleanFmt: ParquetFileFormat =
        if (fmt.colMapping.isEmpty) new ParquetFileFormat()
        else new GraftParquetFileFormat(
          spark.sparkContext.broadcast(Map.empty[String, Array[Long]]),
          fmt.colMapping)
      val cleanRel = fsRel.copy(location = idx.restrictTo(cFiles),
        fileFormat = cleanFmt)(spark)
      val cleanChild = Project(projects,
        withFilters(filters,
          LogicalRelation(cleanRel, lr.output, lr.catalogTable,
            lr.isStreaming, lr.stream)))
      // masked half: the row-filter format over ONLY the masked
      // files, under fresh attribute ids (two relations cannot share
      // exprIds in one plan)
      val maskedRel = fsRel.copy(location = idx.restrictTo(mFiles))(spark)
      val attrMap: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
        AttributeReference] =
        lr.output.map(a => a.exprId -> a.newInstance()).toMap
      def remap(e: Expression): Expression = e.transform {
        case a: AttributeReference => attrMap.getOrElse(a.exprId, a)
      }
      val maskedProjects = projects.map {
        case al: Alias =>
          Alias(remap(al.child), al.name)(
            qualifier = al.qualifier,
            explicitMetadata = al.explicitMetadata)
        case ne => remap(ne).asInstanceOf[NamedExpression]
      }
      val maskedChild = Project(maskedProjects,
        withFilters(filters.map(remap),
          LogicalRelation(maskedRel,
            lr.output.map(a => attrMap(a.exprId)), lr.catalogTable,
            lr.isStreaming, lr.stream)))
      Seq(UnionExec(Seq(planLater(cleanChild), planLater(maskedChild))))
    case _ => Nil
  }

  /** Split only a graft relation whose mask is active AND whose live
    * set mixes masked and unmasked files — an all-masked (or
    * mask-free) scan has nothing to split, and the children this
    * strategy emits fail the mixed-set test, so it can never rematch
    * its own output.
    */
  private def splittable(fsRel: HadoopFsRelation): Boolean =
    (fsRel.location, fsRel.fileFormat) match {
      case (idx: GraftFileIndex, fmt: GraftParquetFileFormat) =>
        val masked = fmt.maskedNames
        if (masked.isEmpty) false
        else {
          def nameOf(f: String) = f.substring(f.lastIndexOf('/') + 1)
          val live = idx.liveFiles
          live.exists(f => masked(nameOf(f))) &&
            live.exists(f => !masked(nameOf(f)))
        }
      case _ => false
    }

  private def withFilters(filters: Seq[Expression],
                          child: LogicalPlan): LogicalPlan =
    filters.reduceOption(
      org.apache.spark.sql.catalyst.expressions.And(_, _))
      .map(Filter(_, child)).getOrElse(child)
}
