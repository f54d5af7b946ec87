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
}
