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

  /** Total data bytes + file count of a parquet directory. */
  def parquetStats(spark: SparkSession, path: String): (Long, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.map(_.getLen).sum, files.length)
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
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetBytes: Long, shuffle: Boolean = false): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val (total, _) = parquetStats(spark, inPath)
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    (if (shuffle) df.repartition(n) else df.coalesce(n))
      .write.mode("overwrite").parquet(outPath)
    n
  }
}
