package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver test data. Everything is a plain parquet
  * scan except `events`, whose `ts` column has shipped in two physical
  * forms across testdata revisions: INT64 TIMESTAMP(NANOS) — a type
  * Spark's reader refuses by default (PARQUET_TYPE_ILLEGAL), read under
  * the nanos-as-long legacy flag and floor-converted to microseconds
  * with exact integer arithmetic (a double division would lose
  * precision: epoch-nanos exceed 2^53) — and plain TIMESTAMP(MICROS),
  * which needs no conversion. The loader dispatches on the decoded
  * type, so both revisions read to the same logical column.
  */
object Tables {

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Normalize the `ts` column of either events revision to TIMESTAMP
    * (instant, UTC session). Also applies unchanged to a streaming
    * DataFrame (both branches are plain column expressions).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long revision
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // TIMESTAMP(MICROS) isAdjustedToUTC=false decodes as NTZ; the
        // engine contract is TIMESTAMP (instant, UTC session), and the
        // NTZ->LTZ cast under the UTC session re-reads the same wall
        // clock as the same instant the old nanos revision carried
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
}
