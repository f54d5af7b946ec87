package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver test data. Everything is a plain parquet
  * scan except `events`, whose `ts` column is physical
  * INT64 TIMESTAMP(NANOS) — a type Spark's reader refuses by default
  * (PARQUET_TYPE_ILLEGAL). We read it under the nanos-as-long legacy
  * flag and floor-convert to microseconds with exact integer arithmetic
  * (a double division would lose precision: epoch-nanos exceed 2^53).
  */
object Tables {

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
