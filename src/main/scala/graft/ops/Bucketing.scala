package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table ONCE at write time
  * so every later equi-join/aggregation on the bucket key runs with no
  * exchange on that side — the 100 TB answer to "this join shuffles
  * 100 TB every night". Spark bucketing needs a table catalog entry
  * (`saveAsTable`), which works against the default local warehouse.
  */
object Bucketing {

  /** Write `df` bucketed (and sorted) by `key` into `buckets` buckets as
    * managed table `name` (overwriting any previous one).
    */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a crashed previous run can leave an orphaned location with no
    // catalog entry; managed-table creation refuses to reuse it
    val loc = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$name").getPath
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val dir = new java.io.File(loc)
    if (dir.exists()) rm(dir)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)
  }

  def read(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True when the physical plan of `df` contains no SHUFFLE exchange
    * (hash/range/single-partition repartitioning) — the property
    * bucketed joins/aggregations buy. Broadcast exchanges don't count:
    * they move the small side, not the bucketed data.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
      "Exchange SinglePartition").exists(plan.contains)
  }
}
