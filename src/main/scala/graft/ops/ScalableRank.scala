package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global total-order analytics without a global window.
  *
  * Spark plans `ROW_NUMBER() OVER (ORDER BY x)` (no PARTITION BY) as a
  * single-partition sort — the whole table through one task. These
  * helpers compute the same numbers with the two-level scheme also used
  * by [[TextAnalysis.packSequences]]: an explicit monotone bucket of
  * the order key keeps the row-sized work partitioned; only the
  * per-bucket row counts (thousands of rows of two longs) cross a
  * single partition; per-bucket rank offsets broadcast back.
  *
  * The bucket expression MUST be monotone non-decreasing in the order
  * key (`key DIV bucketWidth` is, for integral keys) — then
  * (bucket asc, key asc, tie asc) is the global order.
  */
object ScalableRank {

  /** 1-based global row number ordered by `(orderCol, tieCol)`, both
    * integral; `(orderCol, tieCol)` must be unique (`tieCol` is
    * typically the primary key). `bucketWidth` buckets the order key:
    * pick it so the expected rows per bucket stay in the millions and
    * the bucket count in the thousands.
    */
  def globalRowNumber(df: DataFrame, orderCol: String, tieCol: String,
                      bucketWidth: Long = 1L << 10,
                      outCol: String = "rk"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val bucketed = df.withColumn("__bucket",
      expr(s"CAST($orderCol AS BIGINT) DIV $bucketWidth"))
    val inBucket = Window.partitionBy("__bucket")
      .orderBy(col(orderCol), col(tieCol))
    val bucketPrefix = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__bucket").agg(count(lit(1)).as("__bn"))
      .select(col("__bucket"),
        coalesce(sum("__bn").over(bucketPrefix), lit(0L)).as("__boffset"))
    bucketed
      .withColumn("__rn", row_number().over(inBucket))
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn(outCol, col("__boffset") + col("__rn"))
      .drop("__bucket", "__rn", "__boffset")
  }

  /** SQL-standard NTILE over the same scalable global order: the first
    * `n mod tiles` tiles hold `ceil(n/tiles)` rows, the rest
    * `floor(n/tiles)` — bit-identical to `NTILE(k) OVER (ORDER BY ...)`
    * but without the single-partition sort. One extra 1-row aggregate
    * (the total count) broadcasts into the tile arithmetic.
    */
  def globalNtile(df: DataFrame, tiles: Int, orderCol: String, tieCol: String,
                  bucketWidth: Long = 1L << 10,
                  outCol: String = "tile"): DataFrame = {
    require(tiles > 0, s"tiles must be positive, got $tiles")
    val ranked = globalRowNumber(df, orderCol, tieCol, bucketWidth, "__gr")
    val total = df.agg(count(lit(1)).as("__n"))
    // q = n DIV k rows per small tile, m = n % k tiles hold q+1 rows
    ranked.crossJoin(broadcast(total))
      .withColumn(outCol,
        expr(s"""CASE
                 |  WHEN __n DIV $tiles = 0 THEN __gr
                 |  WHEN __gr <= (__n % $tiles) * (__n DIV $tiles + 1)
                 |    THEN (__gr - 1) DIV (__n DIV $tiles + 1) + 1
                 |  ELSE (__n % $tiles)
                 |    + (__gr - 1 - (__n % $tiles) * (__n DIV $tiles + 1))
                 |      DIV (__n DIV $tiles) + 1
                 |END""".stripMargin).cast("int"))
      .drop("__gr", "__n")
  }
}
