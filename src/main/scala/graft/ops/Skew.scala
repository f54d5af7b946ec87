package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers
  * sort-merge joins at runtime; these are the explicit forms for the
  * cases AQE can't rewrite (hot-key equi-joins where one side must be
  * replicated, pre-aggregation under a skewed group key).
  */
object Skew {

  /** Salted inner equi-join for a skewed LEFT side: left rows get a
    * random-but-deterministic salt in [0, saltFactor); the right side is
    * replicated once per salt value. The shuffle key becomes
    * (key, salt), splitting each hot key across `saltFactor` reducers.
    * Result is row-identical to `left.join(right, key)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for a skewed group key: first aggregate on
    * (key, salt) — spreading a hot key over `saltFactor` partial groups —
    * then combine the partials. `partial` and `combine` must form a
    * decomposable aggregate (sum/count/min/max...).
    */
  def saltedAggregate(df: DataFrame, key: String, valueCol: String,
                      saltFactor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(valueCol).cast("string"),
          monotonically_increasing_id()), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count("*").as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"), sum(col("__n")).as("n"))
}
