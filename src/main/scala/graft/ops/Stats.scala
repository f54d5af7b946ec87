package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portable descriptive statistics. The engine-reproducibility problem
  * with naive `corr()`/windowed `avg()` over doubles is summation
  * order: a double sum differs at ~1e-15 per partitioning, so two
  * engines (or two runs) disagree in the last bits. The operators here
  * accumulate EXACT decimal moments (decimal sums are
  * partitioning-invariant) and only then evaluate the final formula in
  * double arithmetic — identical IEEE inputs, identical IEEE ops,
  * bit-identical results on any engine, no rounding fudge needed.
  */
object Stats {

  /** Grouped Pearson correlation from exact decimal moments.
    *
    * Per group: one aggregation pass collects
    * `n, Σx, Σy, Σx², Σy², Σxy` with x, y cast to DECIMAL(18,4)
    * (exact, order-independent sums; inputs with ≤4 fractional digits
    * round identically from binary doubles on every engine). The
    * correlation
    * `r = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̂) · √(n·Σy² − Σy²̂))`
    * is then computed in double over those exact moments — a fixed
    * sequence of IEEE ops, so the result needs NO rounding to
    * hash-match across engines. Zero-variance groups yield NULL.
    *
    * One shuffle on the group key, map-side partial aggregation; the
    * decimal product Σxy sums DECIMAL(37,8) values — exact up to 30
    * integer digits, far beyond any realistic measure column.
    */
  def pearson(df: DataFrame, groupCols: Seq[String],
              xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "pearson needs at least one group column")
    val xd = col(xCol).cast("decimal(18,4)")
    val yd = col(yCol).cast("decimal(18,4)")
    val m = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(xd).as("sx"), sum(yd).as("sy"),
        sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"),
        sum(xd * yd).as("sxy"))
    def d(c: String): Column = col(c).cast("double")
    val nD = col("n").cast("double")
    val varX = nD * d("sxx") - d("sx") * d("sx")
    val varY = nD * d("syy") - d("sy") * d("sy")
    val cov = nD * d("sxy") - d("sx") * d("sy")
    m.select(groupCols.map(col) ++ Seq(
      col("n"),
      when(varX > 0 && varY > 0, cov / (sqrt(varX) * sqrt(varY)))
        .as("corr")): _*)
  }

  /** Trailing-window z-score — time-series anomaly detection for
    * pipeline monitoring (a batch whose volume/quality metric jumps
    * N sigmas off its own trailing distribution): for each row,
    * `z = (x − mean) / stddev` over the `k` rows STRICTLY BEFORE it
    * (the current row is excluded so an anomaly cannot dilute its own
    * baseline). Rows with fewer than `k` predecessors or zero
    * variance get NULL.
    *
    * Same exact-moment recipe as [[pearson]]: the frame accumulates
    * decimal `Σx, Σx²` (order-invariant), and mean / sample-stddev /
    * z evaluate in double over exact inputs — bit-reproducible, no
    * rounding. Empty `partitionCols` ⇒ one global window: only legal
    * on dimension-sized inputs (per-day aggregates).
    */
  def movingZScore(df: DataFrame, orderCol: String, valueCol: String,
                   k: Int, partitionCols: Seq[String] = Nil): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val w0 =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = w0.rowsBetween(-k, -1)
    val xd = col(valueCol).cast("decimal(18,2)")
    val x = xd.cast("double")
    val n = count(xd).over(w).cast("double")
    val sx = sum(xd).over(w).cast("double")
    val sxx = sum(xd * xd).over(w).cast("double")
    val varN = n * sxx - sx * sx // n²·(n−1)/n · sample variance
    df.withColumn("z",
      when(count(xd).over(w) >= k && varN > 0,
        (x - sx / n) / sqrt(varN / (n * (n - lit(1.0))))))
  }

  /** Trailing `k`-row moving average of `valueCol` (cast to
    * DECIMAL(18,2)) ordered by `orderCol` within `partitionCols`:
    * frame sum is an exact decimal (order-invariant), the average is
    * one double division of exact inputs — reproducible without
    * rounding. Rows earlier than `k-1` positions average what exists
    * (standard leading-edge semantics).
    *
    * An EMPTY `partitionCols` runs one global window — only legal when
    * the input is dimension-sized (e.g. a per-day aggregate, bounded
    * by the calendar); corpus-sized inputs must partition.
    */
  def movingAverage(df: DataFrame, orderCol: String, valueCol: String,
                    k: Int, partitionCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w0 =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = w0.rowsBetween(-(k - 1), Window.currentRow)
    df.withColumn("moving_avg",
      sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double") /
        count(lit(1)).over(w))
  }
}
