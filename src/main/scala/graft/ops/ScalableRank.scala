package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Global total-order analytics without a global window.
  *
  * Spark plans `ROW_NUMBER() OVER (ORDER BY x)` (no PARTITION BY) as a
  * single-partition sort — the whole table through one task. These
  * helpers compute the same numbers with a two-level scheme: an
  * explicit monotone bucket of the order key keeps the row-sized work
  * partitioned; only the per-bucket totals (thousands of rows of two
  * longs) cross a single partition; per-bucket offsets broadcast back.
  * [[TextAnalysis.packSequences]] builds on the same scaffold
  * ([[exclusivePrefixSum]]).
  */
object ScalableRank {

  /** The shared two-level scaffold: adds `__prefix` = the EXCLUSIVE
    * global running sum of `value` in the total order
    * (`bucket` asc nulls first, `orderCols` asc), and — when
    * `withTotal` — `__total` = the grand total, computed inside the
    * same tiny single-partition window (no extra scan of `df`).
    * `bucket` must be monotone non-decreasing in `orderCols` and
    * `(orderCols)` must be unique per row (ties would share a running
    * sum — the default RANGE frame is deliberate, making tie results
    * deterministic rather than partition-dependent).
    */
  private[ops] def exclusivePrefixSum(df: DataFrame, bucket: Column,
                                      orderCols: Seq[Column], value: Column,
                                      withTotal: Boolean = false): DataFrame = {
    val b = df.withColumn("__bucket", bucket).withColumn("__v", value.cast("long"))
    val inBucket = Window.partitionBy("__bucket").orderBy(orderCols: _*)
    val prefixW = Window.orderBy(col("__bucket").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totalW = Window.orderBy(col("__bucket").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // the offsets side renames its key: joining two attributes of the
    // same lineage would lean on Dataset's self-join disambiguation
    // heuristic (and log a trivially-true-predicate warning)
    val offsets = b.groupBy("__bucket").agg(sum("__v").as("__btotal"))
      .select(col("__bucket").as("__obucket"),
        coalesce(sum("__btotal").over(prefixW), lit(0L)).as("__boffset"),
        (if (withTotal) sum("__btotal").over(totalW) else lit(0L)).as("__total"))
    val joined = b
      .withColumn("__incl", sum("__v").over(inBucket))
      .join(broadcast(offsets), col("__bucket") <=> col("__obucket"))
      .withColumn("__prefix", col("__boffset") + col("__incl") - col("__v"))
      .drop("__bucket", "__obucket", "__incl", "__boffset", "__v")
    if (withTotal) joined else joined.drop("__total")
  }

  private def integralBucket(df: DataFrame, orderCol: String,
                             bucketWidth: Long): Column = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dt = df.schema(orderCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"orderCol $orderCol must be integral for DIV bucketing, got $dt")
    // NULL keys sort first under Spark's default ASC NULLS FIRST; give
    // them the lowest bucket so the join keeps them and offsets stay
    // exact (a genuine Long.MinValue key with bucketWidth 1 would share
    // the bucket — harmless, same bucket only means same shuffle key)
    when(col(orderCol).isNull, lit(Long.MinValue))
      .otherwise(expr(s"CAST($orderCol AS BIGINT) DIV $bucketWidth"))
  }

  /** 1-based global row number ordered by `(orderCol, tieCol)` —
    * `orderCol` integral, NULLS FIRST (Spark's window default);
    * `(orderCol, tieCol)` must be unique (`tieCol` is typically the
    * primary key). `bucketWidth` buckets the order key: pick it so
    * expected rows per bucket stay in the millions and the bucket
    * count in the thousands.
    */
  def globalRowNumber(df: DataFrame, orderCol: String, tieCol: String,
                      bucketWidth: Long = 1L << 10,
                      outCol: String = "rk"): DataFrame =
    exclusivePrefixSum(df, integralBucket(df, orderCol, bucketWidth),
      Seq(col(orderCol).asc_nulls_first, col(tieCol)), lit(1L))
      .withColumn(outCol, col("__prefix") + 1).drop("__prefix")

  /** Deterministic global training-order shuffle: assigns every row a
    * 1-based `shuffle_pos` in the pseudorandom total order
    * `(md5(key || ':' || seed) ASC, key ASC)` — the standard "shuffle
    * the corpus once per epoch, reproducibly" step in front of
    * sequence packing / batch emission. Same two-level prefix-sum
    * scaffold as [[globalRowNumber]]: rows are bucketed by the first 4
    * hex digits of the hash (a monotone prefix of the hex-string
    * order, 65k buckets), so no single-partition sort of the corpus
    * ever runs; only the 65k bucket totals cross one partition.
    *
    * `keyCol` must be unique and non-null (it is the tie-break and the
    * hash input). Different seeds give independent-looking orders;
    * the same seed gives the same order on any cluster layout. The
    * hash is md5 of a STRING rendering, so any engine can reproduce
    * the order (DuckDB oracle: `ROW_NUMBER() OVER (ORDER BY
    * md5(key || ':' || seed), key)`).
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: Long,
                           outCol: String = "shuffle_pos"): DataFrame = {
    val h = md5(concat(col(keyCol).cast("string"), lit(":" + seed)))
    val in = df.withColumn("__h", h)
    exclusivePrefixSum(in,
      conv(substring(col("__h"), 1, 4), 16, 10).cast("long"),
      Seq(col("__h"), col(keyCol)), lit(1L))
      .withColumn(outCol, col("__prefix") + 1)
      .drop("__prefix", "__h")
  }

  /** Hub-safe per-key top-k: the k smallest rows per key under
    * `(orderCols, tieCol)`, with their 1-based per-key rank — a
    * per-key `row_number() <= k` whose window partitions stay BOUNDED
    * even when one key holds half the corpus. Rows are pre-thinned per
    * (key, hash-bucket of the tie column): the true per-key top-k all
    * survive bucket-level top-k (each is top-k within its own bucket a
    * fortiori), so the second window ranks at most `k × buckets` rows
    * per key and reproduces the exact global per-key ranks. The
    * two-window pattern is [[graft.ops.Graph.labelPropagation]]'s hub
    * argmax, generalized.
    *
    * `tieCol` must be unique per key (it makes the order total, so
    * ranks are deterministic at any partitioning).
    */
  def perKeyTopK(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                 tieCol: String, k: Int, buckets: Int = 256,
                 outCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val fullOrder = orderCols :+ col(tieCol).asc
    val perBucket = Window
      .partitionBy(keyCols.map(col) :+ col("__b"): _*)
      .orderBy(fullOrder: _*)
    val perKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(fullOrder: _*)
    df.withColumn("__b", pmod(xxhash64(col(tieCol)), lit(buckets)))
      .withColumn("__rb", row_number().over(perBucket))
      .filter(col("__rb") <= k)
      .withColumn(outCol, row_number().over(perKey))
      .filter(col(outCol) <= k)
      .drop("__b", "__rb")
  }

  /** Exclusive global running sum of `valueCol` in `orderCol` order
    * (integral, unique, NULLS FIRST), as `__prefix` — the raw
    * two-level scaffold for cumulative-size planning
    * ([[Maintenance.compactionPlan]]). Same contract as
    * [[globalRowNumber]] with the row count replaced by a value.
    */
  def prefixSumBy(df: DataFrame, orderCol: String, valueCol: String,
                  bucketWidth: Long = 1L << 10): DataFrame =
    exclusivePrefixSum(df, integralBucket(df, orderCol, bucketWidth),
      Seq(col(orderCol).asc_nulls_first), col(valueCol))

  /** [[globalNtile]] with a caller-supplied order and bucket — for
    * non-integral order keys (e.g. a rounded double score): `bucket`
    * must be integral and monotone non-decreasing in `orderCols`, and
    * `orderCols` must be unique per row. The tile split is the same
    * SQL NTILE arithmetic, so a single-partition
    * `NTILE(k) OVER (ORDER BY …)` oracle reproduces it exactly.
    */
  def globalNtileBy(df: DataFrame, tiles: Int, orderCols: Seq[Column],
                    bucket: Column, outCol: String = "tile"): DataFrame = {
    require(tiles > 0, s"tiles must be positive, got $tiles")
    exclusivePrefixSum(df, bucket, orderCols, lit(1L), withTotal = true)
      .withColumn("__gr", col("__prefix") + 1)
      .withColumnRenamed("__total", "__n")
      .withColumn(outCol, ntileExpr(tiles))
      .drop("__prefix", "__gr", "__n")
  }

  /** The SQL NTILE arithmetic over `__gr` (1-based global rank) and
    * `__n` (total rows) — shared by [[globalNtile]] and
    * [[globalNtileBy]].
    */
  private def ntileExpr(tiles: Int): Column =
    expr(s"""CASE
            |  WHEN __n DIV $tiles = 0 THEN __gr
            |  WHEN __gr <= (__n % $tiles) * (__n DIV $tiles + 1)
            |    THEN (__gr - 1) DIV (__n DIV $tiles + 1) + 1
            |  ELSE (__n % $tiles)
            |    + (__gr - 1 - (__n % $tiles) * (__n DIV $tiles + 1))
            |      DIV (__n DIV $tiles) + 1
            |END""".stripMargin).cast("int")

  /** SQL-standard NTILE over the same scalable global order: the first
    * `n mod tiles` tiles hold `ceil(n/tiles)` rows, the rest
    * `floor(n/tiles)` — bit-identical to `NTILE(k) OVER (ORDER BY ...)`
    * but without the single-partition sort. The total row count rides
    * out of the bucket-totals window, so no extra scan and no cross
    * join.
    */
  def globalNtile(df: DataFrame, tiles: Int, orderCol: String, tieCol: String,
                  bucketWidth: Long = 1L << 10,
                  outCol: String = "tile"): DataFrame = {
    require(tiles > 0, s"tiles must be positive, got $tiles")
    exclusivePrefixSum(df, integralBucket(df, orderCol, bucketWidth),
      Seq(col(orderCol).asc_nulls_first, col(tieCol)), lit(1L),
      withTotal = true)
      .withColumn("__gr", col("__prefix") + 1)
      .withColumnRenamed("__total", "__n")
      .withColumn(outCol, ntileExpr(tiles))
      .drop("__prefix", "__gr", "__n")
  }

  /** EXACT global quantiles by distributed selection — the value at
    * row `ceil(q * n)` of the sorted column, for each `q`, computed
    * WITHOUT a global sort and WITHOUT ranking every row:
    *
    *  1. one scan builds a monotone-bucket histogram
    *     (`floor(value / bucketWidth)` — order-preserving for any
    *     doubles, so bucket order = value order);
    *  2. cumulative counts over the BUCKET-sized histogram locate, for
    *     each quantile, the bucket holding its target rank and the
    *     residual rank inside it (plan-side join, no driver collect);
    *  3. a second scan touches ONLY the target buckets (broadcast
    *     semi-shaped join) and picks the residual-th smallest value
    *     per quantile — the only sort that runs is over one bucket's
    *     rows per quantile.
    *
    * Ties are harmless: the value at a fixed rank is the same under
    * any tie ordering. NULLs are excluded (SQL quantile semantics).
    * Pick `bucketWidth` so a bucket's rows fit an executor —
    * the in-bucket selection sorts one bucket per quantile.
    *
    * Unlike `percentile_approx`, the result is exact; unlike
    * `percentile`, nothing corpus-sized concentrates on one task.
    */
  def globalQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
                      bucketWidth: Double): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile fraction")
    require(qs.forall(q => q > 0.0 && q <= 1.0), s"fractions in (0, 1]: $qs")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val b = df.select(col(valueCol).cast("double").as("__val"))
      .filter(col("__val").isNotNull)
      .withColumn("__bucket", floor(col("__val") / bucketWidth).cast("long"))
    val hist = b.groupBy("__bucket").agg(count(lit(1)).as("__cnt"))
    val before = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // bucket-sized input: only histogram rows cross the single
    // partition these windows imply (the scaffold's usual contract)
    val cum = hist.select(col("__bucket"), col("__cnt"),
      coalesce(sum("__cnt").over(before), lit(0L)).as("__before"),
      sum("__cnt").over(whole).as("__n"))
    val targets = cum.crossJoin(qs.toDF("q"))
      .withColumn("__k", ceil(col("q") * col("__n")).cast("long"))
      .filter(col("__before") < col("__k") &&
        col("__k") <= col("__before") + col("__cnt"))
      .select(col("q"), col("__bucket").as("__tbucket"),
        (col("__k") - col("__before")).as("__resid"))
    val inTarget = b.join(broadcast(targets),
      col("__bucket") === col("__tbucket"))
    val w = Window.partitionBy("q").orderBy("__val")
    inTarget.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === col("__resid"))
      .select(col("q"), col("__val").as(valueCol))
  }

  /** Systematic probability-proportional-to-size (PPS) sampling with
    * EXACT integer arithmetic: lay the rows on a line in `keyCol`
    * order, each occupying a segment of length `weightCol`; drop `k`
    * equally-spaced picks at positions `(2j+1)·W / (2k)`, j = 0..k−1
    * (W = total weight) and return each row hit at least once with its
    * hit count. Every comparison is integer (`(2j+1)·W < 2k·x`
    * rearranged into two floor divisions), so the sample is
    * bit-reproducible on any engine — no transcendental "random" keys
    * — and Σ n_picks = k exactly. A row with weight ≥ W/k can be hit
    * multiple times (its multiplicity is the resampling count, the
    * standard PPS-with-replacement reading); zero-weight rows are
    * never picked.
    *
    * Same two-level prefix-sum scaffold as [[globalRowNumber]]: the
    * cumulative weight never runs a global window. Overflow bound:
    * needs `2·k·W < 2^63`.
    *
    * @param keyCol unique integral order/identity column
    * @return rows with (keyCol, weight, n_picks), n_picks >= 1
    */
  def ppsSample(df: DataFrame, weightCol: String, k: Int, keyCol: String,
                bucketWidth: Long = 1L << 10): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val in = df.select(col(keyCol), col(weightCol).cast("long").as("weight"))
    val pref = exclusivePrefixSum(in,
      integralBucket(in, keyCol, bucketWidth),
      Seq(col(keyCol).asc_nulls_first), col("weight"), withTotal = true)
    // f(x) = #{ j >= 0 : (2j+1)·W < 2k·x } = (2k·x + W − 1) div 2W for
    // x >= 0; picks in this row's segment = f(cum + w) − f(cum)
    // W = 0 (empty/all-zero input) must yield no picks, not an ANSI
    // divide-by-zero
    pref.select(col(keyCol), col("weight"),
        when(col("__total") > 0,
          expr(s"(2L * $k * (__prefix + weight) + __total - 1) div (2L * __total)") -
            expr(s"(2L * $k * __prefix + __total - 1) div (2L * __total)"))
          .otherwise(lit(0L)).as("n_picks"))
      .filter(col("n_picks") >= 1)
  }
}
