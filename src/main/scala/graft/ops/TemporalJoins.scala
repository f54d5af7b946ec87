package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark has no built-in for (BASELINE
  * north-star extensions — no reference counterpart; both are shaped for
  * 100 TB: one equi-shuffle each, never a range cross product).
  */
object TemporalJoins {

  /** As-of join: for every left row, attach the payload of the single
    * right row with the greatest `tsCol` <= left's `tsCol` (backward,
    * the default) or the smallest >= (forward), within the same `keys`
    * group — the standard "latest quote for each trade" join.
    *
    * NOT implemented as a range join: both sides are unioned with a
    * side tag and a single window pass per key carries the most recent
    * right payload forward onto left rows. That is ONE shuffle on the
    * key columns, no per-row range probe, no candidate blowup — the
    * 100 TB plan is sort-merge within key partitions, which AQE can
    * split on skewed keys. (A broadcast range join would need the whole
    * right side on every executor; the union-window needs nothing
    * resident.)
    *
    * The right payload rides in ONE struct column, so `last(_,
    * ignoreNulls)` selects the latest right ROW even when individual
    * payload fields are legitimately null. Left rows win ties (a right
    * row at exactly left's timestamp is visible to it); several right
    * rows sharing (keys, ts) are ordered by their payload struct, so
    * the pick is deterministic rather than partition-order: backward
    * and forward both take the LARGEST payload (`last()` over the
    * ascending-payload tie run); nearest takes the largest on its
    * backward frame and the smallest on its forward frame (`first()`).
    * Pinned by spec with duplicate-(keys, ts) rows.
    *
    * Output: every left row + `prefix`-renamed right payload columns
    * (null where no right row qualifies — a LEFT as-of join), with
    * `prefix + tsCol` always included. `tolerance` (e.g.
    * `expr("INTERVAL 10 MINUTES")`) nulls payloads older than
    * `left.ts - tolerance`.
    */
  /** `direction = "nearest"` matches the CLOSEST right row in either
    * direction (ties prefer the backward match, so a right row at
    * exactly left's timestamp always wins). Still ONE shuffle+sort:
    * both the latest-preceding and earliest-following candidates come
    * from two frames over the SAME ascending window order, then a
    * per-row distance compare picks. `tolerance` bounds EACH side
    * before the pick (an out-of-tolerance backward match must not
    * shadow an in-tolerance forward one).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightPayload: Seq[String],
               prefix: String = "asof_",
               direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    if (direction == "nearest")
      return asOfNearest(left, right, keys, tsCol, rightPayload, prefix,
        tolerance)
    val payloadCols = (tsCol +: rightPayload.filterNot(_ == tsCol))
    val leftCols = left.columns.toSeq
    val unioned = tagAndUnion(left, right, keys, tsCol, payloadCols)
    // backward: ascending ts, right (side 0) before left at equal ts so
    // left sees it; forward: descending ts, same tie rule. The payload
    // struct is the FINAL sort key: several right rows sharing
    // (keys, ts) would otherwise have no defined order and last() would
    // pick nondeterministically — the struct compares field-wise
    // (tsCol first, then the payload columns), so the pick is total
    // (identical payloads tie, but then either pick is the same row).
    // Only when the struct is ORDERABLE: a map-typed payload column
    // would fail analysis as a sort key, so such payloads keep the
    // (documented) partition-order pick on duplicate (keys, ts) rows
    // instead of rejecting the join outright.
    val tieKey = payloadTieKey(right, payloadCols)
    val ord =
      if (direction == "backward")
        Seq(col(tsCol).asc, col("__side").asc) ++ tieKey
      else Seq(col(tsCol).desc, col("__side").asc) ++ tieKey
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a left row with a NULL key or NULL ts matches nothing either
    // (equi-join and <= are both UNKNOWN on NULL)
    val leftNullable = (keys :+ tsCol).map(col(_).isNull).reduce(_ || _)
    val withAsof = unioned
      .withColumn("__hit", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("__hit", when(leftNullable, lit(null)).otherwise(col("__hit")))
    val bounded = tolerance match {
      case Some(tol) =>
        val inRange =
          if (direction == "backward") col("__hit")(tsCol) >= col(tsCol) - tol
          else col("__hit")(tsCol) <= col(tsCol) + tol
        withAsof.withColumn("__hit", when(inRange, col("__hit")))
      case None => withAsof
    }
    bounded.select(leftCols.map(col) ++
      payloadCols.map(c => col("__hit")(c).as(prefix + c)): _*)
  }

  /** The duplicate-(keys, ts) tie-break key of the as-of family: the
    * payload struct, when every payload column's type is orderable
    * (sortable by Catalyst). Non-orderable payloads (e.g. a MAP column)
    * cannot be sort keys at all — for them the tie pick on duplicate
    * right (keys, ts) rows falls back to partition order, which is the
    * pre-existing behavior for a constraint the engine cannot express.
    */
  private def payloadTieKey(right: DataFrame,
                            payloadCols: Seq[String]): Seq[Column] =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        payloadStructType(right, payloadCols)))
      Seq(col("__asof").asc)
    else Seq.empty

  /** The `__asof` payload struct's type — single definition shared by
    * the orderability check and tagAndUnion's null-struct cast, so the
    * two can never drift apart.
    */
  private def payloadStructType(right: DataFrame, payloadCols: Seq[String])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(payloadCols.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))

  /** Shared tag-and-union scaffold of the as-of family: left rows carry
    * `__side = 1` and a null payload struct; right rows (NULL keys/ts
    * dropped — they can never satisfy the equi+inequality predicate)
    * carry `__side = 0` and their payload struct, schema-aligned to the
    * left columns.
    */
  private def tagAndUnion(left: DataFrame, right: DataFrame,
                          keys: Seq[String], tsCol: String,
                          payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__asof",
        lit(null).cast(payloadStructType(right, payloadCols)))
    val rTagged = right
      .filter((keys :+ tsCol).map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) :+ col(tsCol) :+
        struct(payloadCols.map(col): _*).as("__asof"): _*)
      .withColumn("__side", lit(0))
    val rAligned = rTagged.select(leftCols.map(c =>
      if (keys.contains(c) || c == tsCol) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c)) ++
      Seq(col("__side"), col("__asof")): _*)
    lTagged.select((leftCols.map(col) ++
      Seq(col("__side"), col("__asof"))): _*).unionByName(rAligned)
  }

  /** Nearest-direction as-of: see [[asOfJoin]]'s scaladoc. Both
    * candidates come from one ascending sort — the backward hit from
    * the `unbounded preceding..current` frame, the forward hit from
    * `current..unbounded following` (a right row at exactly left's ts
    * sorts BEFORE the left row, so it is a distance-0 backward hit and
    * wins regardless) — then one exact microsecond-distance compare
    * picks, ties to backward.
    */
  private def asOfNearest(left: DataFrame, right: DataFrame,
                          keys: Seq[String], tsCol: String,
                          rightPayload: Seq[String], prefix: String,
                          tolerance: Option[Column]): DataFrame = {
    val payloadCols = (tsCol +: rightPayload.filterNot(_ == tsCol))
    val leftCols = left.columns.toSeq
    val unioned = tagAndUnion(left, right, keys, tsCol, payloadCols)
    // the trailing payload-struct key makes the order total when right
    // rows share (keys, ts) — same determinism rule as the
    // backward/forward path (last() takes the largest payload, first()
    // the smallest; both are fixed picks instead of partition-order);
    // omitted for non-orderable payload types (see payloadTieKey)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col(tsCol).asc, col("__side").asc) ++
        payloadTieKey(right, payloadCols): _*)
    val wBack = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val leftNullable = (keys :+ tsCol).map(col(_).isNull).reduce(_ || _)
    def bound(hit: Column, backward: Boolean): Column = tolerance match {
      case Some(tol) =>
        when(if (backward) hit(tsCol) >= col(tsCol) - tol
             else hit(tsCol) <= col(tsCol) + tol, hit)
      case None => hit
    }
    val distB = unix_micros(col(tsCol)) - unix_micros(col("__b")(tsCol))
    val distF = unix_micros(col("__f")(tsCol)) - unix_micros(col(tsCol))
    val picked = unioned
      .withColumn("__b", last(col("__asof"), ignoreNulls = true).over(wBack))
      .withColumn("__f", first(col("__asof"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)
      .withColumn("__b", bound(col("__b"), backward = true))
      .withColumn("__f", bound(col("__f"), backward = false))
      .withColumn("__hit",
        when(leftNullable, lit(null))
          .when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(distB <= distF, col("__b"))
          .otherwise(col("__f")))
    picked.select(leftCols.map(col) ++
      payloadCols.map(c => col("__hit")(c).as(prefix + c)): _*)
  }

  /** Range join: pairs of rows in the same `keys` group with
    * `0 < right.ts - left.ts <= maxGap` (microseconds). Implemented by
    * time-bucket binning: each timestamp lands in a `maxGap`-wide bin,
    * the right side additionally probes the PRECEDING bin, and the
    * true predicate filters after an equi-join on (keys, bin) — a
    * bounded-key shuffle join; the naive formulation is a per-key cross
    * product that Spark plans as BroadcastNestedLoopJoin.
    *
    * Returned columns: `keys`, then `left`'s columns suffixed `_a`,
    * `right`'s suffixed `_b`, and `gap_us`.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                tsCol: String, maxGapUs: Long): DataFrame = {
    require(maxGapUs > 0, "maxGapUs must be positive")
    // exact floor division: double-precision `/` would mis-bin epochs
    // beyond 2^53 micros; pmod makes the numerator an exact multiple of
    // the gap (floor semantics for pre-1970 timestamps too) and the
    // decimal divide is exact integer arithmetic
    val binOf = (c: Column) => {
      val us = unix_micros(c)
      ((us - pmod(us, lit(maxGapUs))).cast("decimal(38,0)") / maxGapUs)
        .cast("long")
    }
    val lSide = left.select(keys.map(col) ++
      left.columns.filterNot(keys.contains).map(c => col(c).as(s"${c}_a")): _*)
      .withColumn("__bin", binOf(col(s"${tsCol}_a")))
    // a right row at bin b can pair with left rows in bins {b-1, b}
    val rSide = right.select(keys.map(col) ++
      right.columns.filterNot(keys.contains).map(c => col(c).as(s"${c}_b")): _*)
      .withColumn("__bin",
        explode(array(binOf(col(s"${tsCol}_b")) - 1, binOf(col(s"${tsCol}_b")))))
    lSide.join(rSide, keys :+ "__bin")
      .withColumn("gap_us",
        unix_micros(col(s"${tsCol}_b")) - unix_micros(col(s"${tsCol}_a")))
      .filter(col("gap_us") > 0 && col("gap_us") <= maxGapUs)
      .drop("__bin")
  }

  /** Merge overlapping intervals per key (the "islands" problem):
    * intervals `[startCol, endCol]` of one key group collapse into
    * maximal covered spans — availability windows, outage coverage,
    * contiguous validity ranges. Intervals touch when
    * `next.start <= running max end` (closed-interval semantics:
    * back-to-back intervals sharing an endpoint merge).
    *
    * One shuffle: a per-key window ordered by `(start, end)` computes
    * the running max end over the strict prefix; a span starts where
    * the current start exceeds it; the span id is the running count of
    * starts; a final per-(key, span) aggregate emits the span. Ties in
    * `(start, end)` leave the intra-tie order undefined, but the
    * OUTPUT is order-invariant: equal-start intervals always overlap,
    * so they always land in the same span, and per-span min/max/count
    * don't depend on which tied row carried the span flag.
    *
    * Scale: partitions are key-bounded (the sessionization /
    * running-total precedent); nothing global, nothing on the driver.
    *
    * @return keys ++ (span_start, span_end, n_intervals)
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String], startCol: String,
                     endCol: String): DataFrame = {
    val order = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(order.rowsBetween(Window.unboundedPreceding, -1))
    df.select(keys.map(col) :+ col(startCol) :+ col(endCol): _*)
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__span", sum(col("__new"))
        .over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keys.map(col) :+ col("__span"): _*)
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .select(keys.map(col) :+ col("span_start") :+ col("span_end") :+
        col("n_intervals"): _*)
  }
}
