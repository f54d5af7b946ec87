package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing (Deequ-style): a set of constraint
  * checks evaluated against a table, returning one row per check with
  * the measured metric and a pass/fail verdict. The pipeline use case is
  * gating an ingest batch before it reaches training: completeness,
  * key uniqueness, value ranges, predicate compliance, referential
  * integrity.
  *
  * Scale posture: every single-table check compiles into ONE aggregation
  * pass over the table (a multi-aggregate `agg`, partial-aggregated
  * map-side; `Unique` adds a distinct aggregate which Spark plans via
  * Expand — one extra shuffle of key-sized rows, the `q_profile`
  * precedent). Referential-integrity checks each add one anti-join
  * (AQE picks broadcast when the dim is small) whose 1-row count is
  * cross-joined back — the result plan never collects anything wider
  * than the final check rows. Metrics are IEEE divisions of exact
  * counts, so they reproduce bit-identically across engines.
  */
object Quality {

  /** One declarative constraint over the audited table. */
  sealed trait Check { def name: String }

  /** Fraction of non-null values in `column` must be >= `minFraction`
    * (1.0 = completeness). Metric: non-null fraction (1.0 on an empty
    * table — no row violates).
    */
  final case class NotNull(column: String, minFraction: Double = 1.0)
      extends Check { def name = s"not_null:$column" }

  /** `column` must be unique across the table. Metric: distinct count /
    * non-null count (1.0 on an empty table). Passes only at exactly 1.0.
    */
  final case class Unique(column: String) extends Check {
    def name = s"unique:$column"
  }

  /** Every non-null value of `column` must lie in [lo, hi]. Metric:
    * in-range fraction of non-null values.
    */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check { def name = s"in_range:$column" }

  /** Fraction of rows satisfying `predicate` must be >= `minFraction`.
    * NULL predicate results count as not satisfied (count-if
    * semantics).
    */
  final case class Satisfies(label: String, predicate: Column,
                             minFraction: Double) extends Check {
    def name = s"satisfies:$label"
  }

  /** Every non-null value of `column` must appear in `dim.dimColumn`
    * (referential integrity). Metric: the VIOLATION COUNT (rows whose
    * value has no match); passes at exactly 0.
    */
  final case class ForeignKey(column: String, dim: DataFrame,
                              dimColumn: String) extends Check {
    def name = s"foreign_key:$column"
  }

  /** Run `checks` against `df`: one row per check,
    * `(check STRING, metric DOUBLE, passed BOOLEAN)`, in the order
    * given. All single-table checks share one aggregation pass; each
    * [[ForeignKey]] adds one anti-join count.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")

    // one metric aggregate expression per single-table check; FK
    // metrics ride in as cross-joined 1-row anti-join counts
    val total = count(lit(1))
    def frac(num: Column, den: Column): Column =
      when(den === 0, lit(1.0)).otherwise(num.cast("double") / den)

    val aggExprs = checks.zipWithIndex.flatMap {
      case (NotNull(c, _), i) =>
        Some(frac(count(col(c)), total).as(s"__m$i"))
      case (Unique(c), i) =>
        Some(frac(count_distinct(col(c)), count(col(c))).as(s"__m$i"))
      case (InRange(c, lo, hi), i) =>
        Some(frac(count(when(col(c).between(lo, hi), 1)), count(col(c)))
          .as(s"__m$i"))
      case (Satisfies(_, p, _), i) =>
        Some(frac(count(when(p, 1)), total).as(s"__m$i"))
      case (_: ForeignKey, _) => None
    }

    // all-FK check lists still need a 1-row base to hang the
    // cross-joined counts on
    val base =
      if (aggExprs.isEmpty) df.agg(total.as("__base"))
      else df.agg(aggExprs.head, aggExprs.tail: _*)

    val withFks = checks.zipWithIndex.foldLeft(base) {
      case (acc, (ForeignKey(c, dim, dc), i)) =>
        val viol = df.filter(col(c).isNotNull)
          .join(dim, col(c) === dim(dc), "left_anti")
          .agg(count(lit(1)).cast("double").as(s"__m$i"))
        acc.crossJoin(viol)
      case (acc, _) => acc
    }

    val resultRows = checks.zipWithIndex.map { case (ck, i) =>
      val m = col(s"__m$i")
      val passed = ck match {
        case NotNull(_, f)      => m >= f
        case Unique(_)          => m === 1.0
        case InRange(_, _, _)   => m === 1.0
        case Satisfies(_, _, f) => m >= f
        case _: ForeignKey      => m === 0.0
      }
      struct(lit(ck.name).as("check"), m.as("metric"), passed.as("passed"))
    }

    withFks
      .select(explode(array(resultRows: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.metric").as("metric"),
        col("r.passed").as("passed"))
  }
}
