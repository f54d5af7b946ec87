package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics primitives over an event stream `(user_id, ts,
  * event_type, ...)` — the batch counterparts to the sessionization in
  * [[graft.streaming.StreamingOps]]: funnels answer "how far do users
  * get through an ordered flow", retention answers "do cohorts come
  * back".
  *
  * Scale posture: both operators reduce the event stream to USER-sized
  * tables with one partial-aggregated shuffle per step (funnel) or per
  * scan (retention); every subsequent join keys on the user id. No
  * windows over the raw stream, nothing event-sized past the first
  * aggregate, nothing on the driver.
  */
object EventAnalytics {

  /** Strict-order funnel: for each step i, a user qualifies iff they
    * have a `steps(i)` event strictly after their chosen `steps(i-1)`
    * event. The greedy earliest-match (min timestamp at every step) is
    * optimal for unwindowed funnels — taking the earliest occurrence
    * can only enlarge the set of later events available — so counts
    * are maximal and deterministic.
    *
    * One filtered scan + one user-keyed aggregate per step (k tiny);
    * per-step counts stay distributed (a union of 1-row aggregates —
    * no scalars through the driver).
    *
    * @return (step_index, step, n_users), one row per step
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val e = events.select(col(userCol).as("user_id"),
      col(typeCol).as("__et"), col(tsCol).as("__ts"))
    var reached = e.filter(col("__et") === steps.head)
      .groupBy("user_id").agg(min(col("__ts")).as("__t"))
      .localCheckpoint() // consumed twice: its count + the next join
    val perStep = scala.collection.mutable.ListBuffer(
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(0).as("step_index"), lit(steps.head).as("step"),
          col("n_users")))
    for ((st, i) <- steps.tail.zipWithIndex) {
      reached = e.filter(col("__et") === st)
        .join(reached.select(col("user_id"), col("__t").as("__prev")),
          "user_id")
        .filter(col("__ts") > col("__prev"))
        .groupBy("user_id").agg(min(col("__ts")).as("__t"))
        .localCheckpoint()
      perStep += reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_index"), lit(st).as("step"),
          col("n_users"))
    }
    perStep.reduce(_ unionByName _)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for every consecutive pair of events of one user
    * (ordered by `(tsCol, tieCol)` — the tie column makes the order
    * total, so `lead` is deterministic), count the `from → to`
    * transition and report its conditional probability
    * `p = n / Σ n over from_type`.
    *
    * Scale posture: the only event-sized shuffle is the per-user
    * window (user-bounded partitions — the sessionization precedent);
    * the transition table itself is |event types|² rows, so the
    * normalizing window over `from_type` runs on a bounded table no
    * matter the corpus size. `p` is an IEEE division of two exact
    * integers — engine-identical unrounded.
    *
    * @return (from_type, to_type, n, p)
    */
  def transitions(events: DataFrame, userCol: String = "user_id",
                  typeCol: String = "event_type", tsCol: String = "ts",
                  tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val counts = events
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val norm = Window.partitionBy("from_type")
    counts.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(norm).cast("double"))
  }

  /** Weekly cohort retention: users are cohorted by the ISO week
    * (Monday-truncated) of their first event; for every later active
    * week the count of distinct cohort members still active is
    * reported at its integer week offset. `week_offset = 0` is the
    * cohort size itself.
    *
    * The stream collapses to distinct (user, week) pairs immediately
    * (partial aggregation bounds hot users); the first-week table is
    * user-sized; the offset arithmetic is exact integer day math.
    *
    * @return (cohort_week DATE, week_offset, n_users)
    */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val weeks = events.select(col(userCol).as("user_id"),
        date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .distinct()
      .localCheckpoint() // consumed twice: cohort min + activity join
    val cohorts = weeks.groupBy("user_id").agg(min("wk").as("cohort_week"))
    weeks.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(wk, cohort_week) div 7").cast("int").as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }
}
