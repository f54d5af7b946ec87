package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact top-k heavy hitters without shuffling the full key space.
  *
  * The plain `groupBy(key).count().orderBy.limit(k)` shuffles one row
  * per DISTINCT key — at 100 TB with a web-scale vocabulary that
  * shuffle is the bottleneck. Here each input partition builds a
  * Misra-Gries summary (the "frequent" algorithm) of `capacity`
  * counters; the union of summaries is a provable candidate SUPERSET
  * of every key with global count >= N/capacity: a key with global
  * share >= 1/capacity has per-partition share >= 1/capacity > 1/(capacity+1)
  * in at least one partition (weighted pigeonhole), and Misra-Gries
  * never zeroes a key whose partition count exceeds n_p/(capacity+1).
  * One exact count restricted to the candidates (semi-join on the
  * bounded candidate set; AQE picks broadcast vs shuffle, since the
  * candidate union can outgrow the driver's broadcast limit) then
  * decides — the output is EXACT, the sketch only proposes.
  *
  * Completeness is checked, not assumed: if the k-th exact candidate
  * count falls below N/capacity the guarantee does not cover rank k
  * and the operator falls back to the plain full aggregation
  * (correctness is never traded; capacity only buys the fast path).
  * Ties break by key ascending, so the result is deterministic.
  */
object HeavyHitters {

  /** Misra-Gries over one iterator: at most `capacity` counters; a
    * miss with a full table decrements every counter (amortized O(1):
    * each decrement event burns `capacity` units of total count, so at
    * most n/capacity events occur). Returns the surviving keys —
    * counts are discarded; the exact phase recounts.
    */
  private[graft] def misraGriesKeys(it: Iterator[String],
                                    capacity: Int): Iterator[String] =
    misraGriesSummary(it, capacity).collect { case (k, _) if k != null => k }

  /** [[misraGriesKeys]] plus one trailing `(null, partitionRowCount)`
    * row, so the grand total N rides out of the SAME pass — topK then
    * scans its input exactly twice (summary, exact count) with no
    * full-input persist and no separate count job.
    */
  private[graft] def misraGriesSummary(it: Iterator[String],
                                       capacity: Int): Iterator[(String, Long)] = {
    val counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
    var n = 0L
    while (it.hasNext) {
      val k = it.next()
      n += 1L
      val c = counts.get(k)
      if (c != null) counts.put(k, c + 1L)
      else if (counts.size() < capacity) counts.put(k, 1L)
      else {
        val e = counts.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().iterator().asScala.map((_, 0L)) ++
      Iterator.single((null: String, n))
  }

  /** [[misraGriesSummary]] with the surviving COUNTS kept (not zeroed):
    * the building block for the mergeable state below. Per-partition
    * deficit bound: `true_count - mg_count <= n_p / (capacity + 1)`.
    */
  private[graft] def misraGriesCounts(it: Iterator[String],
                                      capacity: Int): Iterator[(String, Long)] = {
    val counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
    var n = 0L
    while (it.hasNext) {
      val k = it.next()
      n += 1L
      val c = counts.get(k)
      if (c != null) counts.put(k, c + 1L)
      else if (counts.size() < capacity) counts.put(k, 1L)
      else {
        val e = counts.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue.longValue)) ++
      Iterator.single((null: String, n))
  }

  /** Contract a (key, cnt) counter table to at most `capacity`
    * counters by the Misra-Gries subtraction rule (Agarwal et al.
    * 2012, "Mergeable Summaries"): subtract the `(capacity+1)`-th
    * largest count from every counter and drop the non-positive ones.
    * Adds at most that subtracted value to every key's deficit while
    * the total-count row (null key) rides through untouched — so the
    * state-wide invariant `true - est <= N / (capacity + 1)` is
    * preserved across any merge tree.
    *
    * The ranking window is over the COUNTER table (<= 2*capacity rows
    * after a merge, #partitions*capacity after a build) — state-sized,
    * never corpus-sized, so the unpartitioned window is the right
    * plan. The 1-row threshold frame is crossed back in broadcast.
    */
  private def contract(counters: DataFrame, capacity: Int): DataFrame = {
    val nonNull = counters.filter(col("key").isNotNull)
    val ranked = nonNull.withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("key").asc)))
    val thr = ranked.filter(col("r") === capacity + 1)
      .agg(coalesce(max("cnt"), lit(0L)).as("thr"))
    nonNull.crossJoin(broadcast(thr))
      .select(col("key"), (col("cnt") - col("thr")).as("cnt"))
      .filter(col("cnt") > 0)
      .unionByName(counters.filter(col("key").isNull))
  }

  /** Mergeable Misra-Gries heavy-hitter STATE over `keyCol`: at most
    * `capacity` `(key, cnt)` counter rows (counts are UNDERestimates
    * with deficit <= N/(capacity+1)) plus one `(null, N)` total row —
    * the same relational-state shape as the KMV distinct sketch and
    * the mergeable histogram. Build once per ingest batch; maintain
    * the corpus-wide state with [[mergeMg]] instead of re-sketching
    * history. One pass over the batch, state-sized output.
    */
  def mgState(df: DataFrame, keyCol: String, capacity: Int = 4096): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val perPart = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
      .as[String]
      .mapPartitions(it => misraGriesCounts(it, capacity))
      .toDF("key", "cnt")
    // fold per-partition summaries: counter sums group by key, the
    // null-key partition totals sum into the grand total, then one
    // contraction restores the <= capacity bound
    contract(perPart.groupBy("key").agg(sum("cnt").as("cnt")), capacity)
  }

  /** Merge two MG states built with the same `capacity`: sum counters
    * key-wise (totals likewise) and contract. `merge(state(A),
    * state(B))` carries the same deficit bound as `state(A union B)`
    * — the algebra incremental top-k maintenance needs: sketch only
    * the delta, fold it into yesterday's state.
    */
  def mergeMg(a: DataFrame, b: DataFrame, capacity: Int = 4096): DataFrame =
    contract(a.unionByName(b).groupBy("key").agg(sum("cnt").as("cnt")),
      capacity)

  /** EXACT top-k read off a (possibly merged) MG state: the state's
    * counter keys are a provable candidate superset of every key with
    * true count STRICTLY ABOVE N/(capacity+1) (a missing key's deficit
    * would exceed the bound; a key exactly at it can be absent), so
    * one exact count restricted to candidates decides. Completeness is runtime-checked exactly as in [[topK]]:
    * if the k-th exact candidate count falls below N/(capacity+1) the
    * guarantee does not reach rank k and the full aggregation decides
    * instead — exactness is never traded. The incremental win vs
    * [[topK]] is the SKETCH pass: history is never re-sketched, only
    * the exact candidate count (a bounded-key semi-join aggregation)
    * touches the full corpus.
    */
  def topKFromState(state: DataFrame, raw: DataFrame, keyCol: String,
                    k: Int, capacity: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = raw.sparkSession
    val st = state.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = st.filter(col("key").isNull)
        .agg(coalesce(sum("cnt"), lit(0L))).first().getLong(0)
      val candidates = st.filter(col("key").isNotNull).select("key").distinct()
      val keys = raw.select(col(keyCol).cast("string").as("key"))
        .filter(col("key").isNotNull)
      val exact = keys.join(candidates, Seq("key"), "left_semi")
        .groupBy("key").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("key"))
        .limit(k).collect()
      // STRICT >: the MG superset property only covers keys with true
      // count strictly greater than N/(capacity+1) — a key exactly AT
      // the bound can be absent from the state, so an exact tie at
      // rank k falls back to the full aggregation (exactness over
      // speed at the boundary)
      val guaranteed = exact.length >= k &&
        exact.last.getLong(1) > total.toDouble / (capacity + 1)
      val rows =
        if (guaranteed) exact.toIndexedSeq
        else keys.groupBy("key").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("key")).limit(k)
          .collect().toIndexedSeq
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("key", StringType),
          StructField("n", LongType, nullable = false))))
    } finally st.unpersist()
  }

  /** Exact top-k of `keyCol` by count: sketch-proposed candidates +
    * exact verification, full-aggregation fallback when the guarantee
    * does not reach rank k. Output: `(key, n)` ordered by `n` desc,
    * `key` asc — identical to the plain form under any partitioning.
    */
  def topK(df: DataFrame, keyCol: String, k: Int,
           capacity: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    // the raw key stream is NOT persisted: at the 100 TB design point
    // caching the input costs more than its two scans (summary, exact);
    // only the tiny per-partition summary is persisted
    val keys = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
    val summary = keys.as[String]
      .mapPartitions(it => misraGriesSummary(it, capacity))
      .toDF("key", "cnt")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one action materializes the summary; total rides the same pass
      // as the null-key rows — no separate count() job over the input
      val total = summary.filter(col("key").isNull)
        .agg(coalesce(sum("cnt"), lit(0L))).first().getLong(0)
      val candidates = summary.filter(col("key").isNotNull)
        .select("key").distinct()
      // exact phase: count ONLY candidate keys — the shuffle is bounded
      // by (#partitions x capacity), not by the distinct-key count. NO
      // broadcast hint: at 100 TB the candidate union itself can reach
      // #partitions x capacity keys, past the driver's broadcast limit —
      // AQE broadcasts when the set turns out small, shuffles otherwise
      val exact = keys.join(candidates, Seq("key"), "left_semi")
        .groupBy("key").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("key"))
        .limit(k).collect()
      // STRICT > (same boundary as topKFromState): the candidate
      // superset only covers counts strictly above the deficit bound
      val guaranteed =
        exact.length >= k && exact.last.getLong(1) > total.toDouble / capacity
      // both paths materialize (k rows) inside the try — the result
      // must not be a lazy plan over the unpersisted summary
      val rows =
        if (guaranteed) exact.toIndexedSeq
        else
          // guarantee void at rank k (key space too flat for this
          // capacity): exactness over speed — full aggregation
          keys.groupBy("key").agg(count(lit(1)).as("n"))
            .orderBy(col("n").desc, col("key")).limit(k)
            .collect().toIndexedSeq
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("key", StringType),
          StructField("n", LongType, nullable = false))))
    } finally summary.unpersist()
  }
}
