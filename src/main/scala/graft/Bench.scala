package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR
  * (default sf0.1) N times (SPARK_GRAFT_BENCH_RUNS, default 3) and
  * reports the per-query MEDIAN, so round-over-round deltas beat the
  * shared host's 2-4x run-to-run variance.
  *
  * The one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`
  * is printed to stdout (unprefixed — build.sbt sets
  * `run / outputStrategy := StdoutOutput` so the forked JVM's stdout is
  * not wrapped in sbt's "[info]" logger) AND written to
  * SPARK_GRAFT_BENCH_OUT (default /tmp/bench.json) for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up: JVM/codegen/parquet-footer costs land here, not in timings
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch {
        case _: Throwable =>
          try fn(spark, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      }
      (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2) // runs is odd by default; upper median otherwise
    }

    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts to the named queries (and
    // any that sort before them stay excluded) — for local bisection of
    // bench-context effects; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // INTERLEAVED passes (run the whole suite N times round-robin), not
    // N consecutive runs per query: a sustained host-load window then
    // inflates at most one pass of each query — minutes apart — and the
    // per-query median rejects it. Consecutive runs all land inside the
    // same window and the median keeps the inflated value.
    val passes = (1 to runs).map { _ =>
      names.map { case (name, fn) => name -> once(name, fn) }.toMap
    }
    val results = names.map { case (name, _) =>
      name -> median(passes.map(_(name)))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs}"""
    println(json)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: $e") }
    spark.stop()
  }
}
