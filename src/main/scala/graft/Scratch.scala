package graft

import org.apache.spark.sql.SparkSession

/** Simulates the driver's t1 smoke with a BARE session — no UTC, no
  * shuffle-partition tuning, defaults only — to catch config-dependent
  * assumptions in SparkEntry.entry.
  */
object BareEntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"ENTRY_ROWS=${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}

/** Dev scratch main: run a subset of SparkEntry queries with full stack
  * traces (Verify swallows them into one line).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val t0 = System.nanoTime()
      println(s"=== $n ===")
      try {
        if (n.startsWith("stress:")) {
          // 20x-duplicated corpus: 100k docs, every text in 20 copies —
          // worst-case shape for dedup candidate generation
          import org.apache.spark.sql.functions._
          val base = search.Indexer.documents(spark, sfDir)
          val big = (0 until 20).map(i => base.withColumn("doc_id",
            col("doc_id") + lit(i * 1000000L))).reduce(_ unionByName _)
          n.stripPrefix("stress:") match {
            case "exact" =>
              val d = ops.Dedup.exact(big)
              println(s"groups=${d.count()} max_copies=${d.agg(max("n_copies")).first().getLong(0)}")
            case "minhash" =>
              println("pairs=" + ops.Dedup.minHashLsh(big, 3, 32, 8, 0.9).count())
            case "index" =>
              val idx = search.Indexer.postings(big)
              println("postings=" + idx.count())
            case "search" =>
              val idx = search.Indexer.postings(big)
              val r = search.SearchEngine.search("(spark or data) and join and not dup", idx, big)
              println("hits=" + r.count())
            case "simhash" =>
              println("pairs=" + ops.Dedup.simHashPairs(big, 2, 3).count())
          }
        } else if (n == "idx-stem-nopersist") {
          search.Indexer.postings(search.Indexer.documents(spark, sfDir))
            .write.format("noop").mode("overwrite").save()
        } else if (n == "idx-nostem-nopersist") {
          search.Indexer.postings(search.Indexer.documents(spark, sfDir), stem = false)
            .write.format("noop").mode("overwrite").save()
        } else if (n == "occurrences-stem") {
          search.Indexer.termOccurrences(search.Indexer.documents(spark, sfDir), Seq.empty)
            .write.format("noop").mode("overwrite").save()
        } else if (n.startsWith("explain:")) {
          val q = n.stripPrefix("explain:")
          SparkEntry.queries(q)(spark, sfDir).explain("formatted")
        } else if (n.startsWith("search:")) {
          val docs = search.Indexer.documents(spark, sfDir)
          val idx = search.Indexer.postings(docs)
          val df = search.SearchEngine.search(n.stripPrefix("search:"), idx, docs,
            stopWords = Set("the", "a"))
          df.show(5, truncate = false)
          println(s"rows=${df.count()}")
        } else {
          val df = SparkEntry.queries(n)(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
        }
      } catch { case e: Throwable => e.printStackTrace() }
      println(f"[time] $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
