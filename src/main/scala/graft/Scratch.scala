package graft

import org.apache.spark.sql.SparkSession

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
      println(s"=== $n ===")
      try {
        if (n.startsWith("search:")) {
          val docs = search.Indexer.documents(spark, sfDir)
          val idx = search.Indexer.postings(docs)
          val df = search.SearchEngine.search(n.stripPrefix("search:"), idx, docs,
            stopWords = Set("the", "a"))
          df.show(5, truncate = false)
          println(s"rows=${df.count()}")
        } else {
          val df = SparkEntry.queries(n)(spark, sfDir)
          df.printSchema()
          df.show(5, truncate = false)
        }
      } catch { case e: Throwable => e.printStackTrace() }
    }
    spark.stop()
  }
}
