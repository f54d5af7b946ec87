package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL / CSV line codecs — the text serialization formats a training
  * corpus actually arrives in (WebText-style JSONL dumps, CSV
  * exports), as the Spark-native siblings of [[XmlScan]] (the
  * reference's only wire format, `util/XMLInputFormat.java`).
  *
  * `to_json`/`from_json` and `to_csv`/`from_csv` are codegen'd row
  * codecs, so serialize → parse is a map-only round trip: no shuffle,
  * no UDF, stays inside WholeStageCodegen. The at-rest path
  * ([[writeJsonl]]/[[readJsonl]]) always passes an EXPLICIT schema —
  * schema inference at 100 TB is a full extra pass over the corpus
  * before the first real scan, and a sampled inference can silently
  * narrow a column (a doc_id column whose sampled rows happen to fit
  * INT truncates the rest).
  */
object DelimitedScan {

  /** The documents table's wire schema (TESTDATA.md). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docStruct = struct(
    col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** One JSONL line per document row. */
  def toJsonl(docs: DataFrame): DataFrame =
    docs.select(to_json(docStruct).as("line"))

  /** Parse JSONL lines under the explicit schema. `columnNameOfCorruptRecord`
    * semantics: an unparseable line yields a null struct, surfaced here
    * as all-null columns rather than a task failure — a 100 TB ingest
    * quarantines bad lines, it does not die on them.
    */
  def parseJsonl(lines: DataFrame, schema: StructType = docSchema): DataFrame =
    lines.select(from_json(col("line"), schema).as("r"))
      .select(col("r.*"))

  // one CSV dialect for both directions: RFC-style quote doubling, no
  // backslash escapes (Spark's write default and DuckDB's read default
  // agree on this dialect; the codec must never depend on which side
  // serialized)
  private val csvOpts = Map("quote" -> "\"", "escape" -> "\"")

  /** One CSV line per document row (embedded delimiters/quotes/newlines
    * are quoted — a per-row codec never line-splits, so multiline text
    * survives).
    */
  def toCsvLines(docs: DataFrame): DataFrame =
    docs.select(to_csv(docStruct, csvOpts.asJava).as("line"))

  /** Parse CSV lines under the explicit schema and dialect. */
  def parseCsvLines(lines: DataFrame, schema: StructType = docSchema): DataFrame =
    lines.select(from_csv(col("line"), schema, csvOpts).as("r"))
      .select(col("r.*"))

  /** At-rest JSONL: newline-delimited JSON text files, splittable by
    * line — the format a multi-executor scan parallelizes for free
    * (and gzip members per FILE, never one giant .gz, keep it that
    * way; same single-split trap [[XmlScan]] documents).
    */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.select(to_json(docStruct).as("value"))
      .write.mode("overwrite").text(path)

  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
                schema: StructType = docSchema): DataFrame =
    spark.read.schema(schema).json(path)
      .select(docCols.map(col): _*)

  private implicit class MapToJava(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val j = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => j.put(k, v) }
      j
    }
  }
}
