package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tag-delimited XML record scan: the Spark restatement of the
  * reference's byte-level `XMLInputFormat` + Wikipedia page parser
  * (`util/XMLInputFormat.java:80-105,165-204`,
  * `util/WikipediaPageInputFormat.java:120-136`).
  *
  * The reference scans raw splits for `<page>`/`</page>` byte sequences;
  * on Spark the idiomatic equivalent over a text source is
  * `spark.read.text` with a record delimiter (`option("lineSep",
  * "</page>")`) followed by column-level extraction — splitting stays in
  * the data source (parallel, streamable), parsing is codegen'd
  * `regexp_extract`, and no custom InputFormat is needed.
  */
object XmlScan {

  /** Extract one tag's text content from an XML fragment column. */
  def tagText(xml: Column, tag: String): Column =
    regexp_extract(xml, s"(?s)<$tag>(.*?)</$tag>", 1)

  /** Parse a column of `<page>`-record XML fragments into
    * `(doc_id, title, text)` — the reference's WikipediaPage fields.
    * Records missing an id are dropped (the reference NPE-swallows them,
    * `code/corpus/CorpusSplitMapred.java:42-44`).
    */
  def parsePages(records: DataFrame, xmlCol: String = "value"): DataFrame =
    records
      .select(
        tagText(col(xmlCol), "id").as("id_str"),
        tagText(col(xmlCol), "title").as("title"),
        tagText(col(xmlCol), "text").as("text"))
      .filter(col("id_str") =!= "")
      .select(col("id_str").cast("long").as("doc_id"), col("title"), col("text"))

  /** Render a documents table as `<page>` XML records — the round-trip
    * generator used by tests and the oracle row (real deployments read
    * the dump with `spark.read.option("lineSep", "</page>").text(...)`).
    */
  def toPageXml(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(lit("<page><id>"), col("doc_id"), lit("</id><title>doc-"),
        col("doc_id"), lit("</title><text>"), col("text"),
        lit("</text></page>")).as("value"))
}
