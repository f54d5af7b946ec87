package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxLog
import graft.sources.GraftSqlTable

/** Round-29 surface: SQL `DELETE FROM` through the DSv2 catalog —
  * the general predicate copy-on-write delete
  * ([[TxLog.deleteWherePredicate]]), its connector-pruned hit
  * discovery, SQL NULL-predicate semantics, and the exact-vs-pruning
  * filter conversion split.
  */
class RoundTwentyNineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.graft_table",
      "graft.sources.GraftCatalog")
    s
  }

  private def testdata: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"

  private def docs: DataFrame =
    graft.sources.Tables(spark, testdata, "documents")
      .select("doc_id", "lang", "n_chars")

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def idSet(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("SQL DELETE FROM deletes exactly the predicate's rows as one " +
      "commit; the pre-delete version stays time-travel readable") {
    val p = tmpDir("sqldel")
    TxLog.init(p)
    TxLog.append(spark, p, docs)
    val all = idSet(docs)
    val fr = idSet(docs.filter(col("lang") === "fr"))
    assert(fr.nonEmpty && fr != all)

    spark.sql(s"DELETE FROM graft_table.`$p` WHERE lang = 'fr'")

    assert(idSet(spark.read.format("graft-table").load(p)) === (all -- fr))
    // one delete commit on top of the append
    assert(TxLog.resolve(p).version === 1L)
    // time travel to v0 still sees every row
    assert(idSet(spark.read.format("graft-table")
      .option("versionAsOf", "0").load(p)) === all)
  }

  test("DELETE hit discovery is pruned by the log's skipping index: " +
      "on a lang-clustered table only the overlapping files rewrite") {
    val p = tmpDir("sqldelprune")
    TxLog.init(p)
    TxLog.append(spark, p,
      docs.repartitionByRange(5, col("lang"), col("doc_id"))
        .sortWithinPartitions("lang", "doc_id"))
    val before = TxLog.resolve(p).files.toSet
    assert(before.size >= 4, s"want a multi-file table, got $before")

    spark.sql(s"DELETE FROM graft_table.`$p` WHERE lang = 'fr'")

    val after = TxLog.resolve(p).files.toSet
    // untouched files survive by IDENTITY — only the files whose
    // recorded string [min,max] admits 'fr' were rewritten
    val untouched = before.intersect(after)
    assert(untouched.nonEmpty,
      s"stats pruning failed: every file rewrote ($before -> $after)")
    assert((before -- after).size < before.size)
    // and the rows are right
    assert(idSet(spark.read.format("graft-table").load(p)) ===
      idSet(docs.filter(col("lang") =!= "fr")))
  }

  test("SQL DELETE keeps NULL-predicate rows (WHERE cond IS TRUE " +
      "semantics) and composes with deletion-vector masks") {
    val p = tmpDir("sqldelnull")
    TxLog.init(p)
    // lang_opt: NULL on even ids, real on odd ids — one file so the
    // same file holds masked rows, NULL-predicate rows, and hits
    TxLog.append(spark, p,
      docs.withColumn("lang_opt",
          when(pmod(col("doc_id"), lit(2)) === 1, col("lang")))
        .select("doc_id", "lang_opt", "n_chars").coalesce(1))
    val ids = idSet(docs)
    // mask a few rows merge-on-read first: the SQL DELETE's rewrite
    // must not resurrect them
    val masked = ids.filter(_ % 97 == 3)
    assert(masked.nonEmpty)
    TxLog.deleteWhereDv(spark, p, "doc_id", masked.toSeq.sorted)

    val frOdd = idSet(docs.filter(col("lang") === "fr")
      .filter(pmod(col("doc_id"), lit(2)) === 1))
    spark.sql(s"DELETE FROM graft_table.`$p` WHERE lang_opt = 'fr'")

    // survivors: everything except the dv-masked rows and the TRUE
    // hits — every even row (lang_opt NULL ⇒ predicate NULL) survives
    assert(idSet(spark.read.format("graft-table").load(p)) ===
      (ids -- masked -- frOdd))
  }

  test("DELETE FROM with no WHERE empties the head but the history " +
      "survives; a version-pinned relation refuses the delete") {
    val p = tmpDir("sqldelall")
    TxLog.init(p)
    TxLog.append(spark, p, docs.limit(100).coalesce(1))

    // a version-pinned relation refuses the delete (the SQL grammar
    // has no DELETE ... VERSION AS OF — exercise the catalog surface
    // the way a pinned table object would be handed one)
    val pinned = new graft.sources.GraftCatalog()
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], p), "0")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsDelete]
    val e = intercept[Exception] {
      pinned.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.GreaterThan("doc_id", 0L)))
    }
    assert(e.getMessage.contains("read-only"), e.getMessage)

    spark.sql(s"DELETE FROM graft_table.`$p`")
    assert(spark.read.format("graft-table").load(p).count() === 0L)
    assert(TxLog.resolve(p).files.isEmpty)
    assert(spark.read.format("graft-table")
      .option("versionAsOf", "0").load(p).count() === 100L)
  }

  test("exact conversion refuses what pruning relaxes: And keeps the " +
      "convertible side only in pruning mode, and Not of a relaxed " +
      "And never converts (superset complement = subset)") {
    import org.apache.spark.sql.sources._
    // a shape convert() has no case for (collation-aware equality —
    // replaying it as plain === would compare with the WRONG collation)
    val unconvertible: Filter = CollatedEqualTo("a", "x",
      org.apache.spark.sql.types.StringType)
    val and = And(EqualTo("lang", "fr"), unconvertible)
    assert(GraftSqlTable.filterColumn(and).isDefined) // superset prune
    assert(GraftSqlTable.exactFilterColumn(and).isEmpty) // exact: no
    // Not(relaxed And) must refuse in BOTH modes — replaying
    // not(lang = 'fr') for NOT(lang = 'fr' AND u) would over-prune
    assert(GraftSqlTable.filterColumn(Not(and)).isEmpty)
    assert(GraftSqlTable.exactFilterColumn(Not(and)).isEmpty)
    // fully convertible shapes convert in both modes
    val ok = And(EqualTo("lang", "fr"), GreaterThan("doc_id", 10L))
    assert(GraftSqlTable.filterColumn(ok).isDefined)
    assert(GraftSqlTable.exactFilterColumn(ok).isDefined)
  }

  test("the q_table_sql_delete lifecycle's own log shows the pruned " +
      "rewrite: only the fr-overlapping range files left the live set") {
    val p = SparkEntry.txlogSqlDelRootForSpec(spark, testdata)
    val v0 = TxLog.resolve(p, Some(0L)).files.toSet
    val head = TxLog.resolve(p).files.toSet
    val removed = v0 -- head
    assert(removed.nonEmpty, "the DELETE rewrote nothing")
    assert(removed.size < v0.size,
      s"stats pruning failed: every v0 file rewrote ($v0)")
    assert(v0.intersect(head).nonEmpty) // untouched files, by identity
  }

  test("deleteWherePredicate composes with hive-partitioned tables: " +
      "partition metadata prunes the discovery and the partition " +
      "columns survive in the rewritten files") {
    val p = tmpDir("sqldelpart")
    TxLog.init(p)
    TxLog.appendPartitioned(spark, p,
      docs.repartition(2, col("doc_id")), Seq("lang"))
    val before = TxLog.resolve(p).files.toSet

    // delete HALF of one partition — the partition filter prunes the
    // discovery to lang=fr files, the doc_id bound keeps survivors
    val frIds = idSet(docs.filter(col("lang") === "fr"))
    val cut = frIds.toSeq.sorted.apply(frIds.size / 2)
    TxLog.deleteWherePredicate(spark, p,
      col("lang") === "fr" && col("doc_id") < cut)

    val after = TxLog.resolve(p).files.toSet
    val untouched = before.intersect(after)
    // every non-fr partition file is untouched on disk
    assert((before -- after).forall(_.contains("lang=fr")),
      s"non-fr files rewrote: ${(before -- after).filterNot(_.contains("lang=fr"))}")
    assert(untouched.exists(!_.contains("lang=fr")))
    // rows: fr below the cut gone, everything else intact (partition
    // column still present and correct in the rewritten files)
    val out = spark.read.format("graft-table").load(p)
    assert(idSet(out) === idSet(docs) -- frIds.filter(_ < cut))
    assert(out.filter(col("lang").isNull).count() === 0L)
  }
}
