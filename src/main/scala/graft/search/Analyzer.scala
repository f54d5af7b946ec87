package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PorterStemmer

/** Tokenization layer.
  *
  * Mirrors the reference's `StringTokenizer`-based tokenizers
  * (reference `code/inverted/InvertedIndexMapred.java:57,69-84` and
  * `code/wordcount/WordCountMapred.java:41,47-53`): text is split on a
  * fixed set of punctuation/whitespace delimiter characters, empty tokens
  * never appear (StringTokenizer semantics), tokens are lowercased, and
  * the position counter is 1-based over ALL surviving tokens — it advances
  * even for tokens later dropped by the digit/alnum/stop-word filters.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (split / filter / transform / posexplode); the Porter stemmer is a
  * native Catalyst expression ([[graft.functions.PorterStem]]), so the
  * whole indexing path runs UDF-free inside whole-stage codegen.
  */
object Analyzer {

  /** Delimiter set of the index tokenizer, as a regex character class
    * (reference `code/inverted/InvertedIndexMapred.java:57`).
    */
  val IndexDelimRegex: String = "[ \\t\\r\\n,.:;'\"()\\[\\]{}/<>!?|\\-—#$&=_*+]+"

  /** Word-count tokenizer delimiters — the reference's word-count job adds
    * an en-dash to the set (`code/wordcount/WordCountMapred.java:41`).
    */
  val WordCountDelimRegex: String = "[ \\t\\r\\n,.:;'\"()\\[\\]{}/<>!?|\\-—–#$&=_*+]+"

  /** Matches iff the string contains at least one NON-delimiter char of
    * the index tokenizer — i.e. iff `size(tokensCol(text)) > 0`
    * (delimiters are case-invariant punctuation and case folding never
    * maps a letter into the delimiter set or erases it, so the check
    * commutes with `lower`; spec-pinned). A filter on THIS, placed on
    * the raw text column, is pushable to the scan without inlining a
    * duplicate of the tokenizer expression below the projection — the
    * r14 `size(toks) > 0` HAVING re-derived the full split per row
    * when pushed (guide §4.4's duplicated-evaluation trap, judged
    * visible in plans/r14/text_repetition_after.txt).
    */
  val HasTokenRegex: String =
    "[^" + IndexDelimRegex.stripPrefix("[").stripSuffix("]+") + "]"

  /** `text -> array<string>` of lowercased non-empty tokens.
    *
    * r15: for the two fixed delimiter classes the split runs as the
    * native one-byte-scan kernel [[graft.functions.DelimTokens]]
    * instead of regex `split` + higher-order `filter` — output rows
    * are bit-identical (spec-pinned over the corpus plus adversarial
    * inputs), the per-row cost is one pass with no regex engine. The
    * `lower` stays the stock Spark expression, so case folding
    * semantics (including contextual mappings) are untouched. Any
    * other `delimRegex` takes the original regex path.
    */
  def tokensCol(text: Column, delimRegex: String = IndexDelimRegex): Column =
    delimRegex match {
      case IndexDelimRegex =>
        graft.functions.DelimTokens.of(lower(text), enDash = false)
      case WordCountDelimRegex =>
        graft.functions.DelimTokens.of(lower(text), enDash = true)
      case _ => filter(split(lower(text), delimRegex), t => length(t) > 0)
    }

  /** Spread an under-partitioned LARGE input across the cluster before
    * CPU-heavy per-row work (tokenize/stem/shingle). Parquet cannot
    * split a single row group, so a giant single-row-group file arrives
    * as ONE partition and all map-side work before the first exchange
    * runs on one core. The repartition shuffles the full text column,
    * so it only pays for itself when each inherited partition is big
    * (default gate: >= 64 MiB/partition, measured at sf0.1 where the
    * unconditional version cost 20-70% on every light tokenize
    * pipeline); `minBytesPerPartition = 0` forces the spread for
    * operators whose downstream per-row work dominates any shuffle
    * (e.g. [[graft.ops.TextAnalysis.spanDedup]]'s interval mask,
    * measured 30% faster spread even on a 3 MB corpus). At scale
    * (input partitions >= defaultParallelism) this is a no-op;
    * streaming frames pass through untouched (micro-batch sizing is
    * the stream's own concern, and `.rdd` is illegal on an unbounded
    * frame).
    */
  def spread(df: DataFrame, minBytesPerPartition: Long = 64L << 20): DataFrame =
    if (df.isStreaming || !narrowLineage(df.queryExecution.optimizedPlan)) df
    else {
      // .rdd is only consulted on exchange-free plans (see narrowLineage):
      // under AQE, Dataset.rdd on a plan WITH exchanges eagerly executes
      // every upstream shuffle stage just to learn the partition count,
      // and those stages are not reused by the later real action
      val target = df.sparkSession.sparkContext.defaultParallelism
      val parts = df.rdd.getNumPartitions
      lazy val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong
      // hash on all columns, NOT round-robin: repartition(n) sorts each
      // partition locally first (spark.sql.execution.sortBeforeRepartition
      // determinism guard) — a full sort of the text rows on top of the
      // shuffle
      if (parts < target && bytes / parts.max(1) >= minBytesPerPartition)
        df.repartition(target, df.columns.map(col).toIndexedSeq: _*)
      else df
    }

  /** True when the plan is scan + narrow operators only (no joins,
    * aggregates, windows, sorts, repartitions — nothing that plans an
    * exchange). A frame downstream of an exchange is already spread by
    * that shuffle's partitioning, and probing its partition count via
    * `.rdd` under AQE would eagerly run the upstream stages.
    */
  private def narrowLineage(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: LeafNode => true
      case _: Project | _: Filter | _: Generate | _: SubqueryAlias |
           _: Union | _: LocalLimit =>
        p.children.forall(narrowLineage)
      // coalesce: no exchange, narrows the partition count — exactly
      // the shape spread exists to widen
      case r: Repartition if !r.shuffle => p.children.forall(narrowLineage)
      case _ => false
    }
  }

  /** Explode a document table into one row per token with its 1-based
    * position: `(…keyCols, pos INT, token STRING)`.
    */
  def tokenize(docs: DataFrame, textCol: String, keyCols: Seq[String],
               delimRegex: String = IndexDelimRegex): DataFrame = {
    val keys = keyCols.map(col)
    spread(docs)
      .select(keys :+ posexplode(tokensCol(col(textCol), delimRegex)).as(Seq("pos0", "token")): _*)
      .select(keys :+ (col("pos0") + 1).as("pos") :+ col("token"): _*)
  }

  /** Keep only `[a-z0-9]+` tokens that are not all digits (reference
    * `code/inverted/InvertedIndexMapred.java:76`). Codegen-friendly:
    * `rlike` compiles to a regex match inside whole-stage codegen.
    */
  def isIndexableToken(token: Column): Column =
    token.rlike("^[a-z0-9]+$") && !token.rlike("^[0-9]+$")

  /** Porter stemming (reference `util/Stemmer.java`) — the native
    * codegen'd expression; see [[graft.functions.PorterStem]].
    */
  def stemCol(c: Column): Column = graft.functions.PorterStem.stemCol(c)
}
