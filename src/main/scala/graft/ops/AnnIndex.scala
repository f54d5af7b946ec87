package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN index *at rest*: the 100 TB posture for similarity search is
  * build-once / probe-many, not recompute-per-query.
  *
  *  - IVF: the assignment table `(vec_id, embedding)` is WRITTEN
  *    partitioned by `cluster`, centroids alongside as a tiny parquet.
  *    A probe ranks centroids driver-side (k dot products — statistics,
  *    not data) and reads only the `nProbe` nearest cluster partitions:
  *    directory-level partition pruning, visible in the scan's
  *    `PartitionFilters`, so a 1000-executor probe touches nProbe/k of
  *    the corpus regardless of total size.
  *  - LSH: the hyperplane signature rides with each vector as a stored
  *    column, so a probe is one scan computing `bit_count(sig ^ qSig)`
  *    over a (vec_id, sig, embedding) table — signatures are never
  *    recomputed per query, and at scale the sig column can additionally
  *    be bucketed/z-ordered for skipping.
  */
object AnnIndex {

  final case class IvfModel(path: String, centroids: Array[(Long, Array[Double])])

  /** Build + persist the IVF index: Lloyd-assigned clusters written
    * partitioned by `cluster`, centroids as `<path>.centroids`.
    */
  def ivfWrite(embeddings: DataFrame, path: String, k: Int = 16,
               iterations: Int = 2): IvfModel = {
    val spark = embeddings.sparkSession
    val (assigned, centroids) = Similarity.ivfTrain(embeddings, k, iterations)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)
    import spark.implicits._
    centroids.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.centroids")
    IvfModel(path, centroids)
  }

  /** [[ivfWrite]] with ORACLE-EXACT Lloyd training
    * ([[Similarity.kMeansExactModel]] — integer-scaled sums, 9-dp
    * argmax) instead of the rounded-mean variant: the build path for
    * layouts whose downstream rows must be replayable by a SQL engine
    * end-to-end (train → append → probe). Same at-rest shape:
    * assignment partitioned by `cluster`, centroids alongside.
    */
  def ivfWriteExact(embeddings: DataFrame, path: String, k: Int = 8,
                    rounds: Int = 1): IvfModel = {
    val spark = embeddings.sparkSession
    val (assigned, centroids) = Similarity.kMeansExactModel(embeddings, k, rounds)
    // reattach the source embedding column (the training's double cast
    // is not persisted) — one vec_id equi-join against the
    // localCheckpointed node-sized assignment, as in ivfTrain
    embeddings.select(col("vec_id"), col("embedding"))
      .join(assigned.select("vec_id", "cluster"), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
    import spark.implicits._
    centroids.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.centroids")
    IvfModel(path, centroids)
  }

  /** IVF index MAINTENANCE, physically: route a NEW vector batch
    * against the already-trained centroids ([[Similarity
    * .assignToCentroids]] — no retrain, no old-corpus re-read) and
    * APPEND the assigned rows as new files into the existing
    * cluster-partitioned layout. `mode("append")` + `partitionBy`
    * lays each batch row into its cluster's directory alongside the
    * base files, so a subsequent [[ivfTopK]] probe prunes base and
    * delta identically — the at-rest third of the train-once →
    * append-deltas → probe lifecycle a 100 TB corpus runs daily.
    * Append-only contract (no dedup against resident vec_ids), same
    * as [[graft.search.Indexer.incrementalPostings]].
    */
  def ivfAppend(model: IvfModel, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val centsDf = model.centroids.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cluster", "centroid")
    batch.select(col("vec_id"), col("embedding"))
      .join(Similarity.assignToCentroids(batch, centsDf)
        .select("vec_id", "cluster"), Seq("vec_id"))
      .write.mode("append").partitionBy("cluster").parquet(model.path)
  }

  /** Reload a persisted model's centroids (k rows — statistics). */
  def ivfLoad(spark: SparkSession, path: String): IvfModel = {
    val centroids = spark.read.parquet(s"$path.centroids")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    IvfModel(path, centroids)
  }

  /** The `nProbe` cluster ids nearest to `query` — ranked driver-side
    * on the 9-dp cosine grid ([[Similarity.probeOrder]]), so the SQL
    * oracle replays the ranking exactly.
    */
  def probeClusters(model: IvfModel, query: Seq[Double], nProbe: Int): Seq[Long] =
    Similarity.probeOrder(model.centroids, query).take(nProbe)

  /** Top-k over ONLY the probed cluster partitions of a persisted IVF
    * index — `cluster` is a partition directory, so `isin(probes)` prunes
    * at file listing time (assert `PartitionFilters` in the plan).
    */
  def ivfTopK(spark: SparkSession, model: IvfModel, query: Seq[Double],
              topK: Int, nProbe: Int = 4): DataFrame = {
    val probes = probeClusters(model, query, nProbe)
    val q = array(query.map(lit): _*)
    spark.read.parquet(model.path)
      .filter(col("cluster").isin(probes: _*))
      .select(col("vec_id"), Similarity.cosineCol(col("embedding"), q).as("cosine"))
      .orderBy(Similarity.topKCut: _*)
      .limit(topK)
  }

  /** Persist embeddings with their hyperplane signature as a stored
    * column: `(vec_id, embedding, sig)`. The signature is computed by
    * the native kernel (plane matrix hashed once per executor) —
    * bit-identical to the column-algebra form.
    */
  def lshWrite(embeddings: DataFrame, path: String, planes: Int = 12): Unit =
    embeddings
      .withColumn("sig", element_at(graft.functions.VectorExpressions
        .hyperplaneSignatures(col("embedding"), planes, 1), 1))
      .write.mode("overwrite").parquet(path)

  /** LSH top-k over a persisted signature table: one scan filtering on
    * stored signatures (no per-query signature recompute), exact cosine
    * re-rank of the survivors.
    */
  def lshTopK(spark: SparkSession, path: String, query: Seq[Double], topK: Int,
              planes: Int = 12, maxBitDiff: Int = 3): DataFrame = {
    val q = array(query.map(lit): _*)
    val qSig = Similarity.hyperplaneSignature(q, planes)
    spark.read.parquet(path)
      .filter(bit_count(col("sig").bitwiseXOR(qSig)) <= maxBitDiff)
      .select(col("vec_id"), Similarity.cosineCol(col("embedding"), q).as("cosine"))
      .orderBy(Similarity.topKCut: _*)
      .limit(topK)
  }

  final case class PqModel(path: String, codebooks: Array[Array[Array[Double]]])

  /** Build + persist the PQ index: ONE columnar table `(vec_id,
    * embedding, codes)` — the ADC scan's column pruning reads only the
    * m-byte `codes` column (the narrow-scan win needs no sidecar), and
    * the exact re-rank fetches `embedding` for just the survivors.
    * Codebooks land as the tiny `<path>.codebooks` parquet (m*k rows
    * of statistics, like IVF's centroids).
    */
  def pqWrite(embeddings: DataFrame, path: String, m: Int = 16, k: Int = 32,
              iterations: Int = 2): PqModel = {
    val spark = embeddings.sparkSession
    val (codes, codebooks) = Similarity.pqTrainEncode(embeddings, m, k, iterations)
    embeddings.select(col("vec_id"), col("embedding"))
      .join(codes, Seq("vec_id"))
      .write.mode("overwrite").parquet(path)
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cents, j) =>
      cents.zipWithIndex.map { case (v, cid) => (j, cid, v.toSeq) }
    }.toSeq.toDF("j", "cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.codebooks")
    PqModel(path, codebooks)
  }

  /** Reload a persisted PQ model's codebooks (m*k rows — statistics). */
  def pqLoad(spark: SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(s"$path.codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cb = Array.fill(m, k)(Array.empty[Double])
    rows.foreach { case (j, cid, v) => cb(j)(cid) = v }
    PqModel(path, cb)
  }

  /** PQ top-k over the persisted index: ADC cut over the stored codes
    * column (no re-encode, no re-train), exact re-rank of the
    * survivors against the stored embeddings.
    */
  def pqTopK(spark: SparkSession, model: PqModel, query: Seq[Double],
             topK: Int, rerank: Int = 300): DataFrame = {
    val at = spark.read.parquet(model.path)
    Similarity.pqAdcTopK(at.select("vec_id", "codes"),
      at.select("vec_id", "embedding"), model.codebooks, query, topK, rerank)
  }
}
