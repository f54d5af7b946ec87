package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  * Baseline: brute-force cosine top-k (a single scan + TakeOrdered — no
  * shuffle of the corpus). Scale path: LSH-bucketed ANN that prunes the
  * corpus to matching buckets before exact re-ranking.
  *
  * Vector math runs through the native codegen'd Catalyst expressions
  * in [[graft.functions.VectorExpressions]] — a tight primitive loop in
  * whole-stage codegen instead of `zip_with`+`aggregate`'s per-row
  * intermediate arrays (bit-identical results, ~an order of magnitude
  * less allocation on wide fan-out joins).
  */
object Similarity {

  /** Dot product of two array columns in double precision. */
  def dotCol(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  /** Cosine similarity of two array columns. */
  def cosineCol(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  /** The FINAL top-k cut ordering shared by every single-query exact-
    * cosine path (brute, int8 re-rank, LSH, IVF, PQ): descending on
    * the 4-dp HALF_UP-rounded cosine, ties to the smaller `vec_id` —
    * the SAME grid the SQL oracles rank on (`round(cos, 4) AS cosine
    * ... ORDER BY cosine DESC, vec_id`). Cutting on the RAW double
    * instead would disagree with the oracle whenever two candidates
    * straddle the k-th slot within 5e-5 of each other (raw ordering
    * keeps the raw-higher one, the grid keeps the smaller id).
    * Candidate pre-cuts (ADC / quantized / bit-radius) stay raw —
    * they are recall heuristics sized to cover the true top-k, not
    * membership decisions. NOTE the grid slightly strengthens what
    * "cover" means: a pre-cut must also retain candidates that tie
    * with the raw #k at 4 dp (they can win the slot by id). The
    * margins here are far wider than 5e-5 of cosine, and the oracle
    * gate re-verifies coverage on every corpus change.
    */
  private[graft] def topKCut: Seq[Column] =
    Seq(round(col("cosine"), 4).desc, col("vec_id").asc)

  /** Brute-force cosine top-k against a constant query vector: one
    * codegen'd scan computing the similarity, then `orderBy.limit` which
    * Spark plans as per-partition TakeOrdered + driver merge of k rows —
    * the correct 100 TB baseline (no global sort, no shuffle).
    */
  def bruteForceTopK(embeddings: DataFrame, query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    embeddings
      .select(col("vec_id"), cosineCol(col("embedding"), q).as("cosine"))
      .orderBy(topKCut: _*)
      .limit(k)
  }

  /** Int8 quantization of the embedding column: per-vector symmetric
    * scaling `q_i = round(127 * x_i / max|x|)` stored as
    * `ARRAY<TINYINT>` plus one float scale — 4x less memory bandwidth
    * per scanned vector, which is what a 100 TB ANN scan is bound by.
    * Zero vectors keep scale 0 and quantize to zeros.
    */
  def quantize(embeddings: DataFrame, embCol: String = "embedding"): DataFrame = {
    val m = array_max(transform(col(embCol), x => abs(x.cast("double"))))
    embeddings
      .withColumn("q_scale", (m / 127.0).cast("double"))
      .withColumn("q_vec", transform(col(embCol), x =>
        when(col("q_scale") > 0,
          round(x.cast("double") / col("q_scale")).cast("tinyint"))
          .otherwise(lit(0).cast("tinyint"))))
  }

  /** Quantized-candidate top-k with exact re-rank: rank the corpus by
    * the cosine of the INT8 vectors (integer dot + integer norms — the
    * cheap scan), keep the best `rerank` candidates, then score just
    * those exactly against the float query and return the true-metric
    * top `k`. Both stages plan as TakeOrderedAndProject — no shuffle.
    * The output equals brute force whenever the true top-k survives the
    * quantized top-`rerank` cut (asserted on the test corpora via
    * Scratch `quanttopk:<rerank>`; int8 cosine error is ~1/127, so any
    * margin beyond k covers it except under adversarial near-ties).
    */
  def quantizedTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
                    rerank: Int = 50): DataFrame = {
    val maxAbs = query.map(math.abs).foldLeft(0.0)(math.max)
    val qQuant: Seq[Int] =
      if (maxAbs == 0) query.map(_ => 0)
      else query.map(x => math.round(127.0 * x / maxAbs).toInt)
    val qArr = array(qQuant.map(lit): _*)
    val qNorm = math.sqrt(qQuant.map(x => x.toDouble * x).sum)
    val quantCos = aggregate(
      zip_with(col("q_vec"), qArr, (a, b) => a.cast("int") * b),
      lit(0), (acc, x) => acc + x).cast("double") /
      (sqrt(aggregate(
        transform(col("q_vec"), a => a.cast("int") * a.cast("int")),
        lit(0), (acc, x) => acc + x).cast("double")) * qNorm + lit(1e-12))
    val candidates = quantize(embeddings)
      .select(col("vec_id"), col("embedding"), quantCos.as("qcos"))
      .orderBy(desc("qcos"), asc("vec_id"))
      .limit(rerank)
    val q = array(query.map(lit): _*)
    candidates
      .select(col("vec_id"), cosineCol(col("embedding"), q).as("cosine"))
      .orderBy(topKCut: _*)
      .limit(k)
  }

  /** Random-hyperplane signature: `planes` sign bits of dot products with
    * deterministic pseudo-random unit-free planes. Plane component j of
    * plane p derives from xxhash64(j, p) mapped to [-0.5, 0.5) — fully
    * deterministic across runs and executors (no RNG state).
    */
  def hyperplaneSignature(emb: Column, planes: Int, planeOffset: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (x, j) =>
          x.cast("double") *
            ((pmod(xxhash64(j, lit(p + planeOffset)), lit(1000000L)).cast("double") / 1000000.0) - 0.5)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: prune the corpus to vectors whose
    * hyperplane signature matches the query's in at least
    * `planes - maxBitDiff` bits (bucket prefilter), then exact cosine
    * re-rank. At 100 TB the signature is precomputed/persisted with the
    * embeddings and the bucket filter is a pushed-down scan predicate.
    */
  def lshTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
              planes: Int = 12, maxBitDiff: Int = 3): DataFrame = {
    val q = array(query.map(lit): _*)
    val qSig = hyperplaneSignature(q, planes)
    embeddings
      .select(col("vec_id"), col("embedding"),
        hyperplaneSignature(col("embedding"), planes).as("sig"))
      .withColumn("bit_diff", bit_count(col("sig").bitwiseXOR(qSig)))
      .filter(col("bit_diff") <= maxBitDiff)
      .select(col("vec_id"), cosineCol(col("embedding"), q).as("cosine"))
      .orderBy(topKCut: _*)
      .limit(k)
  }

  /** IVF (inverted-file) ANN index, trained by the ORACLE-EXACT Lloyd
    * iteration ([[kMeansExactModel]]): seeds = the `k` smallest
    * `vec_id`s, assignment by 9-dp-rounded cosine argmax with ties to
    * the smallest centroid id, integer-scaled centroid update — fully
    * bit-portable, so a SQL engine can replay the TRAINING and the
    * PROBE end-to-end (the `sim_ivf_topk` oracle does exactly that;
    * this replaced the xxhash64-seeded rounded-mean variant whose
    * engine-specific init had forced a pinned oracle). Cluster ids are
    * the seed `vec_id`s. Returns the assignment table `(vec_id,
    * embedding, cluster)` — `embedding` keeps the SOURCE column
    * type/width (the training's double cast is not persisted) — and
    * the trained centroids (k * dim doubles — statistics, not data).
    * At 100 TB the assignment is computed once and persisted
    * partitioned by `cluster`, so a probe reads only nProbe
    * partitions.
    */
  def ivfTrain(embeddings: DataFrame, k: Int, iterations: Int = 2)
      : (DataFrame, Array[(Long, Array[Double])]) = {
    val (assigned, cents) = kMeansExactModel(embeddings, k, iterations)
    // reattach the original embedding column: one vec_id equi-join of
    // the source against the (localCheckpointed) node-sized assignment
    val out = embeddings.select(col("vec_id"), col("embedding"))
      .join(assigned.select("vec_id", "cluster"), Seq("vec_id"))
    (out, cents)
  }

  /** Deterministic IVF probe ranking shared by the fresh and at-rest
    * paths: centroid ids ordered by cosine to the query ROUNDED to
    * 9 dp (descending), ties to the smaller id — the same grid as the
    * training argmax, so the SQL oracle replays the ranking exactly
    * (a flip needs two centroids within 1e-9 of each other). HALF_UP
    * rounding matches both Spark's `round` and DuckDB's `round`
    * (half away from zero).
    */
  def probeOrder(centroids: Array[(Long, Array[Double])],
                 query: Seq[Double]): Seq[Long] = {
    def cos(a: Array[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    centroids.sortBy { case (cid, v) =>
      // a zero-norm query or centroid makes the cosine NaN (0/0);
      // rank such degenerate pairs LAST (below the true cosine range)
      // instead of feeding BigDecimal a NaN (NumberFormatException)
      val c = cos(v, query)
      val safe = if (java.lang.Double.isNaN(c)) -2.0 else c
      (BigDecimal(-safe)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP), cid)
    }.map(_._1).toSeq
  }

  /** Oracle-exact Lloyd k-means — the cross-engine-REPRODUCIBLE
    * clustering primitive (SemDeDup-style corpus partitioning, IVF
    * coarse quantizers, topic bucketing). [[ivfTrain]]'s rounded-mean
    * update is partitioning-invariant but not bit-portable (the
    * double `avg` sums in partition order); here every source of
    * run-to-run or engine-to-engine wobble is removed:
    *
    *  - seeds: the `k` smallest `vec_id`s (no hash, no RNG);
    *  - assignment: argmax of cosine ROUNDED to 9 dp, ties to the
    *    smallest centroid id — a flip needs two centroids within
    *    1e-9 of each other;
    *  - update: per-dimension means from INTEGER-scaled sums —
    *    `sum(floor(component * 1e9))` as a long is
    *    associative-commutative EXACTLY, then one double division
    *    sequence (`s / n / 1e9`) both engines execute identically.
    *
    * The result is decided by exact integer arithmetic plus fixed
    * IEEE expression sequences, so a SQL engine can replay it
    * unrolled (the `sim_kmeans` DuckDB oracle does). Long-sum
    * headroom: |component| <= 9 means overflow needs > 1e9 members
    * per cluster per dimension — raise the scale factor down to 1e6
    * before that corpus exists.
    *
    * `rounds` = centroid updates; assignments run `rounds + 1` times
    * (seed assignment included). Empty clusters keep their previous
    * centroid. Per round: one embeddings scan for the re-assignment,
    * one k×dims-sized collect (model, not data) — same shape as
    * [[ivfTrain]]. Returns `(vec_id, cluster)`.
    */
  def kMeansExact(embeddings: DataFrame, k: Int, rounds: Int = 1): DataFrame =
    kMeansExactModel(embeddings, k, rounds)._1.select("vec_id", "cluster")

  /** [[kMeansExact]] exposing the trained MODEL too: returns the
    * assigned frame `(vec_id, emb, cluster)` plus the final centroids
    * (model-sized driver state) — what [[clusterQuality]] and any IVF
    * layout build need without re-deriving the assignment.
    */
  def kMeansExactModel(embeddings: DataFrame, k: Int, rounds: Int = 1)
      : (DataFrame, Array[(Long, Array[Double])]) = {
    require(k >= 1, s"k must be >= 1: $k")
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val e = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    var cents: Array[(Long, Array[Double])] = e.orderBy("vec_id").limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    def assign(cs: Array[(Long, Array[Double])]): DataFrame = {
      val centArr = array(cs.toIndexedSeq.map { case (cid, v) =>
        struct(lit(cid).as("cid"), array(v.toIndexedSeq.map(lit): _*).as("cvec"))
      }: _*)
      // argmax via array_min over (-cos9, cid) structs: smallest
      // negated rounded cosine = largest cosine, ties to smallest cid
      e.select(col("vec_id"), col("emb"),
        array_min(transform(centArr, c =>
          struct((-round(cosineCol(col("emb"), c.getField("cvec")), 9))
            .as("negcos"), c.getField("cid").as("cid"))))
          .getField("cid").as("cluster"))
    }

    var assigned = assign(cents).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val sums = assigned
        .select(col("cluster"), posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg(sum(floor(col("v") * lit(1e9))).as("s"), count("*").as("n"))
        .collect()
      val updated: Map[Long, Array[Double]] = sums.groupBy(_.getLong(0))
        .map { case (c, rows) =>
          val dims = cents.head._2.length
          val vec = new Array[Double](dims)
          rows.foreach { r =>
            vec(r.getInt(1)) = r.getLong(2).toDouble / r.getLong(3).toDouble / 1e9
          }
          (c, vec)
        }
      cents = cents.map { case (cid, prev) => (cid, updated.getOrElse(cid, prev)) }
      assigned = assign(cents).localCheckpoint(true)
    }
    (assigned, cents)
  }

  /** Per-cluster quality audit over the [[kMeansExact]] clustering —
    * the SemDeDup-style check run before trusting a corpus partition:
    * member count, mean and minimum cosine to the trained centroid per
    * cluster. One broadcast-hash join of the model-sized centroid
    * table against the (already materialized) assignment, one
    * cluster-keyed aggregate. Cosines are rounded to 9 dp before
    * aggregating (the [[kMeansExact]] grid), `min` is then exact and
    * order-free; the mean is rounded to 6 dp because double summation
    * order is partitioning-dependent at ~1e-15 — the oracle replays
    * the identical Lloyd round and aggregates the same way.
    */
  def clusterQuality(embeddings: DataFrame, k: Int, rounds: Int = 1): DataFrame = {
    val (assigned, cents) = kMeansExactModel(embeddings, k, rounds)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centsDf = cents.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cluster", "cvec")
    assigned.join(broadcast(centsDf), "cluster")
      .select(col("cluster"),
        round(cosineCol(col("emb"), col("cvec")), 9).as("cos9"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        round(avg(col("cos9")), 6).as("mean_cos"),
        min(col("cos9")).as("min_cos"))
  }

  /** Product-quantization training + corpus encoding: the embedding is
    * cut into `m` equal sub-vectors and each subspace learns its own
    * `k`-centroid codebook (Lloyd rounds, L2 within the subspace — the
    * PQ objective); a vector's code is its per-subspace nearest
    * centroid ids (`m` small ints replacing `dims` floats — at
    * m=16/k=32, 64 float dims compress to 16 bytes, a 16x scan-width
    * cut, the whole point at 100 TB). A corpus smaller than `k`
    * shrinks the codebooks to its size (same as [[ivfTrain]] — no
    * phantom empty centroids). All `m` subspaces train
    * SIMULTANEOUSLY: one exploded (vec_id, subspace, sub-vector) table
    * drives every round (not m separate k-means), the per-round mean
    * update collects only m*k*(dims/m) doubles, and each round's
    * assignment is eagerly localCheckpointed ([[ivfTrain]]'s pattern —
    * one corpus scan per round). Means round to 9 dp so the trained
    * codebook is partitioning-invariant. Deterministic init: the k
    * vectors with smallest xxhash64(vec_id) seed every subspace.
    *
    * Returns the code table `(vec_id, codes ARRAY<INT>)` (codes(j) =
    * centroid id in subspace j) and the codebooks
    * `codebooks(j)(cid) = centroid` — at scale, persist both as the
    * at-rest index artifact (train once, probe forever).
    */
  /** `m` double-cast sub-vectors of an embedding column — the one
    * definition of PQ's subspace slicing, shared by training and the
    * batch probe.
    */
  private def subspaceArr(emb: Column, m: Int, sub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), j =>
      transform(slice(emb, j * sub + 1, lit(sub)), x => x.cast("double")))

  /** Nested literal `[j][cid] -> cvec` of a trained codebook. */
  private def codebookVecLit(cb: Array[Array[Array[Double]]]): Column =
    array(cb.toIndexedSeq.map(cents =>
      array(cents.toIndexedSeq.map(v =>
        array(v.toIndexedSeq.map(lit): _*)): _*)): _*)

  /** Nested literal `[j][cid] -> ||cvec||^2` of a trained codebook. */
  private def codebookNormLit(cb: Array[Array[Array[Double]]]): Column =
    array(cb.toIndexedSeq.map(cents =>
      array(cents.toIndexedSeq.map(v => lit(v.map(x => x * x).sum)): _*)): _*)

  def pqTrainEncode(embeddings: DataFrame, m: Int = 16, k: Int = 32,
                    iterations: Int = 2)
      : (DataFrame, Array[Array[Array[Double]]]) = {
    val dims = embeddings.select(size(col("embedding"))).first().getInt(0)
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val sub = dims / m
    // (vec_id, j, subvec DOUBLE) — one row per vector per subspace,
    // materialized once and reused by every training round
    val subs = embeddings.select(col("vec_id"),
        posexplode(subspaceArr(col("embedding"), m, sub))
          .as(Seq("j", "subvec")))
      .localCheckpoint(true)
    // init: the (up to) k hash-smallest vectors seed all m codebooks;
    // a corpus below k shrinks the codebooks rather than leaving
    // phantom empty centroids that would win the argmax at score 0
    val initIds = embeddings.select(col("vec_id"))
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h", "vec_id").limit(k)
      .collect().map(_.getLong(0))
    require(initIds.nonEmpty, "cannot train PQ on an empty corpus")
    val kEff = initIds.length
    var codebooks: Array[Array[Array[Double]]] = {
      val seed = subs
        .filter(col("vec_id").isInCollection(initIds.toIndexedSeq))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val byId = initIds.zipWithIndex.toMap
      val cb = Array.fill(m, kEff)(Array.empty[Double])
      seed.foreach { case (id, j, v) => cb(j)(byId(id)) = v }
      cb
    }
    // nested literal [j][cid] -> (cid, cvec, ||cvec||^2); nearest-by-L2
    // via argmax of 2<x,c> - <c,c> (the <x,x> term is rank-invariant)
    def cbArr(cb: Array[Array[Array[Double]]]): Column =
      array(cb.toIndexedSeq.map(cents => array(cents.zipWithIndex.toIndexedSeq.map {
        case (v, cid) => struct(lit(cid).as("cid"),
          array(v.toIndexedSeq.map(lit): _*).as("cvec"),
          lit(v.map(x => x * x).sum).as("cc"))
      }: _*)): _*)
    def assign(cb: Array[Array[Array[Double]]]): DataFrame =
      subs.select(col("vec_id"), col("j"), col("subvec"),
        array_max(transform(element_at(cbArr(cb), col("j") + 1), c =>
          struct((dotCol(col("subvec"), c.getField("cvec")) * 2 -
            c.getField("cc")).as("s"), c.getField("cid").as("cid"))))
          .getField("cid").as("cid"))
    var assigned = assign(codebooks).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val means = assigned
        .select(col("j"), col("cid"),
          posexplode(col("subvec")).as(Seq("dim", "v")))
        .groupBy("j", "cid", "dim").agg(round(avg(col("v")), 9).as("mv"))
        .collect()
      val next = codebooks.map(_.map(_.clone))
      means.groupBy(r => (r.getInt(0), r.getInt(1))).foreach {
        case ((j, cid), rows) =>
          val vec = new Array[Double](sub)
          rows.foreach(r => vec(r.getInt(2)) = r.getDouble(3))
          next(j)(cid) = vec // empty clusters keep their old centroid
      }
      codebooks = next
      assigned = assign(codebooks).localCheckpoint(true)
    }
    val codes = assigned
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("cid")))),
        p => p.getField("cid")).as("codes"))
    (codes, codebooks)
  }

  /** PQ top-k with exact re-rank: the asymmetric-distance (ADC) scan
    * reads only each vector's m-byte code — per subspace, the
    * query-to-centroid dot products and centroid norms are m*k driver
    * constants baked into the plan — ranks the corpus by approximate
    * cosine, keeps `rerank` candidates, and scores just those exactly.
    * Both cuts plan as TakeOrderedAndProject; the full-width embedding
    * column is only read for the `rerank` survivors. Output equals
    * brute force whenever the true top-k survives the ADC cut (the
    * PQ recall sweep in Scratch `pqtopk:<rerank>` sizes the margin).
    */
  def pqTopK(embeddings: DataFrame, query: Seq[Double], topK: Int,
             m: Int = 16, k: Int = 32, rerank: Int = 100,
             iterations: Int = 2): DataFrame = {
    val (codes, codebooks) = pqTrainEncode(embeddings, m, k, iterations)
    pqAdcTopK(codes, embeddings, codebooks, query, topK, rerank)
  }

  /** The ADC probe against an already-encoded corpus — shared by
    * [[pqTopK]] (fresh) and [[AnnIndex]]'s persisted-artifact path.
    * `codes` needs `(vec_id, codes)`, `embeddings` `(vec_id,
    * embedding)`; they may be the same columnar table (the scan stage
    * then reads ONLY the codes column — column pruning delivers the
    * narrow-scan win without a separate sidecar).
    */
  def pqAdcTopK(codes: DataFrame, embeddings: DataFrame,
                codebooks: Array[Array[Array[Double]]], query: Seq[Double],
                topK: Int, rerank: Int): DataFrame = {
    val m = codebooks.length
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val sub = codebooks(0)(0).length
    require(query.length == m * sub,
      s"query has ${query.length} dims; the codebooks were trained on ${m * sub}")
    // adc(j)(cid) = <q_j, c>, nrm(j)(cid) = <c, c>
    val adc = codebooks.zipWithIndex.map { case (cents, j) =>
      val qj = query.slice(j * sub, (j + 1) * sub)
      cents.map(c => c.zip(qj).map { case (a, b) => a * b }.sum)
    }
    val nrm = codebooks.map(_.map(_.map(x => x * x).sum))
    def tab(t: Array[Array[Double]]): Column =
      array(t.toIndexedSeq.map(r => array(r.toIndexedSeq.map(lit): _*)): _*)
    val idx = sequence(lit(0), lit(m - 1))
    val approxDot = aggregate(
      zip_with(idx, col("codes"), (j, c) =>
        element_at(element_at(tab(adc), j + 1), c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val approxNormSq = aggregate(
      zip_with(idx, col("codes"), (j, c) =>
        element_at(element_at(tab(nrm), j + 1), c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val candidates = codes
      .select(col("vec_id"),
        (approxDot / (sqrt(approxNormSq) * qNorm + lit(1e-12))).as("acos"))
      .orderBy(desc("acos"), asc("vec_id"))
      .limit(rerank)
    val q = array(query.map(lit): _*)
    candidates
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("vec_id"), cosineCol(col("embedding"), q).as("cosine"))
      .orderBy(topKCut: _*)
      .limit(topK)
  }

  /** Batch ANN over the PQ-encoded corpus: top-`topK` per query for a
    * whole QUERY TABLE `(q_id, embedding)` in one distributed plan —
    * the shape an embedding-search service actually runs at scale,
    * where per-query driver-constant ADC tables ([[pqAdcTopK]]) would
    * mean one Spark job per query.
    *
    * Plan: the per-(query, subspace, centroid) partial dots (Q*m*k
    * rows — thousands of queries fit comfortably) BROADCAST-join the
    * map-side exploded `(vec_id, j, cid)` code stream; one
    * (q_id, vec_id) hash aggregate sums the m partials; per-vector
    * approximate norms are query-independent and computed WITHOUT the
    * explode (HOF over the codes array). Per-query candidate and
    * final cuts are rank-windows partitioned by q_id — no global
    * sort, no per-query job. Exact re-rank of `rerank` survivors per
    * query equals brute force under the same margin as [[pqTopK]].
    */
  def pqBatchTopK(codes: DataFrame, embeddings: DataFrame, queries: DataFrame,
                  codebooks: Array[Array[Array[Double]]], topK: Int,
                  rerank: Int = 300): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    // cheap fail-fast on dimensionality: a mismatched query would be
    // sliced into misaligned subvectors and score silent garbage (the
    // query table is small — one tiny job at plan-build time)
    val qdims = queries.select(size(col("embedding")).as("d"))
      .distinct().collect().map(_.getInt(0))
    require(qdims.forall(_ == m * sub),
      s"query dims ${qdims.mkString(",")} != codebook dims ${m * sub}")
    // query-side: (q_id, qnorm, j, cid, pdot) — Q*m*k rows, broadcast
    val qparts = queries
      .select(col("q_id"),
        sqrt(dotCol(col("embedding"), col("embedding"))).as("qnorm"),
        posexplode(subspaceArr(col("embedding"), m, sub))
          .as(Seq("j", "subvec")))
      .select(col("q_id"), col("qnorm"), col("j"),
        posexplode(transform(element_at(codebookVecLit(codebooks), col("j") + 1),
          c => dotCol(col("subvec"), c))).as(Seq("cid", "pdot")))
    // vector-side: approx norm without exploding; the code stream
    // explodes map-side to (vec_id, j, cid)
    val vecNorm = sqrt(aggregate(
      zip_with(sequence(lit(0), lit(m - 1)), col("codes"), (j, c) =>
        element_at(element_at(codebookNormLit(codebooks), j + 1), c + 1)),
      lit(0.0), (acc, x) => acc + x))
    val exploded = codes.select(col("vec_id"), vecNorm.as("vnorm"),
      posexplode(col("codes")).as(Seq("j", "cid")))
    val byQ = Window.partitionBy("q_id")
    val scored = exploded
      .join(broadcast(qparts), Seq("j", "cid"))
      .groupBy("q_id", "vec_id")
      .agg((sum("pdot") / (first("vnorm") * first("qnorm") + lit(1e-12)))
        .as("acos"))
    // two-phase per-query candidate cut: a single rank window per q_id
    // would funnel EVERY corpus vector's score for a query into one
    // task (a per-query full-corpus sort — the thing this operator
    // exists to avoid). Phase 1 takes the per-(query, vec-hash-bucket)
    // top-rerank (each window holds ~N/buckets rows); phase 2 ranks
    // only buckets*rerank survivors per query. The true per-query
    // top-rerank is contained in the union of per-bucket top-reranks.
    val buckets = 32
    val byQBucket = Window.partitionBy("q_id", "__b")
    val candidates = scored
      .withColumn("__b", pmod(xxhash64(col("vec_id")), lit(buckets)))
      .withColumn("__rk1", row_number().over(
        byQBucket.orderBy(desc("acos"), asc("vec_id"))))
      .filter(col("__rk1") <= rerank)
      .withColumn("__rk", row_number().over(
        byQ.orderBy(desc("acos"), asc("vec_id"))))
      .filter(col("__rk") <= rerank)
      .select("q_id", "vec_id")
    candidates
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries.select(col("q_id"),
        col("embedding").as("__q_emb"))), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineCol(col("embedding"), col("__q_emb")).as("cosine"))
      // per-query final rank on the SAME 4-dp grid as the single-query
      // cuts ([[topKCut]]) — sf0.1 has a real rank-10 tie (two vectors
      // at rounded cosine 0.3064) where a raw-double rank disagrees
      // with both the brute path and the rounded-ranking SQL oracle
      .withColumn("rank", row_number().over(byQ.orderBy(topKCut: _*)))
      .filter(col("rank") <= topK)
      .select("q_id", "vec_id", "rank", "cosine")
  }

  /** IVF-pruned top-k: rank centroids against the query on the driver
    * (k dot products), scan only the `nProbe` nearest clusters, exact
    * cosine re-rank inside them.
    */
  def ivfTopK(embeddings: DataFrame, query: Seq[Double], topK: Int,
              k: Int = 16, nProbe: Int = 4): DataFrame = {
    val (assigned, centroids) = ivfTrain(embeddings, k)
    val probes = probeOrder(centroids, query).take(nProbe)
    val q = array(query.map(lit): _*)
    assigned.filter(col("cluster").isin(probes: _*))
      .select(col("vec_id"), cosineCol(col("embedding"), q).as("cosine"))
      .orderBy(topKCut: _*)
      .limit(topK)
  }

  /** SemDeDup-style cluster-partitioned semantic dedup (the method of
    * Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster the corpus
    * with the oracle-exact k-means, then look for near-duplicates
    * ONLY within each cluster — the pair search shrinks from O(n²)
    * to Σ|cluster|², and at 100 TB each cluster partition dedups
    * independently (embarrassingly parallel across the persisted
    * cluster-partitioned layout [[ivfTrain]] already writes). This is
    * the clustering-bounded complement of the LSH-banded pair path
    * ([[graft.ops.Dedup.embeddingNearDupBanded]]): LSH bounds by
    * bucket caps with a recall argument; SemDeDup bounds by the
    * trained partition with cross-cluster misses as the documented
    * recall cost.
    *
    * Prune rule (deterministic, relation-algebraic): a vector is
    * PRUNED iff a SMALLER-vec_id member of its cluster has rounded
    * cosine >= `minCos` with it; the smallest such neighbor is
    * reported as the keeper. (The paper keeps the member closest to
    * the centroid per duplicate group; the min-id rule is the same
    * candidate geometry with an engine-portable, tie-free decision.)
    * Cosines round to 4 dp before the threshold — every comparison is
    * on the same grid the SQL oracle computes, which replays training
    * AND pruning end-to-end (the `dedup_semdedup` row).
    *
    * Returns the prune list `(vec_id, cluster, kept_by, cos)` —
    * subtract it from the corpus to materialize the deduplicated set.
    *
    * `maxClusterSize` is the quadratic knife-edge guard (the
    * hot-shingle-guard philosophy: degrade LOUDLY, never silently):
    * the pair join costs Σ|cluster|², so one degenerate giant cluster
    * — k too small for the corpus, or a pathological embedding mass —
    * turns the method quadratic. The size check reads the node-sized
    * assignment (one tiny aggregate) and fails with the fix (raise k
    * or the bound) instead of launching the blowup join.
    */
  def semDedup(embeddings: DataFrame, k: Int, rounds: Int = 1,
               minCos: Double = 0.4,
               maxClusterSize: Long = 1000000L): DataFrame = {
    val (assigned, _) = kMeansExactModel(embeddings, k, rounds)
    val biggest = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
      .agg(coalesce(max("n"), lit(0L))).first().getLong(0)
    require(biggest <= maxClusterSize,
      s"semDedup: largest cluster has $biggest members (> $maxClusterSize); " +
        "the within-cluster pair join would be quadratic in it - raise k " +
        "(more, smaller partitions) or maxClusterSize if the cost is intended")
    val lo = assigned.select(col("cluster"), col("vec_id").as("kept_cand"),
      col("emb").as("emb_a"))
    val hi = assigned.select(col("cluster"), col("vec_id"),
      col("emb").as("emb_b"))
    lo.join(hi, Seq("cluster"))
      .filter(col("kept_cand") < col("vec_id"))
      .select(col("cluster"), col("vec_id"), col("kept_cand"),
        round(cosineCol(col("emb_a"), col("emb_b")), 4).as("cos"))
      .filter(col("cos") >= minCos)
      // smallest qualifying neighbor wins; the struct min carries its
      // cosine along (kept_cand is unique per (vec_id, cluster) pair)
      .groupBy("vec_id", "cluster")
      .agg(min(struct(col("kept_cand"), col("cos"))).as("m"))
      .select(col("vec_id"), col("cluster"),
        col("m.kept_cand").as("kept_by"), col("m.cos").as("cos"))
  }

  /** All-pairs k-nearest-neighbors per label group (a bounded-key
    * shuffle join on `label`), exact within group: for corpora where a
    * coarse partitioner (label / IVF centroid) already exists. Returns
    * the `k` nearest neighbors of every vector within its label.
    */
  def knnWithinLabel(embeddings: DataFrame, k: Int): DataFrame = {
    val l = embeddings.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val r = embeddings.select(col("label"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    val w = Window.partitionBy("vec_a").orderBy(desc("cosine"), asc("vec_b"))
    l.join(r, Seq("label"))
      .filter(col("vec_a") =!= col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosineCol(col("emb_a"), col("emb_b")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Nearest-centroid assignment — the k-means classify/E step as a
    * standalone operator (cluster labeling for diversity analysis,
    * topic bucketing, IVF routing). `centroids` is model-sized
    * (`cluster`, `centroid`) and broadcasts; the corpus side pays one
    * k-fanout projection plus a per-vector argmax window over exactly
    * k rows (bounded fanout — nothing corpus-sized shuffles beyond the
    * k-way expansion). Cosines are rounded to 4 decimals BEFORE the
    * argmax so the winner is reproducible across engines; ties break
    * on the lowest cluster id.
    */
  def assignToCentroids(embeddings: DataFrame, centroids: DataFrame,
                        embCol: String = "embedding"): DataFrame = {
    val scored = embeddings.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cluster"),
        round(cosineCol(col(embCol), col("centroid")), 4).as("cos"))
    val w = Window.partitionBy("vec_id")
      .orderBy(desc("cos"), asc("cluster"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Maximal-marginal-relevance re-ranking (public: Carbonell &
    * Goldstein 1998) — the diversity-aware retrieval endgame: pick k
    * results that are relevant to the query but NOT redundant with
    * each other, `score(d | S) = λ·cos(q,d) − w·max_{s∈S} cos(d,s)`
    * (`w` is the diversity weight, conventionally `1−λ`; it is a
    * SEPARATE parameter so both constants are exact decimal literals —
    * computing `1.0 − 0.7` would bake 0.30000000000000004 into every
    * score and diverge from any engine that writes `0.3`).
    *
    * Scale shape: the corpus-sized work is ONE distributed top-`poolSize`
    * cosine scan (per-partition TakeOrdered, no shuffle — same plan as
    * [[bruteForceTopK]]). The greedy selection is inherently sequential,
    * so it runs driver-side over the POOL ONLY — a model-sized
    * candidate set (≤ ~100 rows × dim), the same bounded-driver-state
    * argument as IVF centroids and PQ codebooks. All cosines are
    * rounded to 4 decimals BEFORE selection (pairwise cosines computed
    * driver-side with the exact [[graft.functions.VectorExpressions]]
    * formula: left-to-right double accumulation, `dot/(√na·√nb)`), so
    * every comparison is over engine-portable values; ties break on
    * the lowest vec_id.
    */
  def mmrRerank(embeddings: DataFrame, query: Seq[Double], poolSize: Int,
                k: Int, lambda: Double = 0.7,
                diversityWeight: Double = 0.3): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need 1 <= k <= poolSize: k=$k pool=$poolSize")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = array(query.map(lit): _*)
    val pool: Array[(Long, Double, Array[Double])] = embeddings
      .select(col("vec_id"),
        round(cosineCol(col("embedding"), q), 4).as("qcos"), col("embedding"))
      .orderBy(desc("qcos"), asc("vec_id")).limit(poolSize)
      .collect()
      .map { r =>
        val emb: Array[Double] = r.get(2) match {
          // collection.Seq, NOT the default immutable.Seq alias — Row
          // arrays come back as mutable.ArraySeq
          case s: scala.collection.Seq[_] =>
            s.map(_.asInstanceOf[Number].doubleValue).toArray
          case a: Array[Float] => a.map(_.toDouble)
          case a: Array[Double] => a
          case l: java.util.List[_] =>
            val out = new Array[Double](l.size); var i = 0
            while (i < out.length) {
              out(i) = l.get(i).asInstanceOf[Number].doubleValue; i += 1 }
            out
          case other => throw new IllegalArgumentException(
            s"unexpected embedding runtime type: ${other.getClass.getName}")
        }
        (r.getLong(0), r.getDouble(1), emb)
      }
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val n = pool.length
    val pcos = Array.tabulate(n, n)((i, j) =>
      if (i == j) 0.0 else round4(cos(pool(i)._3, pool(j)._3)))
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    while (picks.length < math.min(k, n)) {
      var bestIdx = -1; var bestScore = 0.0
      for (i <- 0 until n if !selected.contains(i)) {
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(j => pcos(i)(j)).max
        val score = lambda * pool(i)._2 - diversityWeight * maxSim
        // exact-tie scores break on the lowest vec_id (two candidates
        // with DIFFERENT qcos can tie after the diversity term, and
        // pool order is qcos-major — not vec_id order)
        if (bestIdx < 0 || score > bestScore ||
            (score == bestScore && pool(i)._1 < pool(bestIdx)._1)) {
          bestIdx = i; bestScore = score
        }
      }
      selected += bestIdx
      picks += ((picks.length + 1, pool(bestIdx)._1, bestScore))
    }
    picks.toSeq.toDF("mmr_rank", "vec_id", "score")
  }

  /** Dominant singular direction of the embedding matrix by BIT-PORTABLE
    * distributed power iteration — the building block for PCA whitening,
    * spectral outlier screens, and 1-D spectral ordering of a corpus.
    * `v_{t+1} = normalize(Xᵀ (X v_t))` without ever materializing the
    * d×d Gram matrix: each round is ONE embeddings scan computing the
    * per-row projection then a d-sized per-dimension aggregation —
    * model-sized (d) driver state, corpus never shuffles beyond a
    * d×partitions partial-combine, so the round cost at 100 TB is the
    * scan, exactly like [[ivfTrain]]'s E step.
    *
    * Every cross-engine wobble source is removed (the [[kMeansExact]]
    * discipline, extended to linear algebra): both contractions are
    * sums of per-term `floor(product · scale)` INTEGERS — associative-
    * commutative exactly, so partitioning and aggregation order cannot
    * change a bit:
    *
    *  - projection: `r_row = Σ_i floor(x_i · v_i · 1e9)` (a long);
    *  - back-projection: `s_dim = Σ_rows floor(x_dim · (r/1e9) · backScale)`;
    *  - normalize: `v_i = s_i / sqrt(Σ s_i²)` — the squared sum must
    *    fit a LONG (both engines then make ONE correctly-rounded
    *    long→double conversion; hugeint→double is double-rounded in
    *    some engines), then one IEEE sqrt and one division per
    *    component.
    *
    * A SQL engine replays it unrolled (the `sim_power_iteration`
    * DuckDB oracle does, bit-exact — the checker compares doubles with
    * `==`). `backScale` trades floor-truncation noise (~1/backScale
    * relative, irrelevant after normalization) against long headroom:
    * `Σ s²  <= d · (n · max|x| · backScale)²` must stay under 2⁶³ —
    * the default 1e4 covers ~65k unit-norm rows per... per corpus with
    * d=64; the guard fails LOUDLY telling the caller to lower it
    * rather than wrapping silently. Starts from the basis vector e₀;
    * an all-zero projection round keeps the previous direction
    * (degenerate input guard). Returns one row per dimension:
    * `(dim, component)`.
    */
  def powerIteration(embeddings: DataFrame, iterations: Int = 3,
                     backScale: Double = 1e4): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val d = embeddings.select(size(col("embedding"))).first().getInt(0)
    val e = embeddings.select(col("embedding").cast("array<double>").as("emb"))
    var v: Array[Double] = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to iterations) {
      val vLit = array(v.toIndexedSeq.map(lit): _*)
      val projected = e.select(col("emb"),
        aggregate(
          zip_with(col("emb"), vLit, (x, vi) => floor(x * vi * lit(1e9))),
          lit(0L), (acc, t) => acc + t).as("r"))
      val sums = projected
        .select(posexplode(col("emb")).as(Seq("dim", "x")),
          (col("r") / lit(1e9)).as("rv"))
        .groupBy("dim")
        .agg(sum(floor(col("x") * col("rv") * lit(backScale))).as("s"))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val s = new Array[Long](d)
      sums.foreach { case (i, si) => s(i) = si }
      val sumsq = s.iterator.map(si => BigInt(si) * BigInt(si)).sum
      require(sumsq.isValidLong,
        s"powerIteration norm² overflows long ($sumsq): lower backScale " +
          s"(currently $backScale) for this corpus size")
      if (sumsq != 0) {
        val norm = math.sqrt(sumsq.toLong.toDouble)
        v = s.map(_.toDouble / norm)
      }
    }
    v.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("dim", "component")
  }

  /** NDCG discount table in exact integer micro-units:
    * `D(r) = round(1e9 / log2(r + 1))` for ranks 1..`k`. Tabulating the
    * irrational discounts as fixed integers makes the DCG sum
    * associative-commutative EXACTLY (no double-summation-order wobble)
    * and removes any cross-engine `log2` last-ulp question — the SQL
    * oracle embeds the SAME integers. Shared so both sides are
    * generated from one source of truth.
    */
  private[graft] def ndcgDiscountsMicro(k: Int): Array[Long] =
    Array.tabulate(k)(i =>
      math.round(1e9 / (math.log(i + 2.0) / math.log(2.0))))

  /** Prefix sums of [[ndcgDiscountsMicro]]: `P(j)` = ideal DCG of `j`
    * relevant documents, in micro-units.
    */
  private[graft] def ndcgIdealPrefixMicro(k: Int): Array[Long] =
    ndcgDiscountsMicro(k).scanLeft(0L)(_ + _).tail

  /** Retrieval-quality evaluation of exact cosine ranking against
    * label ground truth — the eval harness every embedding pipeline
    * needs before trusting an ANN index or a trained encoder: for each
    * query vector, rank the rest of the corpus by cosine and score
    * precision@k, recall@k, MRR@k and NDCG@k with relevance =
    * same-label.
    *
    * Scale shape: the query set is MODEL-sized (collected and inlined
    * as a literal struct array — no join, the corpus scan stays in
    * whole-stage codegen); ranking is the two-phase per-(query,
    * vec-hash-bucket) cut from [[pqBatchTopK]], so no per-query
    * full-corpus sort ever lands in one task; label totals are a
    * label-sized aggregate. One corpus scan total.
    *
    * Every metric is EXACT cross-engine arithmetic: hit counts and
    * first-relevant ranks are integers, precision/recall/MRR are
    * single divisions, and DCG/IDCG are integer sums of the tabulated
    * [[ndcgDiscountsMicro]] discounts divided once at the end — the
    * DuckDB oracle (generated from the same constants) compares
    * doubles with `==`.
    */
  def retrievalEval(embeddings: DataFrame, queries: DataFrame,
                    k: Int = 10, buckets: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val qRows = queries.select("vec_id", "embedding", "label").collect()
    require(qRows.nonEmpty && qRows.length <= 1024,
      s"query set must be model-sized (1..1024 rows): ${qRows.length}")
    val qLit = array(qRows.toIndexedSeq.map { r =>
      val emb = r.get(1) match {
        case s: scala.collection.Seq[_] =>
          s.map(x => x.asInstanceOf[Number].doubleValue)
        case other => throw new IllegalArgumentException(
          s"unexpected embedding type ${other.getClass.getName}")
      }
      struct(lit(r.getLong(0)).as("q_id"),
        array(emb.toIndexedSeq.map(lit): _*).as("q_emb"),
        lit(r.getInt(2)).as("q_label"))
    }: _*)
    val discounts = ndcgDiscountsMicro(k)
    val prefix = ndcgIdealPrefixMicro(k)
    val dLit = array(discounts.toIndexedSeq.map(lit): _*)
    val pLit = array(prefix.toIndexedSeq.map(lit): _*)

    val scored = embeddings
      .select(col("vec_id"), col("label"), col("embedding"), explode(qLit).as("q"))
      .filter(col("vec_id") =!= col("q.q_id"))
      .select(col("q.q_id").as("q_id"), col("q.q_label").as("q_label"),
        col("vec_id"), col("label"),
        cosineCol(col("embedding"), col("q.q_emb")).as("cos"))
    val w1 = Window.partitionBy(col("q_id"), pmod(col("vec_id"), lit(buckets)))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val w2 = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    val topk = scored
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= k)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)

    val rel = col("label") === col("q_label")
    val perQ = topk.groupBy("q_id", "q_label").agg(
      sum(when(rel, 1L).otherwise(0L)).as("hits"),
      min(when(rel, col("rank"))).as("first_rel"),
      coalesce(sum(when(rel, element_at(dLit, col("rank")))), lit(0L)).as("dcg"))
    val labelCounts = embeddings.groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("n_label"))
    perQ.join(broadcast(labelCounts), "q_label")
      .select(col("q_id"), col("hits"),
        (col("n_label") - 1).as("n_rel"),
        (col("hits").cast("double") / lit(k)).as("precision_at_k"),
        when(col("n_label") - 1 === 0, 0.0)
          .otherwise(col("hits").cast("double") / (col("n_label") - 1))
          .as("recall_at_k"),
        when(col("first_rel").isNull, 0.0)
          .otherwise(lit(1.0) / col("first_rel")).as("mrr"),
        when(col("n_label") - 1 === 0, 0.0)
          .otherwise(col("dcg").cast("double") /
            element_at(pLit, least(col("n_label") - 1, lit(k)).cast("int")))
          .as("ndcg_at_k"))
  }
}
