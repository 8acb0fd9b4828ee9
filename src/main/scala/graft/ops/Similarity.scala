package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (probe set broadcast against the
  * corpus — one map-side join, no shuffle of the corpus). Scale path:
  * random-hyperplane LSH bucketing so each probe only scans its
  * bucket. All arithmetic is double, evaluated left-to-right with
  * Catalyst `aggregate`, so results are bit-deterministic.
  */
object Similarity {

  /** Plain double cosine — codegen'd kernel (Catalyst higher-order
    * functions are CodegenFallback and cost interpreted lambda
    * dispatch per element; see graft.functions.VecSim).
    */
  def cosine(a: Column, b: Column): Column = GraftFunctions.cosine_sim(a, b)

  /** Integer-quantized cosine (values scaled by 1000 and rounded):
    * integer dot/norms make the result reproducible across engines —
    * used by the DuckDB oracle parity queries. Codegen'd kernel with
    * Spark-`round`-exact quantization.
    */
  def cosineQuantized(a: Column, b: Column, scale: Int = 1000): Column =
    GraftFunctions.cosine_quantized(a, b, scale)

  /** All `tables` random-hyperplane sign-buckets (`planes` planes each)
    * in one codegen'd kernel pass — array<long>. Distinct tables give
    * independent LSH tables (the union recovers pairs a single table
    * loses to a sign flip on a near-zero projection).
    */
  def hyperplaneBuckets(embedding: Column, tables: Int, planes: Int): Column =
    GraftFunctions.hyperplane_buckets(embedding, tables, planes)

  /** Brute-force top-k cosine neighbors for a probe subset.
    *
    * @param embeddings (vec_id, embedding)
    * @param probeIds which vec_ids to search for
    * @param k neighbors per probe
    * @param quantized integer-quantized arithmetic (oracle parity)
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      probeIds: Seq[Long],
      k: Int,
      quantized: Boolean = false): DataFrame = {
    val probes = embeddings
      .filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val joined = embeddings.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
    val cos = if (quantized) cosineQuantized(col("probe_vec"), col("embedding"))
      else cosine(col("probe_vec"), col("embedding"))
    val scored = joined.select(
      col("probe_id"), col("vec_id").as("neighbor_id"), cos.as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Score bounded (probe_id, neighbor_id) candidates and keep the
    * cosine top-k per probe — the shared tail of every ANN variant.
    * Candidates arrive as IDS ONLY; vectors join back exactly once.
    */
  private def topKFromCandidates(
      embeddings: DataFrame, cand: DataFrame, probeIds: Seq[Long], k: Int): DataFrame = {
    val probeVecs = embeddings.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val scored = cand
      .join(broadcast(probeVecs), "probe_id")
      .join(embeddings.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nbr_vec")), "neighbor_id")
      .select(col("probe_id"), col("neighbor_id"),
        cosine(col("probe_vec"), col("nbr_vec")).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** IVF list count for an `n`-vector corpus — the √n rule every IVF
    * implementation documents (FAISS guidelines: nlist between √n and
    * 16√n; we take √n and clamp), mirroring [[graft.ops.Dedup.planesFor]].
    * At 10^12 vectors this yields 10^6 cells — far past
    * `centroidLiteralMax`, so the broadcast-join assignment path (not
    * the codegen literal) is what runs at scale.
    */
  def nlistFor(n: Long): Int =
    math.min(1 << 20, math.max(32, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Above this nlist, Voronoi assignment switches from an
    * explode-over-codegen-literal (zero joins, but the literal lives
    * inside generated code — janino cannot carry a multi-MB constant,
    * let alone the multi-hundred-MB table nlist≈10^6 implies) to a
    * broadcast hash join against a centroids DataFrame (one
    * torrent-broadcast per executor, streamed — the standard
    * big-small join). Both paths are spec-pinned to produce identical
    * cells.
    */
  val centroidLiteralMax = 1024

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path alongside [[lshTopK]] (FAISS-IVF shape: Johnson et al.,
    * "Billion-scale similarity search with GPUs", §4 — minus the
    * k-means refinement, which only moves the centroids, not the
    * algorithm): `nlist` deterministically hash-sampled corpus vectors
    * act as centroids, every vector is assigned to its nearest centroid
    * by cosine (its Voronoi cell), and each probe scans only its
    * `nprobe` nearest cells.
    *
    * Scale shape: the quantizer is `nlist` rows (√n per [[nlistFor]]);
    * assignment is one pass over the corpus — explode-over-literal
    * (whole-stage codegen, no join) for small quantizers, a broadcast
    * hash join above [[centroidLiteralMax]] — followed by a
    * map-side-combining argmax; candidates move ids only. At 10^12
    * docs the per-cell candidate count is |corpus|·nprobe/nlist in
    * expectation — nlist is the knob that bounds the scan exactly
    * like an IVF index on one node.
    */
  def ivfTopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int,
      nlist: Int = 32, nprobe: Int = 4,
      literalMax: Int = centroidLiteralMax): DataFrame = {
    // deterministic "training" sample: nlist corpus vectors in
    // xxhash64(vec_id) order (id tiebreak) — no RNG, stable across
    // runs, resumes and parallelism
    val centroids = embeddings
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
      .orderBy(xxhash64(col("centroid_id")).asc, col("centroid_id").asc)
      .limit(nlist)
    // quantizer sample collected ONCE per call (r6): nearestCells runs
    // for corpus cells AND probe cells, and the collect used to live
    // inside scoredAgainstCentroids — the literal path then ran the
    // orderBy+limit training job and the driver collect twice per
    // ivfTopK call (identical results both times: the sort key is a
    // unique total order — pure waste)
    lazy val centData = centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    // (vec_id, centroid_id, ccos) for every (vector, centroid) pair;
    // literal and broadcast-join shapes are semantically identical
    // (spec-pinned) — only where the centroid table LIVES differs
    def scoredAgainstCentroids(df: DataFrame): DataFrame =
      if (nlist <= literalMax) {
        df.select(col("vec_id"), col("embedding"),
            explode(typedlit(centData)).as("c"))
          .select(col("vec_id"), col("c._1").as("centroid_id"),
            cosine(col("embedding"), col("c._2")).as("ccos"))
      } else
        df.select(col("vec_id"), col("embedding"))
          .crossJoin(broadcast(centroids))
          .select(col("vec_id"), col("centroid_id"),
            cosine(col("embedding"), col("centroid_vec")).as("ccos"))
    def nearestCells(df: DataFrame, keep: Int): DataFrame = {
      val scored = scoredAgainstCentroids(df)
      if (keep == 1)
        // argmax as a map-side-combining aggregate (struct order:
        // best cosine, then highest centroid id — deterministic)
        scored.groupBy("vec_id")
          .agg(max(struct(col("ccos"), col("centroid_id"))).as("m"))
          .select(col("vec_id"), col("m.centroid_id").as("centroid_id"))
      else {
        val w = Window.partitionBy("vec_id")
          .orderBy(col("ccos").desc, col("centroid_id").asc)
        scored.withColumn("r", row_number().over(w)).filter(col("r") <= keep)
          .select(col("vec_id"), col("centroid_id"))
      }
    }
    val cells = nearestCells(embeddings, 1)
    val probeCells = nearestCells(
      embeddings.filter(col("vec_id").isin(probeIds: _*)), nprobe)
      .withColumnRenamed("vec_id", "probe_id")
    val cand = cells.join(broadcast(probeCells), "centroid_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id")).distinct()
    topKFromCandidates(embeddings, cand, probeIds, k)
  }

  /** LSH-bucketed approximate top-k: probes only scan vectors sharing
    * a hyperplane bucket in ANY of `tables` independent tables (union
    * of tables trades a bounded constant of extra candidates for much
    * better recall than one table). Candidate generation moves ids
    * only; vectors re-join once for scoring. Same output shape as
    * bruteForceTopK.
    */
  def lshTopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int,
      planes: Int = 6, tables: Int = 4): DataFrame = {
    val bucketed = embeddings.select(col("vec_id"),
      posexplode(hyperplaneBuckets(col("embedding"), tables, planes)))
      .toDF("vec_id", "tbl", "bucket")
    val probeBuckets = bucketed.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("tbl"), col("bucket"))
    val cand = bucketed.join(broadcast(probeBuckets), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id")).distinct()
    topKFromCandidates(embeddings, cand, probeIds, k)
  }
}
