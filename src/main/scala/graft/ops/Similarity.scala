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
}
