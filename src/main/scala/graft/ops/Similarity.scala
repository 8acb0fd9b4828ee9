package graft.ops

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

  /** Σ aᵢ·bᵢ as double (sequential fold → deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Integer-quantized cosine (values scaled by 1000 and rounded):
    * integer dot/norms make the result reproducible across engines —
    * used by the DuckDB oracle parity query.
    */
  def cosineQuantized(a: Column, b: Column, scale: Int = 1000): Column = {
    def q(c: Column): Column = transform(c, x => round(x.cast("double") * scale).cast("long"))
    val (qa, qb) = (q(a), q(b))
    def idot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, r) => p * r), lit(0L), (acc, v) => acc + v)
    idot(qa, qb).cast("double") /
      (sqrt(idot(qa, qa).cast("double")) * sqrt(idot(qb, qb).cast("double")))
  }

  /** Random-hyperplane sign bucket: `planes` pseudo-random hyperplanes
    * derived deterministically from (table seed, plane, dim) via
    * xxhash64 — sign of Σ h(p,i)·vᵢ. Distinct `seed`s give independent
    * tables for multi-table LSH (union of tables recovers pairs a
    * single table loses to a sign flip on a near-zero projection).
    */
  def hyperplaneBucket(embedding: Column, planes: Int, seed: Int = 0): Column = {
    val dims = sequence(lit(0), size(embedding) - 1)
    val bits = (0 until planes).map { p =>
      val s = aggregate(dims, lit(0.0), (acc, i) =>
        acc + element_at(embedding, i + 1).cast("double") *
          (pmod(xxhash64(lit(seed.toLong * 1009L + p), i), lit(1000)).cast("double") / 500.0 - 1.0))
      when(s >= 0, 1L << p).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

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
      explode(array((0 until tables).map(tb =>
        struct(lit(tb).as("tbl"),
          hyperplaneBucket(col("embedding"), planes, seed = tb).as("bucket"))): _*))
        .as("b"))
      .select(col("vec_id"), col("b.tbl").as("tbl"), col("b.bucket").as("bucket"))
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
