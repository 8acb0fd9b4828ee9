package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines,
  * over a `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * Scale notes: every variant is a groupBy/join on a compact derived
  * key (hash, band, bucket) — no all-pairs stage ever materializes
  * outside a bounded block. Keys are computed in whole-stage codegen.
  */
object Dedup {

  /** Exact dedup by content hash (after whitespace/case normalization):
    * each doc labeled with its content group's canonical (min) doc_id.
    */
  def exact(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val hashed = docs.select(col("doc_id"), md5(norm).as("content_hash"))
    val canon = hashed.groupBy("content_hash")
      .agg(min("doc_id").as("canonical_doc_id"), count(lit(1)).as("group_size"))
    hashed.join(canon, "content_hash")
      .select(col("doc_id"), col("content_hash"), col("canonical_doc_id"),
        col("group_size"), (col("doc_id") === col("canonical_doc_id")).as("is_canonical"))
  }

  /** Word n-gram shingle set of `text` (distinct, order-free). Docs
    * with fewer than `n` tokens yield an empty set — guarded with a
    * `when`, because `sequence(a, b)` auto-steps DOWNWARD when b < a
    * (round 1 fed the resulting 0 index into `slice`, which Spark
    * rejects at runtime for any short doc).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = filter(split(trim(text), "\\s+"), t => t =!= "")
    if (n == 1) array_distinct(toks)
    else {
      val shingled = transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))
      array_distinct(
        when(size(toks) >= n, shingled).otherwise(array().cast("array<string>")))
    }
  }

  /** Pairwise word-shingle Jaccard within (lang, length-bucket) blocks;
    * emits pairs with jaccard ≥ threshold. The block bound keeps the
    * candidate join quadratic only within a block.
    */
  def ngramJaccard(
      docs: DataFrame,
      n: Int = 1,
      threshold: Double = 0.6,
      lengthBucket: Int = 100): DataFrame = {
    val withSets = docs.select(
      col("doc_id"), col("lang"),
      (col("n_chars") / lengthBucket).cast("int").as("len_bucket"),
      wordShingles(col("text"), n).as("shingles"))
    val l = withSets.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val r = withSets.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    l.join(r, Seq("lang", "len_bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash+LSH near-dup groups: shingle → banded minhash → docs
    * sharing any band key are near-dup candidates; candidates verified
    * with true Jaccard ≥ threshold; groups = connected components are
    * left to the caller (graft.cluster.ConnectedComponents) — here we
    * emit verified candidate pairs.
    */
  def minhashNearDupPairs(
      docs: DataFrame,
      shingleChars: Int = 5,
      bands: Int = 8,
      rows: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("text"),
      explode(GraftFunctions.minhash_band_keys(
        lower(col("text")), shingleChars, bands, rows)).as("band"))
    val l = keyed.select(col("band"), col("doc_id").as("doc_a"), col("text").as("text_a"))
    val r = keyed.select(col("band"), col("doc_id").as("doc_b"), col("text").as("text_b"))
    val cand = l.join(r, Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "text_a", "text_b").distinct()
    val shA = wordShingles(col("text_a"), 1)
    val shB = wordShingles(col("text_b"), 1)
    cand.select(col("doc_a"), col("doc_b"),
      (size(array_intersect(shA, shB)).cast("double") /
        size(array_union(shA, shB))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash per doc (codegen'd kernel; see
    * graft.functions.SimHash64). Near-dups = small hamming distance;
    * the scale path buckets on 16-bit slices of the fingerprint so
    * only same-slice docs are compared.
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.simhash64(col("text")).as("simhash"))

  /** SimHash near-dup candidate pairs: docs sharing any 16-bit slice of
    * the fingerprint are candidates; verified by hamming distance ≤ k.
    */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    val fp = simhash(docs)
    val sliced = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        concat(lit(s"$i:"), shiftright(col("simhash"), i * 16).bitwiseAND(0xffffL))): _*))
        .as("slice"))
    val l = sliced.select(col("slice"), col("doc_id").as("doc_a"), col("simhash").as("fp_a"))
    val r = sliced.select(col("slice"), col("doc_id").as("doc_b"), col("simhash").as("fp_b"))
    l.join(r, Seq("slice"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup candidate pairs within coarse LSH
    * buckets (random-hyperplane signs from deterministic seeded
    * pseudo-vectors): emits pairs with cosine ≥ threshold.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      planes: Int = 8,
      threshold: Double = 0.95): DataFrame = {
    val bucketed = embeddings.select(col("vec_id"), col("embedding"),
      Similarity.hyperplaneBucket(col("embedding"), planes).as("bucket"))
    val l = bucketed.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val r = bucketed.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("e_a"), col("e_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
