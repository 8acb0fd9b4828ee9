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

  /** Exact pairwise word-shingle Jaccard ≥ threshold within
    * (lang, length-bucket) blocks.
    *
    * Candidate generation is PREFIX FILTERING (AllPairs / PPJoin,
    * Bayardo et al. WWW'07; Xiao et al. WWW'08), not the round-1
    * quadratic block self-join: order every shingle set by global
    * rarity (document frequency, then token), keep each doc's first
    * |S| − ⌈t·|S|⌉ + 1 shingles, and join docs sharing a PREFIX
    * shingle within a block. The prefix lemma guarantees every pair
    * with J ≥ t shares a prefix token, so the result is EXACTLY the
    * all-pairs answer (the DuckDB oracle is unchanged) while the join
    * fans out only on rare tokens. A length filter (t·|A| ≤ |B|)
    * prunes further. Verification re-joins the shingle sets by id —
    * ids, not texts, move through the candidate shuffle.
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

    val toks = withSets.select(col("doc_id"), col("lang"), col("len_bucket"),
      size(col("shingles")).as("sz"), explode(col("shingles")).as("t"))
    val dfreq = toks.groupBy("t").agg(count(lit(1)).as("df"))
    // prefix = rarest (|S| − ⌈t·|S|⌉ + 1) shingles; the ε guards the
    // exact-integer boundary of t·|S| in the safe (longer) direction
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .cast("int")
    val prefixes = toks.join(dfreq, "t")
      .groupBy("doc_id", "lang", "len_bucket", "sz")
      .agg(slice(array_sort(collect_list(struct(col("df"), col("t")))),
        lit(1), prefixLen).as("prefix"))
      .select(col("doc_id"), col("lang"), col("len_bucket"), col("sz"),
        explode(col("prefix.t")).as("t"))

    val l = prefixes.select(col("lang"), col("len_bucket"), col("t"),
      col("doc_id").as("doc_a"), col("sz").as("sz_a"))
    val r = prefixes.select(col("lang"), col("len_bucket"), col("t"),
      col("doc_id").as("doc_b"), col("sz").as("sz_b"))
    val cand = l.join(r, Seq("lang", "len_bucket", "t"))
      .filter(col("doc_a") < col("doc_b") &&
        lit(threshold) * col("sz_a") <= col("sz_b") &&
        lit(threshold) * col("sz_b") <= col("sz_a"))
      .select("doc_a", "doc_b").distinct()

    val sets = withSets.select(col("doc_id"), col("shingles"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
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
    // ids ONLY through the band shuffle — round 1 carried both full
    // document texts ×bands×2 sides and ran distinct() over them; at
    // 100 TB that shuffles the corpus 16×. Texts re-join exactly once,
    // after the candidate pair set is deduplicated.
    val keyed = docs.select(col("doc_id"),
      explode(GraftFunctions.minhash_band_keys(
        lower(col("text")), shingleChars, bands, rows)).as("band"))
    val cand = keyed.select(col("band"), col("doc_id").as("doc_a"))
      .join(keyed.select(col("band"), col("doc_id").as("doc_b")), Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sets = docs.select(col("doc_id"), wordShingles(col("text"), 1).as("sh"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
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

  /** Embedding cosine near-dup pairs via MULTI-TABLE random-hyperplane
    * LSH: `tables` independent sign-bucket tables (distinct hash
    * seeds); a pair is a candidate when it shares a bucket in ANY
    * table, which recovers pairs a single table loses to one sign flip
    * on a near-zero projection (round 1 used one 6-plane table: 64
    * buckets total — quadratic at scale AND zero verified rows).
    * Candidates move as ids only; embeddings re-join once for the
    * cosine verify. `quantized` uses integer-quantized cosine for
    * cross-engine oracle parity.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      tables: Int = 6,
      planes: Int = 8,
      threshold: Double = 0.95,
      quantized: Boolean = false): DataFrame = {
    val bucketed = embeddings.select(col("vec_id"),
      posexplode(Similarity.hyperplaneBuckets(col("embedding"), tables, planes)))
      .toDF("vec_id", "tbl", "bucket")
    val cand = bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("id_a"))
      .join(bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = embeddings.select(col("vec_id"), col("embedding"))
    val cos =
      if (quantized) Similarity.cosineQuantized(col("e_a"), col("e_b"))
      else Similarity.cosine(col("e_a"), col("e_b"))
    cand
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("e_a")), "id_a")
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("e_b")), "id_b")
      .select(col("id_a"), col("id_b"), cos.as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
