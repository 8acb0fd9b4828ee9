package graft.blocking

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate generation: deterministic blocking keys + optional
  * MinHash-LSH fuzzy-name bands, with explicit hot-key handling.
  *
  * The reference delegates candidate generation to Senzing ⬛; the
  * observable contract is that every merged pair in
  * /root/reference/test/fixtures/flow-output.jsonl shares at least one
  * of: phone, email, SSN, passport, driver's license, national id,
  * house+street, or surname-soundex+birth-year. Those are exactly the
  * deterministic keys below.
  *
  * Scale design (SURVEY.md §7.4 #1): blocking keys are Zipfian. Keys
  * whose block size exceeds `maxBlockSize` would contribute
  * O(n²/block) candidate pairs; they are detected with a cheap
  * aggregate and *dropped* (their docs still pair via their other,
  * more selective keys). The dropped-key count is surfaced so a run
  * at 100 TB reports what it skipped rather than silently exploding.
  */
object Blocking {

  /** LSH banding: P(candidate) = 1-(1-J^rows)^bands — rows=6 keeps the
    * low-similarity mass out (J=0.2 pairs: ~4e-4) while J≥0.8 name
    * pairs still collide with p≈0.85.
    */
  final case class Config(
      maxBlockSize: Int = 64,
      useLsh: Boolean = true,
      lshBands: Int = 6,
      lshRows: Int = 6)

  /** (doc_id, bkey) pairs, exploded and de-duplicated. */
  def blockingKeys(features: DataFrame, cfg: Config = Config()): DataFrame = {
    val nameForLsh = lower(concat_ws(" ", col("surname"), col("given_can")))
    val detKeys = array(
      concat(lit("P:"), col("phone7")),
      concat(lit("E:"), col("email")),
      concat(lit("S:"), col("ssn")),
      concat(lit("PP:"), col("passport")),
      concat(lit("DL:"), col("drlic")),
      concat(lit("NID:"), col("national_id")),
      // address: house number × first two street tokens
      concat(lit("A:"), col("addr.house"), lit(":"), get(col("addr.stokens"), lit(0))),
      concat(lit("A:"), col("addr.house"), lit(":"), get(col("addr.stokens"), lit(1))),
      // surname-phonetic × (year, month) and × (year, day) in ONE key
      // namespace (so month/day-swapped DOBs still collide). Keys carry a dob component because bare
      // soundex×year blocks are Zipf-headed (given-name phonetics
      // especially — ~10^1 distinct codes cover most of a population);
      // swapped first/last fields are covered by the LSH bands, which
      // are order-free over the name's character shingles.
      concat(lit("ND:"), soundex(get(split(col("surname"), " "), lit(0))), lit(":"),
        col("dob.y").cast("string"), lit(":"), col("dob.m").cast("string")),
      concat(lit("ND:"), soundex(get(split(col("surname"), " "), lit(0))), lit(":"),
        col("dob.y").cast("string"), lit(":"), col("dob.d").cast("string")))
    val allKeys =
      if (cfg.useLsh)
        concat(detKeys,
          when(length(nameForLsh) >= 4,
            transform(
              GraftFunctions.minhash_band_keys(nameForLsh, 3, cfg.lshBands, cfg.lshRows),
              b => concat(lit("L:"), b.cast("string"))))
            .otherwise(array().cast("array<string>")))
      else detKeys
    features
      .select(col("doc_id"), explode(allKeys).as("bkey"))
      .filter(col("bkey").isNotNull)
      .distinct()
  }

  /** Hot keys (block size > cfg.maxBlockSize). Small by construction →
    * broadcast for the anti-join in [[candidatePairs]].
    */
  def hotKeys(blocks: DataFrame, cfg: Config): DataFrame =
    blocks.groupBy("bkey").count().filter(col("count") > cfg.maxBlockSize)

  /** Candidate pairs: self-equi-join of the block table on bkey with
    * doc_a < doc_b (each unordered pair exactly once), hot keys
    * removed via a broadcast anti-join. Returns
    * (doc_a, doc_b) distinct.
    */
  def candidatePairs(blocks: DataFrame, cfg: Config = Config()): DataFrame = {
    val hot = hotKeys(blocks, cfg).select("bkey")
    val cold = blocks.join(broadcast(hot), Seq("bkey"), "left_anti")
    val l = cold.select(col("bkey"), col("doc_id").as("doc_a"))
    val r = cold.select(col("bkey"), col("doc_id").as("doc_b"))
    l.join(r, Seq("bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }
}
