package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All
  * integer/string arithmetic (no float-aggregation nondeterminism) so
  * results reproduce bit-exactly across engines.
  */
object TextAnalysis {

  /** Per-language marker words (tiny public stopword heads). */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "des", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "在", "了", "我"))

  /** Whitespace-token count as a single regex scan. Equivalent to
    * `size(filter(split(text, "\\s+"), _ =!= ""))` but codegen-friendly:
    * higher-order array functions (`ArrayFilter` etc.) are
    * CodegenFallback in Spark, and ONE of them in a projection ejects
    * the whole Project from whole-stage codegen (round-1 PlanSpec
    * failure). `regexp_count` compiles.
    */
  private def wsTokenCount(text: Column): Column =
    regexp_count(text, lit("[^\\s]+"))

  /** Count of whole whitespace-delimited tokens equal to one of
    * `words`: lookarounds pin both token edges, so `des` is not counted
    * as a hit for `de`. One codegen'd regex scan for the entire set.
    */
  private def tokenCountIn(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit(s"(?<![^\\s])(${words.mkString("|")})(?![^\\s])"))

  /** N-gram-heuristic language ID: argmax of marker-token hits, with a
    * deterministic tiebreak on language code; 'und' when no marker hits.
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val scores = Markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(tokenCountIn(col(textCol), words).as("hits"), lit(lang).as("lang"))
    }
    // max_by over (hits, reversed-lang) — ties break to the smaller code
    val best = scores.reduce { (x, y) =>
      when(y.getField("hits") > x.getField("hits"), y).otherwise(x)
    }
    docs.withColumn("lang_pred",
      when(best.getField("hits") > 0, best.getField("lang")).otherwise("und"))
  }

  /** Quality features: char/word counts, mean word length, punctuation
    * and digit ratios, stopword ratio, and a composed 0-100 score.
    * Ratios are divisions of exact ints — deterministic across engines.
    */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nWords = wsTokenCount(t)
    val nPunct = nChars - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val nDigit = nChars - length(regexp_replace(t, "[0-9]", ""))
    val stopHits = tokenCountIn(t, Markers.values.flatten.toSeq.distinct.sorted)
    docs.select(
      col("doc_id"),
      nChars.as("n_chars_q"),
      nWords.as("n_words"),
      (nChars.cast("double") / greatest(nWords, lit(1))).as("mean_word_len"),
      (nPunct.cast("double") / greatest(nChars, lit(1))).as("punct_ratio"),
      (nDigit.cast("double") / greatest(nChars, lit(1))).as("digit_ratio"),
      (stopHits.cast("double") / greatest(nWords, lit(1))).as("stopword_ratio"))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single non-space symbols).
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      wsTokenCount(col(textCol)).as("ws_tokens"),
      regexp_count(col(textCol),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).as("bpe_ish_tokens"))

  /** Content fingerprints: md5 of normalized text (engine-portable) and
    * a winnowing-style rolling min-hash (codegen'd kernel).
    */
  def fingerprint(docs: DataFrame, textCol: String = "text", window: Int = 16): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    docs.select(
      col("doc_id"),
      md5(norm).as("md5_fingerprint"),
      GraftFunctions.rolling_min_hash(norm, lit(window)).as("winnow_fingerprint"))
  }

  /** Oracle-checkable winnowing twin (same role as
    * Dedup.minhashNearDupPairsPortable for banding): the fingerprint is
    * the LEXICOGRAPHIC MIN of md5 over every `window`-char substring of
    * the normalized text — every step (normalize, slide, md5, min) is
    * ANSI-SQL-expressible, so an independent engine reproduces the
    * exact value (the fast kernel's Karp–Rabin rolling hash is not
    * portable and is verifiable only by golden values). Docs shorter
    * than the window have no fingerprint (NULL) in both engines. The
    * HOF transform here is CodegenFallback — acceptable for a
    * verification twin; the kernel variant stays the fast path.
    */
  def winnowVerify(docs: DataFrame, textCol: String = "text", window: Int = 16): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    // aggregate-fold keeps only the running min (O(1) per row) —
    // materializing all (len−15) md5 strings first would cost ~47×
    // the document length in one unsafe row. `least` ignores the
    // null seed.
    docs.select(
      col("doc_id"),
      when(length(norm) >= window,
        aggregate(
          sequence(lit(1), length(norm) - (window - 1)),
          lit(null).cast("string"),
          (acc, i) => least(acc, md5(norm.substr(i, lit(window))))))
        .as("winnow_md5"))
  }
}
