package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static JVM kernels over the canonical span array
  * (`array<struct<kind,text,media_ref,offset>>`) — called from the
  * codegen'd [[SpanFirstText]] expression.
  */
object SpanOps {

  /** Text of the FIRST span whose `kind` equals `kind`, or null when
    * no span matches (or the matching span's text is null) — exactly
    * `get(filter(spans, s -> s.kind = kind), 0).text` semantics
    * (null-kinded elements never match, like the HOF's null-filtered
    * predicate), without the interpreted lambda dispatch or the
    * filtered-array allocation per call.
    */
  def firstText(spans: ArrayData, kindOrd: Int, textOrd: Int,
      numFields: Int, kind: UTF8String): UTF8String = {
    val n = spans.numElements()
    var i = 0
    while (i < n) {
      if (!spans.isNullAt(i)) {
        val row = spans.getStruct(i, numFields)
        if (!row.isNullAt(kindOrd) && kind.equals(row.getUTF8String(kindOrd)))
          return if (row.isNullAt(textOrd)) null else row.getUTF8String(textOrd)
      }
      i += 1
    }
    null
  }

  /** DOB parse — the kernel behind Normalize.parseDob (r6). Exactly
    * the Catalyst formulation it replaced: four anchored regex
    * formats (M/d/y slash, ISO y-m-d, d-MMM-y, "MMM d,? y"), the
    * two-digit-year fix (≥100 keep; ≤25 +2000; else +1900), the
    * month-name map, the day-first swap when month > 12 and day ≤ 12,
    * and the final 1..12 / 1..31 validity gate — but each pattern is
    * matched at most ONCE per row where regexp_extract ran one match
    * per GROUP (13 regex executions per row, all interpreted because
    * the surrounding struct/when tree is a CodegenFallback island).
    * Returns null (no struct) exactly where the Catalyst version did.
    */
  private val SlashRe = java.util.regex.Pattern.compile("^(\\d{1,2})/(\\d{1,2})/(\\d{2,4})$")
  private val IsoRe = java.util.regex.Pattern.compile("^(\\d{4})-(\\d{1,2})-(\\d{1,2})$")
  private val DmyRe = java.util.regex.Pattern.compile("^(\\d{1,2})-([A-Za-z]{3})-(\\d{2,4})$")
  private val MdyRe = java.util.regex.Pattern.compile("^([A-Za-z]{3})[a-z]* (\\d{1,2}),? (\\d{2,4})$")
  private val Months = {
    val m = new java.util.HashMap[String, Integer]()
    Seq("jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
      "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)
      .foreach { case (k, v) => m.put(k, v) }
    m
  }

  def parseDob(raw: UTF8String): InternalRow = {
    // caller applies Catalyst trim() first — the kernel matches the
    // already-trimmed string so trim semantics stay Spark's own
    if (raw == null) return null
    val s = raw.toString
    var y0: Integer = null; var m0: Integer = null; var d0: Integer = null
    def fixYear(y: Int): Int = if (y >= 100) y else if (y <= 25) y + 2000 else y + 1900
    val slash = SlashRe.matcher(s)
    val iso = IsoRe.matcher(s)
    val dmy = DmyRe.matcher(s)
    val mdy = MdyRe.matcher(s)
    if (slash.matches()) {
      y0 = fixYear(slash.group(3).toInt)
      m0 = slash.group(1).toInt
      d0 = slash.group(2).toInt
    } else if (iso.matches()) {
      y0 = iso.group(1).toInt; m0 = iso.group(2).toInt; d0 = iso.group(3).toInt
    } else if (dmy.matches()) {
      y0 = fixYear(dmy.group(3).toInt)
      m0 = Months.get(dmy.group(2).toLowerCase(java.util.Locale.ROOT))
      d0 = dmy.group(1).toInt
    } else if (mdy.matches()) {
      y0 = fixYear(mdy.group(3).toInt)
      m0 = Months.get(mdy.group(1).toLowerCase(java.util.Locale.ROOT))
      d0 = mdy.group(2).toInt
    }
    // day-first form: 20/8/1991 → month 20 invalid → swap m/d.
    // Catalyst semantics: needSwap = (m0 > 12 && d0 <= 12) — three-
    // valued, so a null month never swaps
    if (m0 != null && d0 != null && m0 > 12 && d0 <= 12) {
      val t = m0; m0 = d0; d0 = t
    }
    if (y0 == null || m0 == null || d0 == null ||
      m0 < 1 || m0 > 12 || d0 < 1 || d0 > 31) null
    else InternalRow(y0.intValue(), m0.intValue(), d0.intValue())
  }

  /** Tokenwise dictionary canonicalization — the kernel behind
    * Normalize's nickname mapping (r6). Exactly
    * `array_join(transform(split(c, " "), t => coalesce(element_at(m,
    * t), t)), " ")`: split on single spaces KEEPING empty segments
    * (split with limit -1), map each through the dict (missing → pass
    * through), join with single spaces. The Catalyst version paid an
    * interpreted lambda plus a linear scan of the 120-entry map
    * literal per token.
    */
  def canonTokens(raw: UTF8String, dict: java.util.HashMap[String, String]): UTF8String = {
    if (raw == null) return null
    val s = raw.toString
    val sb = new java.lang.StringBuilder(s.length)
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        val mapped = dict.get(tok)
        sb.append(if (mapped == null) tok else mapped)
        if (i < n) sb.append(' ')
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** One-pass address parse — the kernel behind Normalize.parseAddr
    * (r6). Bit-identical to the Catalyst formulation it replaced
    * (NormalizeKernelSpec pins it):
    *
    *   s = trim(regexp_replace(regexp_replace(lower(raw),
    *         "[^a-z0-9 ]", " "), " +", " "))
    *   toks      = non-empty " "-split tokens of s
    *   digitToks = toks matching ^[0-9]+$           (dups kept)
    *   house     = digitToks[0]
    *   zip       = first 5 chars of digitToks.last when
    *               |digitToks| >= 2 and len(last) >= 5
    *   stokens   = distinct toks matching ^[a-z][a-z0-9]*$ minus stop
    *   street    = stokens[0]
    *   digits    = distinct digitToks
    *   null when raw is null or toks is empty
    *
    * Equivalence notes: lowercase goes through UTF8String.toLowerCase
    * (exactly Spark's `lower`); the char-class replace works per
    * UTF-16 unit where the regex works per code point, but a
    * supplementary character maps to space(s) either way and
    * consecutive spaces merge into one token boundary, so the token
    * stream is identical; after the replace every token is pure ASCII
    * [a-z0-9]+, so the digit/alpha tests are plain char checks. The
    * Catalyst version evaluated three interpreted HOF filters with
    * per-token rlike over a duplicated token subtree — measured as
    * ~80% of the features_raw stage.
    */
  def parseAddr(raw: UTF8String, stop: java.util.HashSet[String]): InternalRow = {
    if (raw == null) return null
    val s = raw.toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { toks.add(sb.toString); sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) toks.add(sb.toString)
    if (toks.isEmpty) return null

    val digitToks = new java.util.ArrayList[String]()
    val digitsDistinct = new java.util.LinkedHashSet[String]()
    val stokens = new java.util.LinkedHashSet[String]()
    var t = 0
    while (t < toks.size) {
      val tok = toks.get(t)
      var allDigit = true
      var j = 0
      while (allDigit && j < tok.length) {
        if (tok.charAt(j) > '9') allDigit = false
        j += 1
      }
      if (allDigit) { digitToks.add(tok); digitsDistinct.add(tok) }
      else if (tok.charAt(0) >= 'a' && !stop.contains(tok)) stokens.add(tok)
      t += 1
    }
    def u(x: String): UTF8String = if (x == null) null else UTF8String.fromString(x)
    val house = if (digitToks.isEmpty) null else digitToks.get(0)
    val last = if (digitToks.isEmpty) null else digitToks.get(digitToks.size - 1)
    val zip =
      if (digitToks.size >= 2 && last.length >= 5) last.substring(0, 5) else null
    val stokArr = new Array[AnyRef](stokens.size)
    var k = 0
    val it = stokens.iterator()
    while (it.hasNext) { stokArr(k) = u(it.next()); k += 1 }
    val digArr = new Array[AnyRef](digitsDistinct.size)
    k = 0
    val dit = digitsDistinct.iterator()
    while (dit.hasNext) { digArr(k) = u(dit.next()); k += 1 }
    val street = if (stokArr.isEmpty) null else stokArr(0)
    InternalRow(u(house), u(zip), street,
      new GenericArrayData(stokArr), new GenericArrayData(digArr))
  }
}
