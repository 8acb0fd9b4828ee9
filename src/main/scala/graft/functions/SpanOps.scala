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
