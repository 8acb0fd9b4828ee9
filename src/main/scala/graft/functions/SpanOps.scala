package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
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
}
