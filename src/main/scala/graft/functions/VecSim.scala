package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Static JVM kernels for embedding-vector similarity — called from
  * the codegen'd Catalyst expressions in expressions.scala.
  *
  * Round-1/2 lesson: Catalyst higher-order functions (`aggregate`,
  * `zip_with`, `transform`) are CodegenFallback — a multi-table LSH
  * bucketing built from them costs microseconds of interpreted lambda
  * dispatch PER ELEMENT (sf0.1 bench: 39 s for 4k vectors). These
  * kernels do the same arithmetic in tight primitive loops.
  */
object VecSim {

  @inline private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** splitmix64-derived hyperplane weight in [-1, 1] for
    * (table, plane, dim) — deterministic, plan-time-free.
    */
  @inline private def weight(t: Int, p: Int, i: Int): Double = {
    var z = (t.toLong * 1009L + p) * -7046029254386353131L +
      i.toLong * -4658895280553007687L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z = z ^ (z >>> 31)
    ((z & Long.MaxValue) % 1000L).toDouble / 500.0 - 1.0
  }

  /** Sign-buckets of `v` against `planes` random hyperplanes for each
    * of `tables` independent tables, in ONE pass over the vector per
    * (table, plane). Returns array<long> of length `tables`.
    */
  def hyperplaneBuckets(v: ArrayData, isFloat: Boolean, tables: Int, planes: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var s = 0.0
        var i = 0
        while (i < n) { s += elem(v, i, isFloat) * weight(t, p, i); i += 1 }
        if (s >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Spark-`round`-exact quantization: BigDecimal.valueOf semantics,
    * HALF_UP — bit-identical to `round(x * scale).cast("long")` and to
    * DuckDB's `CAST(round(x * scale) AS BIGINT)` (the oracle-parity
    * contract behind ann_cosine_topk / dd_embed_near).
    *
    * r6: `BigDecimal.valueOf(double)` stringifies the double
    * (`Double.toString` + decimal parse) on EVERY call — measured as
    * ~95% of dd_embed_near's verify stage (two calls per vector
    * element; 7.3 s for 225k 64-dim pairs). The fast path is plain
    * round-half-away-from-zero arithmetic, valid whenever y sits more
    * than 2 ulp from a half-integer boundary: the shortest-decimal
    * value BigDecimal.valueOf parses differs from y by < ulp/2, so
    * both roundings provably agree there. Boundary cases (exact .5
    * ties included) fall back to the original BigDecimal path —
    * bit-identical by construction ([[QuantizeSpec]] sweeps the
    * boundaries).
    */
  @inline private[graft] def quantize(x: Double, scale: Int): Long = {
    val y = x * scale
    val r = if (y >= 0) Math.floor(y + 0.5) else Math.ceil(y - 0.5)
    val u = 2 * Math.ulp(y)
    if (y - (r - 0.5) > u && (r + 0.5) - y > u) r.toLong
    else java.math.BigDecimal.valueOf(y)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  /** Integer-quantized cosine (engine-portable; see [[quantize]]). */
  def cosineQuantized(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean, scale: Int): Double = {
    val n = a.numElements()
    var ab = 0L; var aa = 0L; var bb = 0L
    var i = 0
    while (i < n) {
      val qa = quantize(elem(a, i, aFloat), scale)
      val qb = quantize(elem(b, i, bFloat), scale)
      ab += qa * qb; aa += qa * qa; bb += qb * qb
      i += 1
    }
    ab.toDouble / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble))
  }

  /** Plain double cosine; sequential left-to-right accumulation (the
    * same order as the Catalyst `aggregate` fold it replaces, so
    * results are bit-identical and parallelism-invariant).
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xa = elem(a, i, aFloat); val xb = elem(b, i, bFloat)
      ab += xa * xb; aa += xa * xa; bb += xb * xb
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
}
