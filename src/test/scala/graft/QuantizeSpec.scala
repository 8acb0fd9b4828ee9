package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r6 fast-path quantize (round-half-away + ulp-guarded
  * BigDecimal fallback) bit-identical to the pure BigDecimal HALF_UP
  * reference it replaced — the oracle-parity contract behind
  * ann_cosine_topk / dd_embed_near.
  */
class QuantizeSpec extends AnyFunSuite {

  private def reference(x: Double, scale: Int): Long =
    java.math.BigDecimal.valueOf(x * scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  private def check(x: Double, scale: Int = 1000): Unit =
    assert(graft.functions.VecSim.quantize(x, scale) == reference(x, scale),
      s"x=$x scale=$scale")

  test("exact .5 ties, both signs") {
    for (k <- -2000 to 2000) check((k + 0.5) / 1000.0)
  }

  test("ulp neighborhoods of half-integer boundaries") {
    for (k <- Seq(-1000000, -12345, -1, 0, 1, 999, 12345, 1000000); d <- -4 to 4) {
      val boundary = k + 0.5
      var y = boundary
      if (d < 0) (1 to -d).foreach(_ => y = Math.nextDown(y))
      if (d > 0) (1 to d).foreach(_ => y = Math.nextUp(y))
      check(y / 1000.0)
      // also exercise scale=1 so x*scale is the raw value
      assert(graft.functions.VecSim.quantize(y, 1) == reference(y, 1), s"y=$y")
    }
  }

  test("classic double-rounding trap values") {
    // 0.49999999999999994 + 0.5 == 1.0 in double arithmetic, but the
    // decimal value rounds to 0 — the fallback must catch it
    for (x <- Seq(0.49999999999999994, -0.49999999999999994,
        0.5 - Math.ulp(0.5), 1.5 - Math.ulp(1.5), 2.675, -2.675))
      assert(graft.functions.VecSim.quantize(x, 1) == reference(x, 1), s"x=$x")
  }

  test("deterministic random sweep matches reference") {
    val rnd = new scala.util.Random(42)
    (1 to 200000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(7) - 3)
      check(x)
    }
  }

  test("float-typed embedding values (the production input shape)") {
    val rnd = new scala.util.Random(7)
    (1 to 200000).foreach { _ =>
      check((rnd.nextFloat() - 0.5f).toDouble)
    }
  }
}
