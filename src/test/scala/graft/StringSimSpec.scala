package graft

import graft.functions.StringSim
import org.scalatest.funsuite.AnyFunSuite

class StringSimSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1e-9): Boolean =
    math.abs(a - b) <= eps

  test("jaro-winkler golden values (published examples)") {
    assert(approx(StringSim.jaroWinkler("martha", "marhta"), 0.9611111111111111))
    assert(approx(StringSim.jaroWinkler("dixon", "dicksonx"), 0.8133333333333332))
    assert(approx(StringSim.jaroWinkler("duane", "dwayne"), 0.84))
    assert(StringSim.jaroWinkler("abc", "abc") == 1.0)
    assert(StringSim.jaroWinkler("abc", "xyz") == 0.0)
  }

  test("jaro-winkler properties: bounds, symmetry, identity (seeded sample)") {
    val rnd = new scala.util.Random(42)
    def word(): String =
      (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 500).foreach { _ =>
      val (a, b) = (word(), word())
      val s = StringSim.jaroWinkler(a, b)
      assert(s >= 0.0 && s <= 1.0, s"bounds violated for ($a,$b): $s")
      assert(approx(s, StringSim.jaroWinkler(b, a), 1e-12), s"asymmetric for ($a,$b)")
      if (a.nonEmpty) assert(StringSim.jaroWinkler(a, a) == 1.0)
    }
  }

  test("given-name initial rule") {
    assert(StringSim.givenSim("b", "bob") >= 0.92)
    assert(StringSim.givenSim("bob j", "b") >= 0.92)
    assert(StringSim.givenSim("jane", "j") >= 0.92)
    assert(StringSim.givenSim("mary", "mark") < 0.92) // distinct names
    assert(StringSim.givenSim("mark", "marsha") < 0.92)
    assert(StringSim.givenSim("darla", "darlene") < 0.92)
  }

  test("surname containment rule") {
    assert(StringSim.surnameSim("sentosa", "medina sentosa") >= 0.95)
    assert(StringSim.surnameSim("m sentosa", "medina sentosa") >= 0.95)
    assert(StringSim.surnameSim("sanchez", "sanchez mendoza") >= 0.95)
    assert(StringSim.surnameSim("moonie", "moony") >= 0.88)
    assert(StringSim.surnameSim("sanders", "anderson") < 0.88)
  }

  test("rolling min-hash: deterministic") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    assert(StringSim.rollingMinHash(u("the quick brown fox"), 8) ==
      StringSim.rollingMinHash(u("the quick brown fox"), 8))
    assert(StringSim.rollingMinHash(u(""), 8) == 0L)
  }

  test("minhash bands: equal strings share all bands; disjoint rarely any") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val x = StringSim.minHashBands(u("jonathan smithers"), 3, 4, 3).toLongArray()
    val y = StringSim.minHashBands(u("jonathan smithers"), 3, 4, 3).toLongArray()
    val z = StringSim.minHashBands(u("completely different"), 3, 4, 3).toLongArray()
    assert(x.sameElements(y))
    assert(x.intersect(z).length < x.length)
  }
}
