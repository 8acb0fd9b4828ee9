package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() resolves a synthetic corpus; every
  * queries entry runs against sf0.001; every oracleSql key has a
  * corresponding query.
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("entry: flagship resolve returns entities") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("ENTITY_ID"))
  }

  test("all queries run on sf0.001 and return rows (or a valid empty set)") {
    val empties = Set("q_setops", "dd_embed_near") // legitimately small/empty at tiny sf
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0)
      if (!empties.contains(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
