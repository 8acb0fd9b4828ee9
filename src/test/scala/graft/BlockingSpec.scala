package graft

import graft.blocking.Blocking
import org.scalatest.funsuite.AnyFunSuite

/** Hot-key tier semantics: hot blocks keep ALL pairs via the salted
  * join (round 1 dropped them — a recall hole when a pair's only
  * shared key is hot); mega blocks are down-sampled deterministically
  * and bounded, never silently exploding.
  */
class BlockingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("hot keys keep ALL pairs (salted self-join, no drop)") {
    val cfg = Blocking.Config(maxBlockSize = 8, megaCap = 1024, salts = 4)
    val blocks = ((1 to 50).map(i => (f"H$i%03d", "hot")) ++
      Seq(("C1", "cold"), ("C2", "cold"), ("C3", "cold")))
      .toDF("doc_id", "bkey")
    val pairs = Blocking.candidatePairs(blocks, cfg)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.length == 50 * 49 / 2 + 3)
    // a pair whose ONLY shared key is hot must still be found
    assert(pairs.contains(("H001", "H050")))
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("mega keys are down-sampled deterministically and bounded") {
    val cfg = Blocking.Config(maxBlockSize = 8, megaCap = 32, salts = 4)
    val blocks = (1 to 500).map(i => (f"M$i%04d", "mega")).toDF("doc_id", "bkey")
    val n = Blocking.candidatePairs(blocks, cfg).count()
    // keep_mod = ceil(500/32) = 16 → ~31 retained docs; loose upper
    // bound allows hash-mod variance but proves the quadratic is capped
    assert(n > 0 && n <= 64L * 63 / 2, s"pairs=$n")
    assert(n == Blocking.candidatePairs(blocks, cfg).count()) // stable
  }

  test("cappedBlocks keeps every member of hot-but-not-mega keys") {
    val cfg = Blocking.Config(maxBlockSize = 8, megaCap = 1024)
    val blocks = (1 to 50).map(i => (s"D$i", "hot")).toDF("doc_id", "bkey")
    assert(Blocking.cappedBlocks(blocks, cfg).count() == 50)
  }
}
