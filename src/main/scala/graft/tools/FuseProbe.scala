package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-probe: cost of one single vs fused large/small-star iteration
  * on a small edge frame (why did tail fusion cost ~10 s/iteration?).
  */
object FuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("fuse-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // the REAL operators (private[graft]) — a probe measuring a copy
    // would silently drift from what the loop actually runs
    import graft.cluster.ConnectedComponents.{largeStar, smallStar}

    // star-ish random graph, 4k edges
    val rnd = new scala.util.Random(42)
    val edges = (1 to 4200).map { i =>
      val a = rnd.nextInt(2000); val b = rnd.nextInt(2000)
      (f"$a%019d", f"$b%019d")
    }.toDF("src", "dst").localCheckpoint(true)

    for (round <- 1 to 3) {
      var t0 = System.nanoTime()
      val single = smallStar(largeStar(edges)).localCheckpoint(true)
      println(f"round $round single: ${(System.nanoTime() - t0) / 1e9}%.2f s (${single.count()} rows)")
      t0 = System.nanoTime()
      val fused = smallStar(largeStar(smallStar(largeStar(edges)))).localCheckpoint(true)
      println(f"round $round fused:  ${(System.nanoTime() - t0) / 1e9}%.2f s (${fused.count()} rows)")
    }
    spark.stop()
  }
}
