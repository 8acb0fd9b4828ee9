package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: cost of one large/small-star double-step on a DENSE
  * clique-heavy edge frame (the dd_dedup_groups rep-graph shape:
  * ~350k edges over ~1.4k nodes) at several shuffle widths — is the
  * observed ~4.7 s/iteration width-bound, join-strategy-bound, or
  * inherent?
  */
object StarWidthProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("star-width-probe")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.cluster.ConnectedComponents.{largeStar, smallStar}

    // 45 cliques of 120 nodes (~321k edges) + 4k random edges
    val rnd = new scala.util.Random(7)
    val cliques = for {
      c <- 0 until 45; i <- 0 until 120; j <- (i + 1) until 120
    } yield (f"${c * 1000 + i}%019d", f"${c * 1000 + j}%019d")
    val noise = (1 to 4000).map { _ =>
      (f"${rnd.nextInt(60000)}%019d", f"${rnd.nextInt(60000)}%019d")
    }
    val edges = (cliques ++ noise).toDF("src", "dst")
      .repartition(32).localCheckpoint(true)
    println("edges=" + edges.count())

    for (w <- Seq("8", "16"); smj <- Seq("true", "false"); round <- 1 to 2) {
      graft.util.Confs.withConfs(spark)("spark.sql.shuffle.partitions" -> w,
        "spark.sql.join.preferSortMergeJoin" -> smj,
        "spark.sql.shuffledHashJoinFactor" -> "3") {
        print(s"smj=$smj ")
        val t0 = System.nanoTime()
        val it1 = smallStar(largeStar(edges)).localCheckpoint(true)
        val t1 = System.nanoTime()
        val it2 = smallStar(largeStar(it1)).localCheckpoint(true)
        val t2 = System.nanoTime()
        println(f"w=$w%3s round $round iter1 ${(t1 - t0) / 1e9}%6.2f s (${it1.count()} rows)  " +
          f"iter2 ${(t2 - t1) / 1e9}%6.2f s (${it2.count()} rows)")
        it1.unpersist(); it2.unpersist()
      }
    }
    spark.stop()
  }
}
