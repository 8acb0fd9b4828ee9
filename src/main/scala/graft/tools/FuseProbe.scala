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

    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.select(col("src").as("u"), col("dst").as("v"))
        .unionAll(e.select(col("dst").as("u"), col("src").as("v")))
      val mins = bidir.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      bidir.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val directed = e.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      val mins = directed.groupBy("u").agg(min(col("v")).as("m"))
      val moved = directed.join(mins, "u")
        .select(col("v").as("src"), col("m").as("dst"))
      val self = mins.select(col("u").as("src"), col("m").as("dst"))
      moved.unionAll(self)
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

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
