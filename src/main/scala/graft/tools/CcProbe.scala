package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot probe: CC iteration counts and stage walls for the two
  * closure-heavy bench queries (`dd_dedup_groups`, `er_clusters`) at a
  * given sf dir — names where the driver-serial iteration latency goes.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("cc-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    var t0 = System.nanoTime()
    val (groups, stats) =
      graft.ops.Dedup.nearDupGroupsWithStats(spark, docs, n = 1, threshold = 0.5)
    val n = groups.count()
    println(f"dd_dedup_groups: ${(System.nanoTime() - t0) / 1e9}%.1f s, rows=$n, " +
      s"ccIters=${stats.iterations}, edges=${stats.perIterationEdges}")

    t0 = System.nanoTime()
    val pairsOnly = graft.ops.Dedup.ngramJaccard(docs, n = 1, threshold = 0.5).count()
    println(f"  ngram pairs alone: ${(System.nanoTime() - t0) / 1e9}%.1f s ($pairsOnly pairs)")

    spark.stop()
  }
}
