package graft.tools

import graft.blocking.Blocking
import graft.normalize.Normalize
import graft.score.Generic
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: pair volume contributed per blocking-key family. */
object BlockStats {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 30000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = DocCorpus.synthetic(spark, n).toDF().localCheckpoint(true)
    val feats = Generic.withGenericFlags(Normalize.features(docs)).localCheckpoint(true)
    val blocks = Blocking.blockingKeys(feats)
    blocks.groupBy(substring(col("bkey"), 1, 2).as("family"), col("bkey"))
      .count()
      .groupBy("family")
      .agg(count(lit(1)).as("n_keys"),
        max("count").as("max_block"),
        sum(col("count") * (col("count") - 1) / 2).as("pairs"))
      .orderBy(col("pairs").desc)
      .show(20, truncate = false)
    spark.stop()
  }
}
