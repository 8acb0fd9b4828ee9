package graft.tools

import graft.jobs.ResolveJob
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: print the clusters that differ from the golden export's
  * 74-entity partition.
  */
object ClusterDiff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath)
    val r = ResolveJob.run(spark, docs.toDF())
    val ours = r.assignments
      .withColumn("rid", split(col("doc_id"), ":").getItem(1))
      .groupBy("entity_id").agg(collect_set(col("rid")).as("rids"))
      .collect().map(_.getSeq[String](1).toSet).toSet
    val golden = GoldenDiff.loadGolden().keySet
    (golden -- ours).toSeq.sortBy(_.min).foreach(c =>
      println(s"golden-only: ${c.toSeq.sorted.mkString(",")}"))
    (ours -- golden).toSeq.sortBy(_.min).foreach(c =>
      println(s"ours-only:   ${c.toSeq.sorted.mkString(",")}"))
    spark.stop()
  }
}
