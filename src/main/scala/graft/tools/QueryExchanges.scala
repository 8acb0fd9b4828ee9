package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe: shuffle-exchange census per heavy driver query — spots
  * duplicated subtrees (same exchange repeated) and entity/doc-keyed
  * re-shuffles that a layout could absorb, like the assembly fix.
  */
object QueryExchanges {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("query-exchanges")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val heavy = Seq("dd_dedup_groups", "dd_embed_near", "er_clusters",
      "er_match_edges", "dd_ngram_jaccard", "er_entity_assembly")
    heavy.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.write.mode("overwrite").format("noop").save()
      val plan = df.queryExecution.executedPlan.toString
      val ex = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
        .findAllIn(plan).size
      val keys = "Exchange hashpartitioning\\(([a-z_0-9]+)#".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
        .groupBy(identity).map { case (k, v) => s"$k×${v.size}" }.mkString(", ")
      println(s"QX $name exchanges=$ex [$keys]")
    }
    spark.stop()
  }
}
