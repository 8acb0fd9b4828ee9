package graft.tools

import graft.jobs.ResolveJob
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: for given record ids, print every scored edge incident
  * to the doc within its final cluster (earlier vs later, all levels) —
  * the raw material of the per-record MATCH_KEY ingest-order emulation.
  */
object KeyDebug {
  def main(args: Array[String]): Unit = {
    val rids = if (args.nonEmpty) args.toSeq
      else Seq("1004", "1086", "1092", "1082", "1055", "1056", "1046", "1094")
    val ids = rids.map("CUSTOMERS:" + _)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath)
    val r = ResolveJob.run(spark, docs.toDF())
    val assign = r.assignments.select(col("doc_id"), col("entity_id"))
    val e = r.edges
      .join(assign.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("entity_id", "ent_a"), "doc_a")
      .join(assign.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("entity_id", "ent_b"), "doc_b")
    ids.foreach { id =>
      println(s"=== $id ===")
      e.filter((col("doc_a") === id || col("doc_b") === id) &&
          col("ent_a") === col("ent_b"))
        .select(col("doc_a"), col("doc_b"), col("level"), col("match_key"),
          col("score"), col("xk_name_lvl"), col("xk_name_pname"), col("xk_name_add"))
        .orderBy("doc_a", "doc_b")
        .show(50, truncate = false)
    }
    spark.stop()
  }
}
