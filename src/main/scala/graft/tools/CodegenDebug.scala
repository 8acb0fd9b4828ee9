package graft.tools

import graft.blocking.Blocking
import graft.normalize.Normalize
import graft.score.{Generic, Scoring}
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Dump whole-stage codegen sizes for the scoring plan. */
object CodegenDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    val docs = DocCorpus.synthetic(spark, 500).toDF().localCheckpoint(true)
    val feats = Generic.withGenericFlags(Normalize.features(docs)).localCheckpoint(true)
    val pairs = Blocking.candidatePairs(Blocking.blockingKeys(feats)).localCheckpoint(true)
    val edges = Scoring.scorePairs(pairs, feats)
    edges.count()
    val code = org.apache.spark.sql.execution.debug.codegenStringSeq(
      edges.queryExecution.executedPlan)
    code.zipWithIndex.foreach { case ((subtree, body, _), i) =>
      println(s"=== subtree $i: ${body.length} chars, ${body.count(_ == '\n')} lines ===")
      println(subtree.split("\n").take(10).mkString("\n"))
      if (body.length > 60000)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/big_stage_$i.java"), body)
    }
    spark.stop()
  }
}
