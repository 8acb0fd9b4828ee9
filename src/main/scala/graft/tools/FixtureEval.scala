package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper
import graft.jobs.ResolveJob
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Dev harness: resolve the reference fixture corpus and report
  * pairwise precision/recall/F1 against the golden clustering
  * (/root/reference/test/fixtures/flow-output.jsonl), listing every
  * false-positive / false-negative pair with its score for tuning.
  */
object FixtureEval {

  val CustomersPath = "/root/reference/test/fixtures/customers.jsonl"
  val GoldenPath = "/root/reference/test/fixtures/flow-output.jsonl"

  def goldenClusters(path: String = GoldenPath): Seq[Seq[String]] = {
    val mapper = new ObjectMapper()
    scala.io.Source.fromFile(path, "UTF-8").getLines().filter(_.trim.nonEmpty).map { line =>
      val n = mapper.readTree(line)
      n.get("RESOLVED_ENTITY").get("RECORDS").elements().asScala
        .map(r => r.get("DATA_SOURCE").asText() + ":" + r.get("RECORD_ID").asText())
        .toSeq
    }.toSeq
  }

  def pairsOf(clusters: Seq[Seq[String]]): Set[(String, String)] =
    clusters.flatMap { c =>
      for (a <- c; b <- c if a < b) yield (a, b)
    }.toSet

  final case class Metrics(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    def f1: Double =
      if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
  }

  def evaluate(
      predicted: Map[String, String],
      golden: Seq[Seq[String]]): (Metrics, Set[(String, String)], Set[(String, String)]) = {
    val goldPairs = pairsOf(golden)
    val predClusters = predicted.groupBy(_._2).values.map(_.keys.toSeq).toSeq
    val predPairs = pairsOf(predClusters)
    val tp = (goldPairs & predPairs).size
    val fpPairs = predPairs -- goldPairs
    val fnPairs = goldPairs -- predPairs
    (Metrics(tp, fpPairs.size, fnPairs.size), fpPairs, fnPairs)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("fixture-eval")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = DocCorpus.fromFlatJsonl(spark, CustomersPath)
    val result = ResolveJob.run(spark, docs.toDF())
    val assign = result.assignments.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

    val golden = goldenClusters()
    val (m, fp, fn) = evaluate(assign, golden)
    println(s"predicted clusters: ${assign.values.toSet.size} (golden ${golden.size})")
    println(f"precision=${m.precision}%.4f recall=${m.recall}%.4f f1=${m.f1}%.4f  tp=${m.tp} fp=${m.fp} fn=${m.fn}")
    println(s"metrics: ${result.metrics}")

    if (fp.nonEmpty || fn.nonEmpty) {
      val edges = result.edges.collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getString(3), r.getString(4)))
        .toMap
      fp.toSeq.sorted.foreach { p =>
        println(s"FP $p edge=${edges.get(p)}")
      }
      fn.toSeq.sorted.foreach { p =>
        println(s"FN $p edge=${edges.get(p)}")
      }
    }
    spark.stop()
  }
}
