package graft.tools

import graft.blocking.Blocking
import graft.cluster.ConnectedComponents
import graft.normalize.Normalize
import graft.score.{Generic, Scoring}
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock per pipeline stage on the fixture corpus. */
object TimeStages {
  def main(args: Array[String]): Unit = {
    val t00 = System.nanoTime()
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def lap(name: String, t0: Long): Long = {
      val t = System.nanoTime()
      println(f"[time] $name%-22s ${(t - t0) / 1e9}%8.2f s")
      t
    }
    var t = lap("spark-start", t00)
    val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath).toDF()
    docs.count(); t = lap("read", t)
    val featsRaw = Normalize.features(docs).localCheckpoint(true)
    featsRaw.count(); t = lap("normalize", t)
    val feats = Generic.withGenericFlags(featsRaw).localCheckpoint(true)
    feats.count(); t = lap("generic-flags", t)
    val blocks = Blocking.blockingKeys(feats)
    blocks.count(); t = lap("blocking-keys", t)
    val pairs = Blocking.candidatePairs(blocks)
    pairs.count(); t = lap("candidate-pairs", t)
    val edges = Scoring.scorePairs(pairs, feats).localCheckpoint(true)
    edges.count(); t = lap("scoring", t)
    val (assign, stats) = ConnectedComponents.assign(
      spark, feats.select("doc_id"), edges.filter(col("level") === "RESOLVED"))
    assign.count(); t = lap(s"cc (${stats.iterations} iters)", t)
    val ents = graft.assemble.Assemble.entities(feats, assign, edges)
    ents.count(); t = lap("assemble", t)
    spark.stop()
  }
}
