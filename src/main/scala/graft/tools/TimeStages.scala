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
    val cores = sys.env.getOrElse("TS_CORES", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    def lap(name: String, t0: Long): Long = {
      val t = System.nanoTime()
      println(f"[time] $name%-22s ${(t - t0) / 1e9}%8.2f s")
      t
    }
    var t = lap("spark-start", t00)
    val docs = (if (args.nonEmpty)
      DocCorpus.synthetic(spark, args(0).toLong).toDF()
    else DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath).toDF())
      .localCheckpoint(true)
    println(s"[time] docs=${docs.count()}"); t = lap("read", t)
    val featsRaw = Normalize.features(docs).localCheckpoint(true)
    featsRaw.count(); t = lap("normalize", t)
    val feats = Generic.withGenericFlags(featsRaw).localCheckpoint(true)
    feats.count(); t = lap("generic-flags", t)
    val blocks = Blocking.blockingKeys(feats)
    blocks.count(); t = lap("blocking-keys", t)
    val pairs = Blocking.candidatePairs(blocks)
    println(s"[time] pairs=${pairs.count()}"); t = lap("candidate-pairs", t)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val edges = Scoring.scorePairs(pairs, feats, broadcastFeatures = true).localCheckpoint(true)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    edges.count(); t = lap("scoring", t)
    val (assign, stats) = ConnectedComponents.assign(
      spark, feats.select("doc_id"), edges.filter(col("level") === "RESOLVED"))
    assign.count(); t = lap(s"cc (${stats.iterations} iters)", t)
    val ents = graft.assemble.Assemble.entities(feats, docs, assign, edges)
    ents.count(); t = lap("assemble", t)
    spark.stop()
  }
}
