package graft.tools

import graft.jobs.ResolveJob
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession

/** Micro-probe: how many shuffle exchanges does the post-checkpoint
  * assembly DAG (the `entities` frame) execute, and what does the
  * noop-write of it cost? Used to validate that laying the assembly
  * checkpoints out hash(entity_id) removes the downstream exchanges
  * (every grouping/join key in the assembly is entity_id-prefixed).
  */
object AssembleExchanges {
  def main(args: Array[String]): Unit = {
    val nEntities = if (args.nonEmpty) args(0).toLong else 20000L
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("assemble-exchanges")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = ResolveJob.Config(
      blocking = graft.blocking.Blocking.Config(salts = 4),
      numberEntities = false,
      broadcastFeatures = Some(false))
    val docs = DocCorpus.synthetic(spark, nEntities).toDF()
    val result = ResolveJob.run(spark, docs, cfg)
    val t0 = System.nanoTime()
    result.entities.write.mode("overwrite").format("noop").save()
    val tWrite = (System.nanoTime() - t0) / 1e9
    // final (AQE-materialized) plan of the frame just executed
    val plan = result.entities.queryExecution.executedPlan.toString
    val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(plan).size
    println(f"ASSEMBLE_PROBE entities_write=$tWrite%.1f s exchanges=$exchanges")
    plan.linesIterator.filter(_.contains("Exchange")).foreach(l =>
      println("  " + l.trim.take(140)))
    spark.stop()
  }
}
