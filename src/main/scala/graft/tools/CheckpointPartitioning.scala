package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does localCheckpoint preserve hash partitioning through to a
  * downstream groupBy (i.e. does EnsureRequirements skip the exchange),
  * and does AQE change the answer?
  */
object CheckpointPartitioning {
  def main(args: Array[String]): Unit = {
    for (aqe <- Seq(true, false)) {
      val spark = SparkSession.builder()
        .master("local[4]")
        .appName(s"ckpt-part-$aqe")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      // checkpoint materialized with AQE scoped OFF (the capture of
      // outputPartitioning into LogicalRDD reads the physical plan's
      // partitioning, which AdaptiveSparkPlanExec reports as Unknown);
      // downstream query runs under the session's AQE setting
      val df = graft.util.Confs.withConfs(spark)(
        "spark.sql.adaptive.enabled" -> "false") {
        (1 to 100000).map(i => (i % 997, i)).toDF("k", "v")
          .repartition(16, col("k"))
          .localCheckpoint(true)
      }
      val agg = df.groupBy("k", "v").agg(count(lit(1)))
      agg.write.mode("overwrite").format("noop").save()
      val plan = agg.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(plan).size
      println(s"CKPT aqe=$aqe downstream_exchanges=$n")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
