package graft.tools

import graft.jobs.ResolveJob
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Per-operator SQL metrics for the final assembly query — which
  * aggregation/join actually burns the entities_write seconds.
  */
object AssembleMetrics {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(4)
    val n = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = ResolveJob.Config(
      blocking = graft.blocking.Blocking.Config(salts = math.max(4, cores)),
      numberEntities = false,
      broadcastFeatures = Some(false))
    val r = ResolveJob.run(spark, DocCorpus.synthetic(spark, n).toDF(), cfg)
    val qe = r.entities.queryExecution
    val t0 = System.nanoTime()
    // drive the SAME QueryExecution whose metrics we walk (a write
    // action would plan its own copy and leave these metrics empty)
    spark.sparkContext.runJob(qe.executedPlan.execute(),
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      })
    println(f"entities compute wall ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        (k.toLowerCase.contains("time")) && m.value > 300 }
        .map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
      val rows = p.metrics.get("numOutputRows").map(m => s"rows=${m.value}").getOrElse("")
      println("  " * depth + p.nodeName + " " + rows + " " + interesting)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case rr: org.apache.spark.sql.execution.ReusedSubqueryExec =>
          walk(rr.child, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach(walk(_, depth + 1))
    }
    walk(qe.executedPlan, 0)
    spark.stop()
  }
}
