package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence artifacts (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [query...]
  * (no query args = all declared queries).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("plan-dump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        // executed plan AFTER running (AQE final plan where applicable)
        df.write.mode("overwrite").format("noop").save()
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val executed = df.queryExecution.executedPlan.toString
        val ex = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
          .findAllIn(executed).size
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
          s"== $name @ $sfDir (exchanges in executed plan: $ex) ==\n\n" +
            formatted + "\n\n== executed plan (AQE-final where applicable) ==\n\n" +
            executed + "\n")
        println(s"PLAN $name exchanges=$ex -> $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
