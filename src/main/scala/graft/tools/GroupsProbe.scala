package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level decomposition of dd_dedup_groups / er_clusters: logs every
  * Spark job's wall time + description so the eager-materialization
  * chain can be read off directly.
  */
object GroupsProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "dd_dedup_groups"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("groups-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("-")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(j.jobId, (0L, "?"))
        println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2f s  $desc")
      }
    })
    (1 to 2).foreach { round =>
      println(s"--- $which round $round ---")
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(which)(spark, sf)
      val n = df.count()
      Thread.sleep(300) // let listener drain
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
    }
    spark.stop()
  }
}
