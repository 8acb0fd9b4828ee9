package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: does `local-cluster[N,1,mem]` (real separate executor JVM
  * processes, netty shuffle, driver apart) work in this environment?
  * It is the faithful single-box stand-in for "N executors": a
  * single-JVM local[N] shares one allocation path / eden across all N
  * task threads (measured ~30% per-core work inflation at N=4 on the
  * resolve pipeline), which no real multi-executor cluster has.
  *
  * Usage: LocalClusterProbe [workers] [memMB]
  */
object LocalClusterProbe {
  def main(args: Array[String]): Unit = {
    val workers = args.headOption.map(_.toInt).getOrElse(2)
    val mem = args.lift(1).map(_.toInt).getOrElse(2048)
    val spark = SparkSession.builder()
      .master(s"local-cluster[$workers,1,$mem]")
      .appName("lc-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = spark.range(1000000).selectExpr("id % 97 as k", "id")
      .groupBy("k").count().count()
    val execs = spark.sparkContext.statusTracker.getExecutorInfos.length
    println(s"LCPROBE groups=$n executors=$execs (driver counts as 1)")
    spark.stop()
  }
}
