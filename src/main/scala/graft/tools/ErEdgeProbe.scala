package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: decompose er_match_edges — pair join alone, + name
  * attach, + levenshtein, + filter — to find the dominant term.
  */
object ErEdgeProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("er-edge-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(body: => T): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"ERPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val b = c.select(col("c_custkey").as("doc_id"),
      concat(lit("B:"), col("c_nationkey").cast("string"), lit(":"),
        col("c_mktsegment")).as("bkey"))
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val l = b.repartition(col("bkey")).select(col("bkey"), col("doc_id").as("doc_a"))
      val r = b.select(col("bkey"), col("doc_id").as("doc_b"))
      val pairs = l.join(broadcast(r), Seq("bkey")).filter(col("doc_a") < col("doc_b"))
      time("pairs.count")(pairs.count())
      val names = c.select(col("c_custkey"), col("c_name"))
      val withNames = pairs
        .join(broadcast(names.select(col("c_custkey").as("doc_a"), col("c_name").as("name_a"))), "doc_a")
        .join(broadcast(names.select(col("c_custkey").as("doc_b"), col("c_name").as("name_b"))), "doc_b")
      time("withNames.noop")(withNames.write.mode("overwrite").format("noop").save())
      val lev = withNames.select(col("doc_a"), col("doc_b"),
        levenshtein(col("name_a"), col("name_b")).as("lev"))
      time("lev.noop")(lev.write.mode("overwrite").format("noop").save())
      time("lev<=3.count")(println("rows=" + lev.filter(col("lev") <= 3).count()))
      val sub = withNames.select(col("doc_a"), col("doc_b"),
        levenshtein(substring(col("name_a"), -9, 9), substring(col("name_b"), -9, 9)).as("lev"))
      time("lev-suffix9.noop")(sub.write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
