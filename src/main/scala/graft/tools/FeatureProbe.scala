package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-probe: span extraction cost — codegen'd span_first_text kernel
  * vs the Catalyst HOF formulation it replaced, over the exact set of
  * kinds Normalize.features extracts, plus the full features_raw stage.
  */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("feature-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.DocCorpus.synthetic(spark, n, seed = 5L).toDF()
      .localCheckpoint(true)
    println("docs=" + docs.count())

    def hof(spans: Column, kind: String): Column =
      get(filter(spans, s => s.getField("kind") === lit(kind)), lit(0)).getField("text")
    val kinds = Seq("data_source", "record_id", "record_type",
      "primary_name_first", "name_first", "primary_name_middle", "name_middle",
      "primary_name_last", "name_last", "primary_name_org", "secondary_name_org",
      "primary_name_full", "name_full", "native_name_full", "email_address",
      "phone_number", "gender", "date_of_birth", "ssn_number", "passport_number",
      "drivers_license_number", "national_id_number", "national_id_country",
      "addr_full", "addr_line1", "addr_city", "addr_state", "addr_postal_code")
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"FEATPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      time("kernel 28-kind extract")(docs.select(col("doc_id") +:
        kinds.map(k => graft.normalize.Normalize.spanText(col("spans"), k).as(k)): _*))
      time("HOF    28-kind extract")(docs.select(col("doc_id") +:
        kinds.map(k => hof(col("spans"), k).as(k)): _*))
      time("features_raw full")(graft.normalize.Normalize.features(docs))
      // family-level decomposition of the normalize projection
      val sp = col("spans")
      def st(k: String) = graft.normalize.Normalize.spanText(sp, k)
      time("  dob only")(docs.select(col("doc_id"),
        graft.normalize.Normalize.parseDob(st("date_of_birth")).as("dob")))
      time("  addr only")(docs.select(col("doc_id"),
        graft.normalize.Normalize.parseAddr(coalesce(
          st("addr_full"),
          concat_ws(" ", coalesce(st("addr_line1"), lit("")),
            coalesce(st("addr_city"), lit("")), coalesce(st("addr_state"), lit("")),
            coalesce(st("addr_postal_code"), lit(""))))).as("addr")))
      val full = graft.normalize.Normalize.features(docs)
      time("  names only")(full.select("doc_id", "given_raw", "given_can",
        "generation", "surname", "org_name"))
      time("  ids/email/phone only")(full.select("doc_id", "phone_digits",
        "phone7", "email", "ssn", "passport", "drlic", "national_id",
        "national_id_country", "gender", "record_type"))
    }
    spark.stop()
  }
}
