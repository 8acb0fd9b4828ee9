package graft.tools

import graft.normalize.Normalize
import graft.score.{Generic, Scoring}
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession

/** Dev harness: dump feature rows + the scored edge for specific doc
  * pairs from the fixture corpus.
  */
object PairDebug {
  def main(args: Array[String]): Unit = {
    val ids = if (args.nonEmpty) args.toSeq else Seq("CUSTOMERS:2207", "CUSTOMERS:2213")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath)
    val feats = Generic.withGenericFlags(Normalize.features(docs.toDF()))
    feats.filter($"doc_id".isin(ids: _*)).show(truncate = false)
    val pairs = (for (a <- ids; b <- ids if a < b) yield (a, b)).toDF("doc_a", "doc_b")
    Scoring.scorePairs(pairs, feats).show(truncate = false)
    spark.stop()
  }
}
