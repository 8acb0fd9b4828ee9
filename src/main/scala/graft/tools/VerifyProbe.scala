package graft.tools

import graft.assemble.Assemble
import graft.jobs.ResolveJob
import graft.sources.DocCorpus
import org.apache.spark.sql.SparkSession

/** Probe harness for runtime verification beyond the happy path:
  *  1. full JSONL export shape + span-sequence invariant,
  *  2. malformed input → quarantine (not a crash),
  *  3. determinism across parallelism levels (local[2] vs local[8]).
  */
object VerifyProbe {
  private def session(cores: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .config("spark.sql.shuffle.partitions", cores.toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    // --- probe 3 prep: run at two parallelism levels, compare ---
    var assignA: Map[String, String] = Map.empty
    var assignB: Map[String, String] = Map.empty

    {
      val spark = session(8)
      spark.sparkContext.setLogLevel("ERROR")
      val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath)
      val res = ResolveJob.run(spark, docs.toDF())

      // probe 1: export JSONL
      val json = Assemble.toExportJson(res.entities).collect().map(_.getString(0))
      println(s"[probe1] export lines=${json.length}")
      println(s"[probe1] first line: ${json.head.take(400)}")
      val withSpans = json.count(_.contains("\"SPANS\":[{"))
      println(s"[probe1] lines with spans=$withSpans")

      // probe 2: malformed input (missing RECORD_ID / non-JSON)
      val tmp = java.nio.file.Files.createTempFile("bad", ".jsonl")
      java.nio.file.Files.writeString(tmp,
        """{"DATA_SOURCE":"X","RECORD_ID":"1","PRIMARY_NAME_LAST":"Ok"}
          |{"DATA_SOURCE":"X","PRIMARY_NAME_LAST":"NoRecordId"}
          |not json at all
          |""".stripMargin)
      val good = DocCorpus.fromFlatJsonl(spark, tmp.toString, addMedia = false)
      val bad = DocCorpus.quarantineFromFlatJsonl(spark, tmp.toString)
      println(s"[probe2] good=${good.count()} quarantined=${bad.count()}")

      assignA = res.assignments.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      spark.stop()
    }
    {
      val spark = session(2)
      spark.sparkContext.setLogLevel("ERROR")
      val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath)
      val res = ResolveJob.run(spark, docs.toDF())
      assignB = res.assignments.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      spark.stop()
    }
    println(s"[probe3] assignments identical across local[8]/local[2]: ${assignA == assignB} (n=${assignA.size})")
  }
}
