package graft

import graft.io.SnapshotStore
import graft.jobs.ResolveJob
import graft.model.Doc
import graft.sources.DocCorpus
import graft.streaming.IncrementalResolve
import graft.tools.FixtureEval
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/incremental semantics: the same corpus delivered in
  * batches (any split) must resolve to the same clusters as one batch
  * run — the reference's queue is only a delivery mechanism
  * (SURVEY.md §2.1 S1).
  */
class IncrementalResolveSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def assignMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("doc_id", "entity_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("two incremental batches == one batch resolve (order-insensitive)") {
    val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath).collect().toSeq
    val (b1, b2) = docs.splitAt(70)
    val tmp = java.nio.file.Files.createTempDirectory("incstore").toString
    val store = new SnapshotStore(tmp)

    val r1 = IncrementalResolve.processBatch(spark, store, b1.toDF())
    assert(r1.newDocs == 70)
    val r2 = IncrementalResolve.processBatch(spark, store, b2.toDF())
    assert(r2.newDocs == 50)

    val batchRun = ResolveJob.run(spark,
      DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath).toDF())
    assert(assignMap(r2.assignments) == assignMap(batchRun.assignments))
  }

  test("redelivered (duplicate) docs are idempotent") {
    val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath).collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("incstore2").toString
    val store = new SnapshotStore(tmp)
    val r1 = IncrementalResolve.processBatch(spark, store, docs.toDF())
    // redeliver an overlapping slice (at-least-once)
    val r2 = IncrementalResolve.processBatch(spark, store, docs.take(30).toDF())
    assert(r2.newDocs == 0)
    assert(r2.affectedEntities.count() == 0)
    assert(assignMap(r2.assignments) == assignMap(r1.assignments))
  }

  test("structured streaming end-to-end via MemoryStream + foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath).collect().toSeq
    val stream = MemoryStream[Doc]
    val tmp = java.nio.file.Files.createTempDirectory("incstore3").toString
    val q = IncrementalResolve.run(spark, stream.toDF(), tmp)
    try {
      stream.addData(docs.take(60))
      q.processAllAvailable()
      stream.addData(docs.drop(60))
      q.processAllAvailable()
    } finally q.stop()
    val store = new SnapshotStore(tmp)
    val finalAssign = store.read(spark, "assignments")
    val batchRun = ResolveJob.run(spark,
      DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath).toDF())
    assert(assignMap(finalAssign) == assignMap(batchRun.assignments))
  }
}
