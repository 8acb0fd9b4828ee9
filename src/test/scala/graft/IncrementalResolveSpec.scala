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
    assert(r2.featurizedDocs == 0, "identical redelivery must not re-normalize")
    assert(r2.ccVertices == 0, "identical redelivery must not re-cluster anything")
    assert(r2.affectedEntities.count() == 0)
    assert(assignMap(r2.assignments) == assignMap(r1.assignments))
  }

  test("batch cost is delta-proportional: +1 unrelated doc → 1 featurized doc, 1 CC vertex") {
    import graft.model.Span
    val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath).collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("incstore5").toString
    val store = new SnapshotStore(tmp)
    val r1 = IncrementalResolve.processBatch(spark, store, docs.toDF())
    assert(r1.featurizedDocs == 120 && r1.ccVertices == 120)
    val extra = Doc("TEST:1", Seq(
      Span("data_source", "TEST", null, 0), Span("record_id", "1", null, 1),
      Span("name_first", "ERNEST", null, 2), Span("name_last", "HEMINGWAY", null, 3),
      Span("addr_full", "453 Orange Blossom Path, Key West FL", null, 4)))
    val r2 = IncrementalResolve.processBatch(spark, store, Seq(extra).toDF())
    assert(r2.featurizedDocs == 1, "only the delta goes through normalization")
    assert(r2.ccVertices == 1,
      s"CC must see only affected components + new docs, got ${r2.ccVertices}")
    assert(r2.assignments.count() == 121)
    assert(assignMap(r2.assignments).view.filterKeys(_ != "TEST:1").toMap ==
      assignMap(r1.assignments), "untouched docs carry their labels verbatim")
  }

  test("changed-content redelivery is an UPSERT: new spans take effect") {
    import graft.model.Span
    val tmp = java.nio.file.Files.createTempDirectory("incstore4").toString
    val store = new SnapshotStore(tmp)
    def doc(id: String, last: String, phone: String) = Doc(id, Seq(
      Span("data_source", "T", null, 0), Span("record_id", id, null, 1),
      Span("name_first", "ALEX", null, 2), Span("name_last", last, null, 3),
      Span("phone_number", phone, null, 4)))
    // batch 1: A and B share nothing → two entities
    val r1 = IncrementalResolve.processBatch(spark, store,
      Seq(doc("T:A", "ZWIRN", "555-111-2222"), doc("T:B", "QUARLE", "555-999-8888")).toDF())
    assert(r1.assignments.select("entity_id").distinct().count() == 2)
    // batch 2: B REDELIVERED with changed content matching A → must merge
    val r2 = IncrementalResolve.processBatch(spark, store,
      Seq(doc("T:B", "ZWIRN", "555-111-2222")).toDF())
    assert(r2.newDocs == 1, "changed content must count as new, not duplicate")
    assert(r2.assignments.select("entity_id").distinct().count() == 1,
      "updated record must re-resolve against the corpus")
    // and the stored doc carries the NEW spans
    val storedB = store.read(spark, "docs").filter($"doc_id" === "T:B")
      .selectExpr("filter(spans, s -> s.kind = 'name_last')[0].text").head().getString(0)
    assert(storedB == "ZWIRN")
  }

  test("a new doc bridging two existing entities merges BOTH their components") {
    import graft.model.Span
    val tmp = java.nio.file.Files.createTempDirectory("incstore7").toString
    val store = new SnapshotStore(tmp)
    def doc(id: String, last: String, phone: String, email: String) = Doc(id, Seq(
      Span("data_source", "T", null, 0), Span("record_id", id, null, 1),
      Span("name_first", "CASEY", null, 2), Span("name_last", last, null, 3)) ++
      Option(phone).map(Span("phone_number", _, null, 4)) ++
      Option(email).map(Span("email_address", _, null, 5)))
    // batch 1: A matches nothing B matches nothing → two entities
    val r1 = IncrementalResolve.processBatch(spark, store, Seq(
      doc("T:A", "BRIDGEWELL", "555-123-9876", null),
      doc("T:B", "BRIDGEWELL", null, "casey@bridgewell.example")).toDF())
    assert(r1.assignments.select("entity_id").distinct().count() == 2)
    // batch 2: C shares the phone with A and the email with B — the
    // affected-subgraph CC must pull BOTH old components in and emit
    // one merged entity with one label for all three docs
    val r2 = IncrementalResolve.processBatch(spark, store, Seq(
      doc("T:C", "BRIDGEWELL", "555-123-9876", "casey@bridgewell.example")).toDF())
    val m = assignMap(r2.assignments)
    assert(m.size == 3)
    assert(m.values.toSet.size == 1, s"bridge doc must merge both components: $m")
    // and the merge is what a from-scratch batch run produces
    val batchRun = ResolveJob.run(spark, Seq(
      doc("T:A", "BRIDGEWELL", "555-123-9876", null),
      doc("T:B", "BRIDGEWELL", null, "casey@bridgewell.example"),
      doc("T:C", "BRIDGEWELL", "555-123-9876", "casey@bridgewell.example")).toDF())
    assert(m == assignMap(batchRun.assignments))
  }

  test("crashed batch is repaired by redelivery: docs snapshot commits LAST") {
    // worst-case crash point under the commit ordering: every DERIVED
    // table committed for batch 2, the docs snapshot not yet — i.e.
    // the instant before the final commit. (The old ordering committed
    // docs FIRST, so this state made the redelivered batch a
    // content-hash no-op and silently dropped it from assignments.)
    val docs = DocCorpus.fromFlatJsonl(spark, FixtureEval.CustomersPath).collect().toSeq
    val (b1, b2) = docs.splitAt(90)
    val tmp = java.nio.file.Files.createTempDirectory("incstore6").toString
    val store = new SnapshotStore(tmp)
    IncrementalResolve.processBatch(spark, store, b1.toDF())
    val clean = IncrementalResolve.processBatch(spark, store, b2.toDF())
    // fabricate the crash: roll back ONLY docs to its batch-1 snapshot
    val docsManifests = java.nio.file.Paths.get(tmp, "docs", "_manifests")
    val latest = store.snapshots("docs").max
    java.nio.file.Files.delete(docsManifests.resolve(s"$latest.json"))
    // redelivery of batch 2 must repair the store to the clean state
    val repaired = IncrementalResolve.processBatch(spark, store, b2.toDF())
    assert(repaired.newDocs == b2.size, "rolled-back docs must count as touched again")
    assert(assignMap(repaired.assignments) == assignMap(clean.assignments),
      "redelivered crashed batch must reproduce the clean result")
    assert(assignMap(store.read(spark, "assignments")) == assignMap(clean.assignments))
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
