package graft.streaming

import graft.blocking.Blocking
import graft.cluster.ConnectedComponents
import graft.io.{SnapshotDiff, SnapshotStore}
import graft.jobs.ResolveJob
import graft.normalize.Normalize
import graft.score.{Generic, Scoring}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental resolve — the streaming replacement for the reference's
  * consumer loop (/root/reference/middleware/consumer.py:173-245):
  * at-least-once batches of new docs are merged idempotently (dedup on
  * doc_id — the reference delegates upsert semantics to Senzing), only
  * pairs that TOUCH a new doc are re-scored (the old↔old edge set is
  * carried from the previous snapshot), and connected components run
  * over the merged edge set — reaching in one pass the fixpoint the
  * reference's consumer+redoer pair approaches asynchronously
  * (redoer.py:105-216).
  *
  * State between batches is a [[SnapshotStore]] (atomic snapshot
  * commits): `docs`, `edges`, `assignments` — restart-safe, and the
  * affected-entity diff (consumer.py WITH_INFO semantics) falls out of
  * comparing consecutive assignment snapshots.
  */
object IncrementalResolve {

  final case class BatchResult(
      assignments: DataFrame,
      affectedEntities: DataFrame,
      newDocs: Long)

  /** Merge one batch of new docs and re-resolve incrementally. */
  def processBatch(
      spark: SparkSession,
      store: SnapshotStore,
      batch: DataFrame,
      cfg: ResolveJob.Config = ResolveJob.Config()): BatchResult =
    graft.util.Confs.withConfs(spark)(
      "spark.sql.constraintPropagation.enabled" -> "false") {
      processBatchInner(spark, store, batch, cfg)
    }

  private def processBatchInner(
      spark: SparkSession,
      store: SnapshotStore,
      batch: DataFrame,
      cfg: ResolveJob.Config): BatchResult = {

    // At-least-once redelivery vs genuine UPSERT: the reference's
    // add_record replaces an existing record (consumer.py:188 delegates
    // upsert semantics to Senzing). A redelivered doc_id with IDENTICAL
    // span content is a no-op; one with CHANGED content replaces the old
    // doc — its stale edges are invalidated below and it re-pairs like a
    // new doc.
    val newDocs0 = batch.select("doc_id", "spans").dropDuplicates("doc_id")
    def contentHash(df: DataFrame): DataFrame =
      df.withColumn("_h", xxhash64(to_json(col("spans"))))
    val (allDocs, newDocs) = if (store.exists("docs")) {
      val prev = store.read(spark, "docs")
      val incoming = contentHash(newDocs0).join(
        contentHash(prev).select(col("doc_id"), col("_h").as("_h_prev")),
        Seq("doc_id"), "left")
      val touched = incoming
        .filter(col("_h_prev").isNull || col("_h") =!= col("_h_prev"))
        .select("doc_id", "spans").localCheckpoint(true)
      val kept = prev.join(touched.select("doc_id"), Seq("doc_id"), "left_anti")
      (kept.unionByName(touched), touched)
    } else (newDocs0, newDocs0.localCheckpoint(true))
    val docsSnap = allDocs.localCheckpoint(true)
    store.commit(docsSnap, "docs")

    // features over the full corpus (generic thresholds are corpus-wide;
    // tradeoff: carried-over old↔old edges are NOT rescored when the
    // growing corpus flips a value's generic flag — incremental results
    // can drift from a from-scratch batch until the next full resolve.
    // The reference has the same property: Senzing scores a pair once,
    // at ingest time.)
    val feats = Generic.withGenericFlags(
      Normalize.features(docsSnap).localCheckpoint(true), cfg.generic)
      .localCheckpoint(true)

    // candidate pairs restricted to those touching a new/changed doc;
    // mega-hot keys are down-sampled (never dropped) on the ALL side
    val blocksAll = Blocking.cappedBlocks(
      Blocking.blockingKeys(feats, cfg.blocking), cfg.blocking)
    val newIds = newDocs.select(col("doc_id")).localCheckpoint(true)
    val blocksNew = blocksAll.join(newIds, "doc_id")
    val l = blocksAll.select(col("bkey"), col("doc_id").as("doc_a"))
    val r = blocksNew.select(col("bkey"), col("doc_id").as("doc_b"))
    val touchingPairs = l.join(r, Seq("bkey"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(
        least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()
      .localCheckpoint(true)

    val newEdges = graft.util.Confs.withConfs(spark)(
      "spark.sql.codegen.wholeStage" -> "false") {
      Scoring.scorePairs(touchingPairs, feats, cfg.weights).localCheckpoint(true)
    }

    val edges = if (store.exists("edges")) {
      // old↔old edges not touching a changed doc stay valid; every edge
      // incident to a changed/new doc is invalidated and re-scored
      val prev = store.read(spark, "edges")
        .join(newIds.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
        .join(newIds.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")
      prev.join(newEdges.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_anti")
        .unionByName(newEdges)
    } else newEdges
    val edgesSnap = edges.localCheckpoint(true)
    store.commit(edgesSnap, "edges") // RAW scores; ambiguity re-derives
    // per batch from the full merged edge set (a new doc can create or
    // dissolve a conflict), matching the batch job's semantics
    val suppressed = graft.score.Ambiguity.suppress(edgesSnap, feats)

    val (assignments, _) = ConnectedComponents.assign(
      spark, docsSnap.select("doc_id"),
      suppressed.edges.filter(col("level") === "RESOLVED"), cfg.checkpointDir)
    val assignSnap = assignments.localCheckpoint(true)

    val affected = if (store.exists("assignments")) {
      val prev = store.read(spark, "assignments")
      SnapshotDiff.affectedEntities(prev, assignSnap)
    } else assignSnap.select("entity_id").distinct()
    store.commit(assignSnap, "assignments")

    BatchResult(assignSnap, affected, newDocs.count())
  }

  /** Structured Streaming driver: readStream of docs → foreachBatch
    * incremental merge. The batch is the unit of atomic progress; a
    * failed batch commits no snapshot (at-least-once + idempotent
    * doc_id dedup = effectively-once).
    */
  def run(
      spark: SparkSession,
      stream: DataFrame,
      storeRoot: String,
      cfg: ResolveJob.Config = ResolveJob.Config(),
      checkpointLocation: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val store = new SnapshotStore(storeRoot)
    val writer = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, store, batch, cfg): Unit
      }
    checkpointLocation.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}
