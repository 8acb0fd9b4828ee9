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
      cfg: ResolveJob.Config = ResolveJob.Config()): BatchResult = {
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    val newDocs0 = batch.select("doc_id", "spans").dropDuplicates("doc_id")
    val (allDocs, newDocs) = if (store.exists("docs")) {
      val prev = store.read(spark, "docs")
      val genuinelyNew = newDocs0.join(prev, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      (prev.unionByName(genuinelyNew), genuinelyNew)
    } else (newDocs0, newDocs0)
    val docsSnap = allDocs.localCheckpoint(true)
    store.commit(docsSnap, "docs")

    // features over the full corpus (generic thresholds are corpus-wide)
    val feats = Generic.withGenericFlags(
      Normalize.features(docsSnap).localCheckpoint(true), cfg.generic)
      .localCheckpoint(true)

    // candidate pairs restricted to those touching a new doc
    val blocksAll = Blocking.blockingKeys(feats, cfg.blocking)
    val newIds = newDocs.select(col("doc_id")).localCheckpoint(true)
    val blocksNew = blocksAll.join(newIds, "doc_id")
    val hot = Blocking.hotKeys(blocksAll, cfg.blocking).select("bkey")
    val l = blocksAll.join(broadcast(hot), Seq("bkey"), "left_anti")
      .select(col("bkey"), col("doc_id").as("doc_a"))
    val r = blocksNew.join(broadcast(hot), Seq("bkey"), "left_anti")
      .select(col("bkey"), col("doc_id").as("doc_b"))
    val touchingPairs = l.join(r, Seq("bkey"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(
        least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()
      .localCheckpoint(true)

    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val newEdges = try {
      Scoring.scorePairs(touchingPairs, feats, cfg.weights).localCheckpoint(true)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")

    val edges = if (store.exists("edges")) {
      // old↔old edges are still valid; new scores win on overlap
      val prev = store.read(spark, "edges")
      prev.join(newEdges.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_anti")
        .unionByName(newEdges)
    } else newEdges
    val edgesSnap = edges.localCheckpoint(true)
    store.commit(edgesSnap, "edges")

    val (assignments, _) = ConnectedComponents.assign(
      spark, docsSnap.select("doc_id"),
      edgesSnap.filter(col("level") === "RESOLVED"), cfg.checkpointDir)
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
