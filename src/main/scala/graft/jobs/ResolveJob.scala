package graft.jobs

import graft.assemble.Assemble
import graft.blocking.Blocking
import graft.cluster.ConnectedComponents
import graft.normalize.Normalize
import graft.score.{Generic, Scoring}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end batch resolve: the Spark-native equivalent of the
  * reference's consumer + redoer pair (/root/reference/middleware/
  * consumer.py:173-245, redoer.py:105-216). One declarative pass:
  *
  *   docs → normalize/extract → blocking → candidate join → score →
  *   edges → connected components (iterate, checkpoint) → assignments
  *   → entity assembly
  *
  * Counter metrics (pairs generated / pairs scored / edges emitted —
  * the north rule's lineage counters) are collected with
  * `Dataset.observe` so they cost no extra actions.
  */
object ResolveJob {

  final case class Config(
      blocking: Blocking.Config = Blocking.Config(),
      weights: Scoring.Weights = Scoring.Weights(),
      generic: Generic.Config = Generic.Config(),
      checkpointDir: Option[String] = None,
      numberEntities: Boolean = true)

  final case class Result(
      features: DataFrame,
      edges: DataFrame,
      assignments: DataFrame,
      entities: DataFrame,
      ccStats: ConnectedComponents.Stats,
      metrics: Map[String, Long])

  def run(spark: SparkSession, docs: DataFrame, cfg: Config = Config()): Result = {
    // Catalyst constraint propagation is O(2^n) over the scoring
    // case-when trees and dominates driver time when stage outputs are
    // checkpointed (LogicalRDD.rewriteStatsAndConstraints). The
    // pipeline's joins/filters are explicit, so inferred constraints
    // buy nothing here.
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    // Stage boundaries are materialized with eager localCheckpoint (or a
    // snapshot-table write in production): this truncates the LOGICAL
    // plan, not just the physical one — the normalize projection is a
    // ~10^4-node expression tree, and letting downstream stages carry
    // (and re-optimize) N copies of it costs minutes of driver CPU in
    // Catalyst transforms. It is also the resumability story: each
    // boundary is a committed snapshot (north rule).
    val docsSnap = docs.localCheckpoint(true)
    val feats = Generic.withGenericFlags(
      Normalize.features(docsSnap).localCheckpoint(true),
      cfg.generic).localCheckpoint(true)

    val pairsObs = new Observation("pairs_generated")
    val edgesObs = new Observation("edges")

    val blocks = Blocking.blockingKeys(feats, cfg.blocking)
    val pairs = Blocking.candidatePairs(blocks, cfg.blocking)
      .observe(pairsObs, count(lit(1)).as("pairs_generated"))
    // Whole-stage codegen is disabled for the scoring action only: the
    // comparator tree fused into the nested broadcast joins re-emits
    // deferred column extractions at every use site (>64 KB method →
    // janino failure → interpreted eval). Per-operator codegen splits
    // methods fine and compiles. localCheckpoint(true) executes the
    // stage eagerly inside this conf window.
    val nDocs = feats.count()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val edges = try {
      Scoring.scorePairs(pairs, feats, cfg.weights, broadcastFeatures = nDocs < 3000000)
        .observe(edgesObs,
          count(lit(1)).as("pairs_scored"),
          count(when(col("level") === "RESOLVED", 1)).as("edges_resolved"))
        .localCheckpoint(true)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")

    val resolved = edges.filter(col("level") === "RESOLVED")
    val (assignments, stats) = ConnectedComponents.assign(
      spark, feats.select("doc_id"), resolved, cfg.checkpointDir)
    val assignP = assignments.localCheckpoint(true)

    val entities = Assemble.entities(feats, docsSnap, assignP, edges, cfg.numberEntities)

    // CC already ran actions over `resolved` (hence `edges`), so the
    // observations are populated; entity assembly is left lazy.
    val metrics = Map(
      "pairs_generated" -> pairsObs.get("pairs_generated").asInstanceOf[Long],
      "pairs_scored" -> edgesObs.get("pairs_scored").asInstanceOf[Long],
      "edges_resolved" -> edgesObs.get("edges_resolved").asInstanceOf[Long],
      "cc_iterations" -> stats.iterations.toLong)

    Result(feats, edges, assignP, entities, stats, metrics)
  }
}
