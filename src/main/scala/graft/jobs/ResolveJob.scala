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
    // Stage boundaries are materialized with eager localCheckpoint (or a
    // snapshot-table write in production): this truncates the LOGICAL
    // plan, not just the physical one — the normalize projection is a
    // ~10^4-node expression tree, and letting downstream stages carry
    // (and re-optimize) N copies of it costs minutes of driver CPU in
    // Catalyst transforms. It is also the resumability story: each
    // boundary is a committed snapshot (north rule).
    val feats = Generic.withGenericFlags(
      Normalize.features(docs).localCheckpoint(true),
      cfg.generic).localCheckpoint(true)

    val pairsObs = new Observation("pairs_generated")
    val edgesObs = new Observation("edges")

    val blocks = Blocking.blockingKeys(feats, cfg.blocking)
    val pairs = Blocking.candidatePairs(blocks, cfg.blocking)
      .observe(pairsObs, count(lit(1)).as("pairs_generated"))
    val edges = Scoring.scorePairs(pairs, feats, cfg.weights)
      .observe(edgesObs,
        count(lit(1)).as("pairs_scored"),
        count(when(col("level") === "RESOLVED", 1)).as("edges_resolved"))
      .localCheckpoint(true)

    val resolved = edges.filter(col("level") === "RESOLVED")
    val (assignments, stats) = ConnectedComponents.assign(
      spark, feats.select("doc_id"), resolved, cfg.checkpointDir)
    val assignP = assignments.localCheckpoint(true)

    val entities = Assemble.entities(feats, assignP, edges, cfg.numberEntities)

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
