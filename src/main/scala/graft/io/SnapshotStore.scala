package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot table semantics on plain Parquet.
  *
  * The sandbox image ships no Iceberg runtime (SURVEY.md §4.2), so this
  * thin store provides the properties the pipeline needs from Iceberg —
  * atomic snapshot commit, snapshot listing, time-travel read, and
  * snapshot diff — over a directory layout:
  *
  * {{{
  * root/<table>/data/snap=<id>/ (parquet, written first)
  * root/<table>/_manifests/<id>.json       (atomic rename = publish)
  * }}}
  *
  * A failed job publishes no manifest, so readers never see partial
  * data — this replaces the reference's export-tracker status machine
  * (TODO→IN_PROGRESS→DONE with rewind-on-error,
  * /root/reference/middleware/db.py:41-102): "rewind" is simply the
  * absence of a commit. In production the `TableIO` calls map 1:1 to
  * `spark.read/writeTo(...).format("iceberg")`.
  */
final class SnapshotStore(root: String) {

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def manifestDir(table: String): Path = tableDir(table).resolve("_manifests")

  def snapshots(table: String): Seq[Long] = {
    val dir = manifestDir(table)
    if (!Files.isDirectory(dir)) return Seq.empty
    // Files.list holds an open DirectoryStream — close it, or a
    // long-running streaming driver leaks one fd per store call
    val s = Files.list(dir)
    try {
      s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json").toLong)
        .toSeq.sorted
    } finally s.close()
  }

  def latestSnapshot(table: String): Option[Long] = snapshots(table).lastOption

  /** Atomically commit `df` as the next snapshot; returns its id. */
  def commit(df: DataFrame, table: String): Long = {
    val id = latestSnapshot(table).getOrElse(0L) + 1L
    val dataPath = tableDir(table).resolve("data").resolve(s"snap=$id")
    df.write.mode("overwrite").parquet(dataPath.toString)
    Files.createDirectories(manifestDir(table))
    val tmp = manifestDir(table).resolve(s".$id.json.tmp")
    val fin = manifestDir(table).resolve(s"$id.json")
    Files.writeString(tmp, s"""{"snapshot":$id,"table":"$table","path":"$dataPath"}""")
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
    id
  }

  /** Read a snapshot (latest by default). */
  def read(spark: SparkSession, table: String, snapshot: Option[Long] = None): DataFrame = {
    val id = snapshot.orElse(latestSnapshot(table))
      .getOrElse(throw new IllegalStateException(s"no committed snapshot for $table"))
    spark.read.parquet(tableDir(table).resolve("data").resolve(s"snap=$id").toString)
  }

  def exists(table: String): Boolean = latestSnapshot(table).isDefined
}

object SnapshotDiff {
  import org.apache.spark.sql.functions._

  /** Affected entities between two assignment snapshots (doc_id,
    * entity_id): the distinct entity ids — old and new — touched by
    * any doc whose assignment changed, appeared, or disappeared.
    * This is the batch-native form of the reference's WITH_INFO
    * affected-entity tracking (/root/reference/middleware/consumer.py:
    * 189-197: AFFECTED_ENTITIES ids inserted into export_tracker).
    */
  def affectedEntities(prev: DataFrame, curr: DataFrame): DataFrame = {
    val p = prev.select(col("doc_id"), col("entity_id").as("prev_entity"))
    val c = curr.select(col("doc_id"), col("entity_id").as("curr_entity"))
    val changed = p.join(c, Seq("doc_id"), "full_outer")
      .filter(col("prev_entity").isNull || col("curr_entity").isNull ||
        col("prev_entity") =!= col("curr_entity"))
    changed.select(col("curr_entity").as("entity_id"))
      .unionAll(changed.select(col("prev_entity").as("entity_id")))
      .filter(col("entity_id").isNotNull)
      .distinct()
  }
}
