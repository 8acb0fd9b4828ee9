package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched per-partition
  * kernels (the Scala analog of `mapInPandas`).
  *
  * The actual image/audio codecs are NOT in this container, so the
  * decode kernel is a clearly-marked deterministic STUB — but the
  * Spark-side plumbing is real and tested: binary column schema,
  * partition-batched decode, typed output rows, and pushdown-friendly
  * metadata extraction that never touches the payload bytes.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      media_bytes: Long,
      header_hex: String,
      fake_width: Int,
      fake_height: Int,
      fake_format: String)

  /** Attach a synthetic binary payload to each doc (content-derived, so
    * deterministic) — stands in for a real image/audio column.
    */
  def withSyntheticMedia(docs: DataFrame): DataFrame =
    docs.withColumn("media",
      concat(unhex(md5(col("text"))), encode(col("text"), "UTF-8")))

  /** Pure-column metadata extraction — never deserializes the payload
    * into the JVM heap beyond the needed bytes; stays codegen'd.
    */
  def mediaMetaColumns(withMedia: DataFrame): DataFrame =
    withMedia.select(
      col("doc_id"),
      length(col("media")).as("media_bytes"),
      hex(substring(col("media"), 1, 4)).as("header_hex"))

  /** Batched per-partition "decode" — the mapInPandas-shaped stage.
    * STUB: a real implementation calls an image codec on
    * `media` (e.g. JPEG decode → (w, h, pixels)); this derives
    * deterministic fake dimensions from the header bytes so the
    * pipeline shape (schema, batching, partitioning) is fully
    * exercised without the codec.
    */
  def decodeStub(spark: SparkSession, withMedia: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withMedia.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // === STUB DECODE === (codec not available in this container)
          val h = bytes.take(4)
          val header = h.map(b => f"${b & 0xff}%02X").mkString
          val w = 64 + ((h.headOption.getOrElse(0: Byte) & 0xff) % 64)
          val ht = 64 + ((h.lift(1).getOrElse(0: Byte) & 0xff) % 64)
          MediaMeta(id, bytes.length.toLong, header, w, ht, "stub/raw")
        }
      }
  }

  /** Deterministic frame-sampling plan for (fake) video payloads: every
    * k-th byte offset as a "frame" index — demonstrates the explode-
    * to-frames shape used by real frame samplers.
    */
  def frameSample(withMedia: DataFrame, everyK: Int = 32): DataFrame =
    withMedia.select(
      col("doc_id"),
      explode(sequence(lit(0),
        greatest(floor(length(col("media")) / everyK).cast("int") - 1, lit(0))))
        .as("frame_idx"))
}
