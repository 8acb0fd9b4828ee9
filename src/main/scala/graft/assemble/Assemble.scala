package graft.assemble

import graft.normalize.Normalize.spanText
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity assembly: cluster assignments + per-doc features → resolved
  * entity report rows with the reference's output shape
  * (/root/reference/test/fixtures/flow-output.jsonl: RESOLVED_ENTITY
  * {ENTITY_ID, ENTITY_NAME, FEATURES, RECORD_SUMMARY, RECORDS} +
  * RELATED_ENTITIES).
  *
  * Original span sequences ride along inside RECORDS (sorted by
  * offset) so the per-row invariant — span-sequence equality of
  * (kind, text, media_ref, order) — is checkable on the final output.
  */
object Assemble {

  /** Per-doc FEATURES entries: (ftype, desc) pairs from the raw span
    * values, mirroring Senzing's feature typing (P4 in SURVEY.md §2.2).
    */
  private def docFeatureEntries: Column = {
    val sp = col("spans")
    def f(ftype: String, value: Column): Column =
      when(value.isNotNull, struct(lit(ftype).as("ftype"), value.as("desc")))
    val addrRaw = coalesce(
      spanText(sp, "addr_full"),
      nullif(trim(concat_ws(" ",
        spanText(sp, "addr_line1"),
        spanText(sp, "addr_city"),
        spanText(sp, "addr_state"),
        spanText(sp, "addr_postal_code"))), lit("")))
    val nameRaw = coalesce(
      nullif(concat_ws(" ",
        trim(spanText(sp, "primary_name_first")),
        trim(spanText(sp, "primary_name_middle")),
        trim(spanText(sp, "primary_name_last"))), lit("")),
      spanText(sp, "primary_name_full"),
      spanText(sp, "primary_name_org"),
      spanText(sp, "secondary_name_org"),
      spanText(sp, "native_name_full"))
    filter(array(
      f("NAME", nameRaw),
      f("DOB", spanText(sp, "date_of_birth")),
      f("ADDRESS", addrRaw),
      f("PHONE", spanText(sp, "phone_number")),
      f("EMAIL", spanText(sp, "email_address")),
      f("SSN", spanText(sp, "ssn_number")),
      f("PASSPORT", spanText(sp, "passport_number")),
      f("DRLIC", spanText(sp, "drivers_license_number")),
      f("NATIONAL_ID", spanText(sp, "national_id_number")),
      f("GENDER", spanText(sp, "gender")),
      f("RECORD_TYPE", spanText(sp, "record_type"))
    ), e => e.isNotNull)
  }

  /** Best incoming RESOLVED edge per doc → (doc_id, match_key, level).
    * The cluster seed (min doc_id = entity_id) reports an empty
    * MATCH_KEY like the reference's first record of each entity.
    */
  private def perDocMatchInfo(resolvedEdges: DataFrame): DataFrame = {
    val both = resolvedEdges
      .select(col("doc_a").as("doc_id"), col("score"), col("match_key"))
      .unionAll(resolvedEdges.select(col("doc_b").as("doc_id"), col("score"), col("match_key")))
    both.groupBy("doc_id")
      .agg(max_by(col("match_key"), struct(col("score"), col("match_key"))).as("match_key"))
  }

  /** Assemble resolved entities.
    *
    * @param features Normalize.features output
    * @param assignments (doc_id, entity_id)
    * @param edges scored edges with `level`
    * @param numberEntities assign dense ascending ENTITY_ID longs
    *        (orderBy min doc_id) — report parity for small-scale golden
    *        files; at 10^12 docs keep the string id (no global sort).
    */
  def entities(
      features: DataFrame,
      docsWithSpans: DataFrame, // (doc_id, spans)
      assignments: DataFrame,
      edges: DataFrame,
      numberEntities: Boolean = true): DataFrame = {

    val resolved = edges.filter(col("level") === "RESOLVED")
    val matchInfo = perDocMatchInfo(resolved)

    val docs = features
      .join(docsWithSpans.select("doc_id", "spans"), "doc_id")
      .join(assignments, "doc_id")
      .join(matchInfo, Seq("doc_id"), "left")
      .withColumn("feature_entries", docFeatureEntries)
      .withColumn("spans_sorted", array_sort(col("spans"),
        (l, r) => when(l.getField("offset") < r.getField("offset"), -1)
          .when(l.getField("offset") > r.getField("offset"), 1).otherwise(0)))

    // FEATURES map: entity × ftype → sorted distinct raw descriptions
    val featMap = docs
      .select(col("entity_id"), explode(col("feature_entries")).as("fe"))
      .groupBy(col("entity_id"), col("fe.ftype").as("ftype"))
      .agg(array_sort(array_distinct(collect_list(col("fe.desc")))).as("descs"))
      .groupBy("entity_id")
      .agg(map_from_entries(array_sort(collect_list(struct(col("ftype"), col("descs")))))
        .as("FEATURES"))

    val recordsAgg = docs.groupBy("entity_id").agg(
      array_sort(collect_list(struct(
        col("doc_id").as("DOC_ID"),
        col("data_source").as("DATA_SOURCE"),
        col("record_id").as("RECORD_ID"),
        coalesce(when(col("doc_id") === col("entity_id"), lit("")), col("match_key"), lit(""))
          .as("MATCH_KEY"),
        when(col("doc_id") === col("entity_id"), lit(""))
          .otherwise(lit("RESOLVED")).as("MATCH_LEVEL_CODE"),
        col("spans_sorted").as("SPANS")))).as("RECORDS"),
      max_by(col("name_display"), struct(length(col("name_display")), col("name_display")))
        .as("ENTITY_NAME"),
      count(lit(1)).as("RECORD_COUNT"))

    val summary = docs.groupBy("entity_id", "data_source")
      .agg(count(lit(1)).as("RECORD_COUNT"))
      .groupBy("entity_id")
      .agg(array_sort(collect_list(struct(
        col("data_source").as("DATA_SOURCE"),
        col("RECORD_COUNT")))).as("RECORD_SUMMARY"))

    // related entities: sub-threshold edges whose endpoints ended in
    // different clusters; best edge per entity pair, emitted both ways
    val nonResolved = edges.filter(col("level") =!= "RESOLVED")
    val aAssign = assignments
      .select(col("doc_id").as("doc_a"), col("entity_id").as("entity_a"))
    val bAssign = assignments
      .select(col("doc_id").as("doc_b"), col("entity_id").as("entity_b"))
    val crossEdges = nonResolved
      .join(aAssign, "doc_a").join(bAssign, "doc_b")
      .filter(col("entity_a") =!= col("entity_b"))
      .groupBy("entity_a", "entity_b")
      .agg(
        max_by(col("match_key"), col("score")).as("match_key"),
        max_by(col("level"), col("score")).as("level"))
    val relatedBoth = crossEdges
      .select(col("entity_a").as("entity_id"), col("entity_b").as("other"),
        col("match_key"), col("level"))
      .unionAll(crossEdges.select(col("entity_b").as("entity_id"),
        col("entity_a").as("other"), col("match_key"), col("level")))
    val related = relatedBoth.groupBy("entity_id")
      .agg(array_sort(collect_list(struct(
        col("other").as("RELATED_ENTITY_KEY"),
        col("level").as("MATCH_LEVEL_CODE"),
        col("match_key").as("MATCH_KEY")))).as("RELATED_ENTITIES"))

    val base = recordsAgg
      .join(featMap, Seq("entity_id"), "left")
      .join(summary, Seq("entity_id"), "left")
      .join(related, Seq("entity_id"), "left")
      .withColumn("RELATED_ENTITIES",
        coalesce(col("RELATED_ENTITIES"),
          array().cast("array<struct<RELATED_ENTITY_KEY:string,MATCH_LEVEL_CODE:string,MATCH_KEY:string>>")))

    // `entity_key` stays the canonical (string, min-doc-id) id; ENTITY_ID
    // is the reference-parity dense ascending long. Numbering is fully
    // distributed (no single-partition window): range-partition the key
    // set, row_number within each range, add per-partition offsets.
    val keyed = base.withColumnRenamed("entity_id", "entity_key")
    if (numberEntities) {
      // number off the narrow assignment frame (one shuffle over ids),
      // not the wide assembled rows — the count pass must not recompute
      // the assembly aggregations
      val ids = denseIds(
        assignments.select(col("entity_id").as("entity_key")), "entity_key")
      keyed.join(ids, "entity_key")
    } else {
      keyed.withColumn("ENTITY_ID", col("entity_key"))
    }
  }

  /** Dense ascending 1-based long ids over the distinct values of
    * `keyCol`, without funnelling the data through one partition:
    * range-repartition on the key, row_number per partition (ranges are
    * disjoint and ordered), then add the cumulative partition offsets —
    * the only driver-side state is one count per partition. Equivalent
    * to `dense_rank().over(Window.orderBy(keyCol))` on distinct keys.
    */
  def denseIds(keys: DataFrame, keyCol: String, partitions: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = keys.select(keyCol).distinct()
      .repartitionByRange(partitions, col(keyCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // pin the (sampled) range boundaries
    val counts = ranged.groupBy("_pid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until partitions).scanLeft(0L) {
      case (acc, pid) => acc + counts.getOrElse(pid, 0L)
    }
    val offMap = typedlit((0 until partitions).map(p => p -> offsets(p)).toMap)
    val w = Window.partitionBy("_pid").orderBy(col(keyCol))
    ranged.withColumn("ENTITY_ID",
        row_number().over(w).cast("long") + element_at(offMap, col("_pid")))
      .drop("_pid")
  }

  /** Render entities to the reference's JSONL export shape. */
  def toExportJson(entities: DataFrame): DataFrame =
    entities.select(to_json(struct(
      struct(
        col("ENTITY_ID"),
        col("ENTITY_NAME"),
        col("FEATURES"),
        col("RECORD_SUMMARY"),
        col("RECORDS")).as("RESOLVED_ENTITY"),
      col("RELATED_ENTITIES"))).as("value"))
}
