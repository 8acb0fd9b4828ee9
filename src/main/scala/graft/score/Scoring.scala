package graft.score

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise scoring: per-feature comparators combined by a
  * Fellegi–Sunter-style weighted sum, all expressed as Catalyst
  * columns (whole-stage codegen end to end; the only non-built-in
  * kernels are the codegen'd name-similarity expressions).
  *
  * Weights/thresholds are calibrated against the reference's golden
  * clustering (/root/reference/test/fixtures/flow-output.jsonl):
  * every RESOLVED merge there has name support plus ≥1 agreeing
  * strong feature, or ≥2 strong features when the name is missing;
  * every near-miss (POSSIBLY_SAME / POSSIBLY_RELATED) carries a
  * disagreeing exclusive feature (−DOB/−SSN/−PASSPORT) or lacks name
  * support. MATCH_KEY strings reproduce the reference's
  * `("+"|"-")FEATURE` grammar.
  */
object Scoring {

  final case class Weights(
      nameStrong: Double = 4.0,
      nameGivenOnly: Double = 2.5,
      nameSurnameOnly: Double = 2.5,
      nameDisagree: Double = -4.0,
      generationDisagree: Double = -2.0,
      dobExact: Double = 2.0,
      dobNear: Double = 1.5,
      dobDisagree: Double = -3.0,
      phoneFull: Double = 3.0,
      phoneSuffix: Double = 2.5,
      email: Double = 3.0,
      ssn: Double = 4.0,
      ssnDisagree: Double = -3.0,
      passport: Double = 4.0,
      passportDisagree: Double = -3.0,
      drlic: Double = 4.0,
      drlicDisagree: Double = -2.0,
      nationalId: Double = 3.0,
      nationalIdDisagree: Double = -2.0,
      addr: Double = 2.5,
      genderAgree: Double = 0.5,
      genderDisagree: Double = -0.5,
      thetaResolve: Double = 5.0,
      thetaPossible: Double = 2.0)

  private def a(c: String): Column = col(s"a.$c")
  private def b(c: String): Column = col(s"b.$c")

  /** Columns the scorer needs from the feature table. Keeping the
    * projection minimal matters: the pair join fans features out
    * once per candidate pair.
    */
  val scoringColumns: Seq[String] = Seq(
    "doc_id", "record_type", "given_raw", "given_can", "generation", "surname",
    "org_name", "dob", "phone_digits", "phone7", "email", "ssn", "passport",
    "drlic", "national_id", "addr", "gender",
    "email_generic", "phone_generic", "addr_generic", "ssn_generic",
    "passport_generic", "drlic_generic", "nid_generic")

  /** Score candidate pairs. `pairs` has (doc_a, doc_b); `features` is
    * the Normalize output. Returns one row per pair with per-feature
    * points, total score, MATCH_KEY, and level.
    */
  def scorePairs(pairs: DataFrame, features: DataFrame, w: Weights = Weights()): DataFrame = {
    val f = features.select(scoringColumns.map(col): _*)
    val joined = pairs
      .join(f.as("a"), col("doc_a") === a("doc_id"))
      .join(f.as("b"), col("doc_b") === b("doc_id"))

    // ---- name ----
    val sA = coalesce(a("surname"), a("org_name"))
    val sB = coalesce(b("surname"), b("org_name"))
    val gs = greatest(
      given_name_sim(a("given_raw"), b("given_raw")),
      given_name_sim(a("given_can"), b("given_can")))
    val ss = surname_sim(sA, sB)
    val compStraight = lit(0.55) * gs + lit(0.45) * ss
    // swapped arrangement (first/last transposed on one side)
    val gsSwap = given_name_sim(a("given_can"), sB)
    val ssSwap = given_name_sim(sA, b("given_can"))
    val compSwap = lit(0.55) * gsSwap + lit(0.45) * ssSwap
    val useSwap = compSwap.isNotNull && (compStraight.isNull || (compSwap > compStraight))
    val comp = when(useSwap, compSwap).otherwise(compStraight)
    val gsBest = when(useSwap, gsSwap).otherwise(gs)
    val ssBest = when(useSwap, ssSwap).otherwise(ss)

    val bothFull = gsBest.isNotNull && ssBest.isNotNull
    // Strong agreement needs BOTH components: a shared surname must not
    // compensate a conflicting given name (the fixture's Mark/Marsha
    // twins share surname+DOB+address+email and still stay separate).
    val namePts =
      when(bothFull && gsBest >= 0.92 && ssBest >= 0.88, w.nameStrong)
        .when(bothFull && gsBest < 0.65 && ssBest < 0.65, w.nameDisagree)
        .when(bothFull, 0.0)
        .when(gsBest.isNotNull && gsBest >= 0.9, w.nameGivenOnly)
        .when(ssBest.isNotNull && ssBest >= 0.92, w.nameSurnameOnly)
        .when(ssBest.isNotNull && ssBest < 0.6, w.nameDisagree / 2)
        .otherwise(0.0)
    val genPts = when(a("generation").isNotNull && b("generation").isNotNull &&
      a("generation") =!= b("generation"), w.generationDisagree).otherwise(0.0)

    // ---- dob ----
    val (ya, ma, da) = (a("dob.y"), a("dob.m"), a("dob.d"))
    val (yb, mb, db) = (b("dob.y"), b("dob.m"), b("dob.d"))
    val bothDob = a("dob").isNotNull && b("dob").isNotNull
    val yNear = abs(ya - yb) <= 1
    val dRevB = (db % 10) * 10 + floor(db / 10).cast("int")
    val dobPts =
      when(bothDob && ya === yb && ma === mb && da === db, w.dobExact)
        .when(bothDob && ma === db && da === mb && yNear, w.dobExact)
        .when(bothDob && ma === mb && da === db && yNear, w.dobNear)
        .when(bothDob && ya === yb && ma === mb && (abs(da - db) <= 1 || da === dRevB), w.dobNear)
        .when(bothDob, w.dobDisagree)
        .otherwise(0.0)

    // ---- exact identifiers (generic/hot values carry no weight) ----
    def exact(colName: String, genericFlag: String, agree: Double, disagree: Double): Column =
      when(a(colName).isNotNull && b(colName).isNotNull,
        when(a(colName) === b(colName),
          when(a(genericFlag), 0.0).otherwise(agree)).otherwise(disagree))
        .otherwise(0.0)

    val phonePts =
      when(a("phone7").isNotNull && b("phone7").isNotNull &&
        a("phone7") === b("phone7") && !a("phone_generic"),
        when(a("phone_digits") === b("phone_digits"), w.phoneFull)
          .otherwise(w.phoneSuffix))
        .otherwise(0.0)
    val emailPts = when(a("email").isNotNull && a("email") === b("email") &&
      !a("email_generic"), w.email).otherwise(0.0)
    val ssnPts = exact("ssn", "ssn_generic", w.ssn, w.ssnDisagree)
    val passportPts = exact("passport", "passport_generic", w.passport, w.passportDisagree)
    val drlicPts = exact("drlic", "drlic_generic", w.drlic, w.drlicDisagree)
    val nidPts = exact("national_id", "nid_generic", w.nationalId, w.nationalIdDisagree)

    // ---- address: same house number + ≥1 common street token ----
    val addrPts =
      when(a("addr.house").isNotNull && a("addr.house") === b("addr.house") &&
        size(array_intersect(a("addr.stokens"), b("addr.stokens"))) >= 1 &&
        !a("addr_generic"), w.addr)
        .otherwise(0.0)

    val genderPts =
      when(a("gender").isNotNull && b("gender").isNotNull,
        when(a("gender") === b("gender"), w.genderAgree).otherwise(w.genderDisagree))
        .otherwise(0.0)

    // PERSON vs ORGANIZATION never merges
    val typeBlock = a("record_type").isNotNull && b("record_type").isNotNull &&
      a("record_type") =!= b("record_type")

    val score = when(typeBlock, lit(-100.0)).otherwise(
      namePts + genPts + dobPts + phonePts + emailPts + ssnPts + passportPts +
        drlicPts + nidPts + addrPts + genderPts)

    def key(pts: Column, name: String): Column =
      when(pts > 0, s"+$name").when(pts < 0, s"-$name").otherwise("")

    val matchKey = concat(
      key(namePts, "NAME"), key(dobPts, "DOB"), key(addrPts, "ADDRESS"),
      key(phonePts, "PHONE"), key(emailPts, "EMAIL"), key(ssnPts, "SSN"),
      key(passportPts, "PASSPORT"), key(drlicPts, "DRLIC"),
      key(nidPts, "NATIONAL_ID"), key(genderPts, "GENDER"),
      key(genPts, "GENERATION"))

    val level =
      when(score >= w.thetaResolve, "RESOLVED")
        .when(score >= w.thetaPossible, "POSSIBLY_SAME")
        .when(emailPts > 0 || phonePts > 0 || addrPts > 0 || ssnPts > 0 ||
          passportPts > 0 || drlicPts > 0 || nidPts > 0, "POSSIBLY_RELATED")

    joined.select(
      col("doc_a"), col("doc_b"),
      score.as("score"),
      matchKey.as("match_key"),
      level.as("level"))
      .filter(col("level").isNotNull)
  }
}
