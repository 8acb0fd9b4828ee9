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

  def code(matchKey: Column, level: Column): Column = {
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

    val resolved = when(f1, concat(lit("SF1"),
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
