package graft

import graft.normalize.Normalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the codegen'd span_first_text kernel (r6 — the features_raw /
  * assembly allocation-wall fix) bit-identical to the Catalyst HOF
  * formulation it replaced, over every null/dup/order edge the span
  * contract allows, in both codegen and interpreted execution.
  */
class NormalizeKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  /** The pre-r6 reference formulation. */
  private def spanTextHof(spans: org.apache.spark.sql.Column, kind: String) =
    get(filter(spans, s => s.getField("kind") === lit(kind)), lit(0)).getField("text")

  private val edgeDocs = Seq(
    // ordinary doc
    ("d1", Seq(("primary_name_first", "Ann", null, 0), ("gender", "F", null, 1))),
    // duplicate kind — FIRST must win
    ("d2", Seq(("email_address", "a@x", null, 0), ("email_address", "b@x", null, 1))),
    // matching span with NULL text (media span shape)
    ("d3", Seq(("photo", null, "m://d3/0", 0))),
    // NULL kind element — must never match
    ("d4", Seq((null, "stray", null, 0), ("gender", "M", null, 1))),
    // empty span array
    ("d5", Seq.empty[(String, String, String, Int)]),
    // kind present with empty-string text
    ("d6", Seq(("record_type", "", null, 0))))

  private def df = edgeDocs.toDF("doc_id", "raw")
    .select(col("doc_id"), transform(col("raw"), r => struct(
      r.getField("_1").as("kind"), r.getField("_2").as("text"),
      r.getField("_3").as("media_ref"), r.getField("_4").as("offset"))).as("spans"))

  private val kinds = Seq("primary_name_first", "email_address", "photo",
    "gender", "record_type", "absent_kind")

  test("kernel ≡ HOF formulation on every edge shape (codegen and interpreted)") {
    for (ws <- Seq("true", "false")) {
      graft.util.Confs.withConfs(spark)("spark.sql.codegen.wholeStage" -> ws) {
        val both = df.select(col("doc_id") +:
          kinds.flatMap(k => Seq(
            Normalize.spanText(col("spans"), k).as(s"k_$k"),
            spanTextHof(col("spans"), k).as(s"h_$k"))): _*)
          .collect()
        both.foreach { r =>
          kinds.foreach { k =>
            assert(r.getAs[String](s"k_$k") == r.getAs[String](s"h_$k"),
              s"doc ${r.getString(0)} kind $k (wholeStage=$ws)")
          }
        }
      }
    }
  }

  test("kernel resolves field ordinals by name, not position") {
    // same logical struct, physically reordered fields
    val reordered = edgeDocs.toDF("doc_id", "raw")
      .select(col("doc_id"), transform(col("raw"), r => struct(
        r.getField("_4").as("offset"), r.getField("_2").as("text"),
        r.getField("_1").as("kind"), r.getField("_3").as("media_ref"))).as("spans"))
    val got = reordered.select(col("doc_id"),
      Normalize.spanText(col("spans"), "gender").as("g")).collect()
      .map(r => r.getString(0) -> r.getAs[String]("g")).toMap
    assert(got("d1") == "F" && got("d4") == "M" && got("d2") == null)
  }

  /** The pre-r6 Catalyst reference formulation of parseAddr. */
  private def parseAddrHof(raw: org.apache.spark.sql.Column) = {
    val s = trim(regexp_replace(regexp_replace(lower(raw), "[^a-z0-9 ]", " "), " +", " "))
    val toks = filter(split(s, " "), t => t =!= "")
    val digitToks = filter(toks, t => t.rlike("^[0-9]+$"))
    val house = get(digitToks, lit(0))
    val lastDigit = element_at(digitToks, -1)
    val zip = when(size(digitToks) >= 2 && length(lastDigit) >= 5, substring(lastDigit, 1, 5))
    val stop = typedlit(Normalize.AddrStop.toSet.toSeq)
    val stokens = array_distinct(filter(toks, t =>
      t.rlike("^[a-z][a-z0-9]*$") && !array_contains(stop, t)))
    when(raw.isNotNull && size(toks) > 0,
      struct(house.as("house"), zip.as("zip"),
        get(stokens, lit(0)).as("street"), stokens.as("stokens"),
        array_distinct(digitToks).as("digits")))
  }

  test("parseAddr kernel ≡ Catalyst formulation on adversarial inputs") {
    val inputs = Seq(
      "123 Main Street, Las Vegas NV 89132",
      "123 E Main St Henderson NV 89132",
      "  1515   Adela---Lane  Las Vegas NV 89111  ",
      "Apt 4B, 77 Rue de l'Église, Genève 1204", // unicode letters → blanked
      "ÅÖÜ 42 ÊTRE 90210 straße",
      "no digits here at all",
      "12345",
      "12 34",
      "!!! ***",
      "",
      "   ",
      "PO Box 1234 Phoenix AZ 85001-1234",
      "四十二 main 12345 67890", // CJK → blanked
      "a" + "😀" + "b 99 xyz 12345 54321", // surrogate pair
      "UNIT 7 7 7 APARTMENT 1234567 st st st",
      null)
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(inputs.map(Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("raw",
          org.apache.spark.sql.types.StringType))))
    for (ws <- Seq("true", "false")) {
      graft.util.Confs.withConfs(spark)("spark.sql.codegen.wholeStage" -> ws) {
        val rows = df.select(col("raw"),
          Normalize.parseAddr(col("raw")).as("k"),
          parseAddrHof(col("raw")).as("h")).collect()
        rows.foreach { r =>
          val k = r.getAs[Row]("k"); val h = r.getAs[Row]("h")
          assert((k == null) == (h == null), s"null mismatch for '${r.get(0)}'")
          if (k != null) {
            assert(k.getAs[String]("house") == h.getAs[String]("house"), s"house '${r.get(0)}'")
            assert(k.getAs[String]("zip") == h.getAs[String]("zip"), s"zip '${r.get(0)}'")
            assert(k.getAs[String]("street") == h.getAs[String]("street"), s"street '${r.get(0)}'")
            def seq(row: Row, f: String): List[String] =
              row.getSeq[String](row.fieldIndex(f)).toList
            assert(seq(k, "stokens") == seq(h, "stokens"), s"stokens '${r.get(0)}'")
            assert(seq(k, "digits") == seq(h, "digits"), s"digits '${r.get(0)}'")
          }
        }
      }
    }
  }

  test("parseDob kernel ≡ Catalyst formulation on every format and junk") {
    val inputs = Seq(
      "3/14/1959", "03/14/59", "3/14/05", "20/8/1991", "12/12/12", "31/12/1980",
      "1959-03-14", "1959-3-4", "0000-00-00", "2001-13-05", "2001-12-32",
      "14-Mar-59", "14-MAR-1959", "7-jan-05", "14-Xyz-59", "99-Mar-59",
      "Mar 14 1959", "March 14, 1959", "MAR 4, 59", "Xyzzy 4, 59",
      "13/13/1980", "0/5/1980", "5/0/1980",
      "", "  ", "garbage", "3/14/195", "3-14-1959", "1959/03/14",
      " 3/14/1959 ", "3/14/19590", null)
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(inputs.map(Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("raw",
          org.apache.spark.sql.types.StringType))))
    for (ws <- Seq("true", "false")) {
      graft.util.Confs.withConfs(spark)("spark.sql.codegen.wholeStage" -> ws) {
        df.select(col("raw"), Normalize.parseDob(col("raw")).as("k"),
          Normalize.parseDobCatalyst(col("raw")).as("h")).collect().foreach { r =>
          assert(r.get(1) == r.get(2), s"dob mismatch for '${r.get(0)}' (ws=$ws)")
        }
      }
    }
  }

  test("canonTokens kernel ≡ Catalyst formulation incl. empty segments") {
    val dict = Normalize.Nicknames
    def hofCanon(c: org.apache.spark.sql.Column) = {
      val m = typedlit(dict)
      array_join(transform(split(c, " "), t => coalesce(element_at(m, t), t)), " ")
    }
    val inputs = Seq("bob", "bob smith", "BOB", "bob  smith", " bob", "bob ",
      "", "  ", "liz beth kate", "unknown tokens here", "pat", null)
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(inputs.map(Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("raw",
          org.apache.spark.sql.types.StringType))))
    for (ws <- Seq("true", "false")) {
      graft.util.Confs.withConfs(spark)("spark.sql.codegen.wholeStage" -> ws) {
        df.select(col("raw"),
          graft.functions.GraftFunctions.canon_tokens(col("raw"), dict).as("k"),
          hofCanon(col("raw")).as("h")).collect().foreach { r =>
          assert(r.get(1) == r.get(2), s"canon mismatch for '${r.get(0)}' (ws=$ws)")
        }
      }
    }
  }

  test("Normalize.features over the synthetic corpus matches the HOF build") {
    val docs = graft.sources.DocCorpus.synthetic(spark, 300, seed = 11L).toDF()
      .localCheckpoint(true)
    val kernel = Normalize.features(docs)
    // HOF twin of the full projection: substitute the reference
    // spanText into the same feature builder via a column-level remap
    // is impractical, so compare the kernel projection against itself
    // under interpreted eval (covers the doGenCode path vs nullSafeEval
    // path divergence) plus the per-kind equality above for semantics.
    val interp = graft.util.Confs.withConfs(spark)(
      "spark.sql.codegen.wholeStage" -> "false") {
      Normalize.features(docs).localCheckpoint(true)
    }
    assert(kernel.exceptAll(interp).isEmpty && interp.exceptAll(kernel).isEmpty)
  }
}
