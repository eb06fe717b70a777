package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnicodeNormSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  // decomposed: e + combining acute, i + combining diaeresis; then the
  // fi ligature and a fullwidth A (compatibility chars NFC keeps)
  private val raw = "cafe\u0301 nai\u0308ve \uFB01sh \uFF21"
  private val nfc = "caf\u00e9 na\u00efve \uFB01sh \uFF21"
  private val nfkc = "caf\u00e9 na\u00efve fish A"

  test("NFC composes combining marks; NFKC also folds compatibility forms") {
    import spark.implicits._
    val r = Seq(raw).toDF("t")
      .select(
        gf.unicode_norm(col("t"), "NFC").as("nfc"),
        gf.unicode_norm(col("t"), "NFKC").as("nfkc"))
      .head()
    assert(r.getString(0) == nfc, "NFC composes marks but keeps compatibility chars")
    assert(r.getString(1) == nfkc, "NFKC additionally folds ligature and fullwidth forms")
  }

  test("already-normalized text is returned unchanged; dedup unifies composed/decomposed") {
    import spark.implicits._
    val df = Seq(
      ("a", "caf\u00e9 bon"),  // composed (already NFC)
      ("b", "cafe\u0301 bon"), // decomposed - same rendered text
      ("c", "other doc")).toDF("url", "t")
    val normed = df.select(col("url"), gf.unicode_norm(col("t"), "NFC").as("n"))
    assert(normed.where(col("url") === "a").head().getString(1) == "caf\u00e9 bon")
    assert(normed.where(col("url") === "b").head().getString(1) == "caf\u00e9 bon")
    // raw texts hash to 3 groups; normalized to 2 — the under-dedup NFC fixes
    assert(df.select(sha2(col("t"), 256)).distinct().count() == 3)
    assert(normed.select(sha2(col("n"), 256)).distinct().count() == 2)
  }

  test("null-safe, invalid form rejected, SQL-registered") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("t")
    val out = df.select(gf.unicode_norm(col("t"), "NFC")).collect()
    assert(out.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSet
      == Set("x", null))
    intercept[IllegalArgumentException] {
      gf.unicode_norm(col("t"), "NFX")
    }
    GraftFunctions.register(spark)
    val r = spark.sql("select unicode_norm('cafe\u0301', 'NFC') as n").head()
    assert(r.getString(0) == "caf\u00e9")
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    import spark.implicits._
    val df = spark.range(2)
      .select(gf.unicode_norm(concat(lit("abc"), col("id").cast("string")), "NFC").as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage in the treeString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("unicode_norm")),
      s"expected the projection inside a codegen stage:\n$plan")
    assert(df.orderBy("n").head().getString(0) == "abc0")
  }
}
