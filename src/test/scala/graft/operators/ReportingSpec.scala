package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReportingSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("triState: all / none / mixed") {
    import spark.implicits._
    val df = Seq(
      ("a", true), ("a", true),
      ("b", false), ("b", false),
      ("c", true), ("c", false)).toDF("g", "f")
    val got = Reporting.triState(df, col("g"), col("f"))
      .select("grp", "tri_state").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "all", "b" -> "none", "c" -> "mixed"))
  }

  test("visible: per-host state preferences via broadcast semi join") {
    import spark.implicits._
    val dec = Seq(
      ("h1", "keep", "u1"), ("h1", "delete", "u2"),
      ("h2", "keep", "u3"), ("h2", "delete", "u4")).toDF("host", "state", "url")
    val prefs = Seq(("h1", "keep"), ("h2", "delete")).toDF("host", "state")
    val got = Reporting.visible(dec, prefs).select("url").as[String].collect().toSet
    assert(got == Set("u1", "u4"))
    // plan check: prefs side must broadcast, not shuffle
    val plan = Reporting.visible(dec, prefs).queryExecution.executedPlan.toString()
    assert(plan.contains("Broadcast"), plan)
  }

  test("humanBytes ladder") {
    import spark.implicits._
    val got = Seq(0L, 512L, 1536L, 10L * 1024 * 1024, 3L * 1024 * 1024 * 1024)
      .toDF("b").select(Reporting.humanBytes(col("b")).as("h"))
      .as[String].collect()
    assert(got.sameElements(Array("0 B", "512 B", "1.5 KiB", "10.0 MiB", "3.0 GiB")))
  }
}
