package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class DatacardSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("composition: counts, token/char mass, dup rate, shares sum to 1") {
    import spark.implicits._
    val docs = Seq(
      ("en", "web", "one two three"),   // 3 tokens, 13 chars
      ("en", "web", "one two three"),   // exact dup of the row above
      ("en", "wiki", "four five"),      // 2 tokens
      ("de", "web", "sechs"),           // 1 token
      ("de", "web", "sieben acht")      // 2 tokens
    ).toDF("lang", "source", "text")
    val out = Datacard.composition(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 3)
    val enWeb = out(("en", "web"))
    assert(enWeb.getLong(2) == 2L && enWeb.getLong(3) == 6L)
    assert(enWeb.getLong(4) == 26L && enWeb.getDouble(5) == 13.0)
    assert(enWeb.getLong(6) == 1L, "exact dup collapses the distinct count")
    assert(enWeb.getDouble(7) == 0.5, "dup_rate = 1 - 1/2")
    val deWeb = out(("de", "web"))
    assert(deWeb.getLong(6) == 2L && deWeb.getDouble(7) == 0.0)
    // shares: 6/11, 2/11, 3/11 — sum to 1
    val shares = out.values.map(_.getDouble(8)).toSeq
    assert(math.abs(shares.sum - 1.0) < 1e-12)
    assert(math.abs(enWeb.getDouble(8) - 6.0 / 11.0) < 1e-12)
  }

  test("empty text contributes zero tokens; aggregate stays narrow") {
    import spark.implicits._
    val docs = Seq(("en", "web", ""), ("en", "web", "a b")).toDF("lang", "source", "text")
    val r = Datacard.composition(docs).head()
    assert(r.getLong(3) == 2L, "empty doc counts 0 tokens")
    // the aggregate must partially combine map-side (text contributes only
    // its length/digest to the buffers; the exchange keys reference text
    // solely inside sha2(...), which ships 32-byte digests, not bodies)
    val plan = Datacard.composition(docs).queryExecution.executedPlan.toString
    assert(plan.contains("merge_sum") || plan.contains("partial_sum"),
      s"expected two-phase aggregation:\n$plan")
    val rawTextInExchange = plan.linesIterator.exists(l =>
      l.contains("Exchange") &&
        "(?<!cast\\()text#\\d+".r.findFirstIn(l.replace("sha2(cast(text", "DIGEST(")).isDefined)
    assert(!rawTextInExchange, s"raw text crossed an exchange:\n$plan")
  }
}
