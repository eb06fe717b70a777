package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** O17 manual label overrides — the reference's post-scan keep↔delete
  * toggle (`Views/MainWindow.xaml.cs:15-38`) with re-election semantics. */
class OverridesSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def decisions(rows: (String, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("url", "cluster", "state")
  }

  private def overrides(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("url", "state")
  }

  private def states(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("url", "state").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("keep→delete re-elects the natural-min non-overridden member") {
    val dec = decisions(
      ("https://h.x/a1.html", "https://h.x/a1.html", "keep"),
      ("https://h.x/a2.html", "https://h.x/a1.html", "delete"),
      ("https://h.x/a10.html", "https://h.x/a1.html", "delete"))
    val out = states(Decisions.applyOverrides(
      dec, overrides("https://h.x/a1.html" -> "delete")))
    assert(out("https://h.x/a1.html") == "delete") // the user's toggle stands
    // natural order a2 < a10 (numeric runs) → a2 is the new keep
    assert(out("https://h.x/a2.html") == "keep")
    assert(out("https://h.x/a10.html") == "delete")
  }

  test("delete→keep coexists with the original keep (toggle touches one row)") {
    val dec = decisions(
      ("https://h.x/b1.html", "https://h.x/b1.html", "keep"),
      ("https://h.x/b2.html", "https://h.x/b1.html", "delete"))
    val out = states(Decisions.applyOverrides(
      dec, overrides("https://h.x/b2.html" -> "keep")))
    assert(out("https://h.x/b1.html") == "keep")
    assert(out("https://h.x/b2.html") == "keep")
  }

  test("overrides never touch unique/ignored rows") {
    val dec = decisions(
      ("https://h.x/c1.html", "https://h.x/c1.html", "unique"),
      ("https://h.x/c2.html", "https://h.x/c2.html", "ignored"))
    val out = states(Decisions.applyOverrides(
      dec,
      overrides("https://h.x/c1.html" -> "delete", "https://h.x/c2.html" -> "keep")))
    assert(out("https://h.x/c1.html") == "unique")
    assert(out("https://h.x/c2.html") == "ignored")
  }

  test("a fully-overridden cluster keeps the user's word: no keep remains") {
    val dec = decisions(
      ("https://h.x/d1.html", "https://h.x/d1.html", "keep"),
      ("https://h.x/d2.html", "https://h.x/d1.html", "delete"))
    val out = states(Decisions.applyOverrides(
      dec,
      overrides("https://h.x/d1.html" -> "delete", "https://h.x/d2.html" -> "delete")))
    assert(out("https://h.x/d1.html") == "delete")
    assert(out("https://h.x/d2.html") == "delete")
  }

  test("re-election under sourcePriority uses the priority-ordered minimum") {
    // cluster elected under sourcePriority = [b.x, a.x]: the b.x member was
    // the keep despite a.x sorting first naturally. Overriding it to delete
    // must re-elect the OTHER b.x member (priority order), not the a.x one
    // (plain natural order) — VERDICT r2 §wrong.2.
    val dec = decisions(
      ("https://b.x/p2.html", "https://b.x/p2.html", "keep"),
      ("https://b.x/p9.html", "https://b.x/p2.html", "delete"),
      ("https://a.x/p1.html", "https://b.x/p2.html", "delete"))
    val prio = Seq("b.x", "a.x")
    val out = states(Decisions.applyOverrides(
      dec, overrides("https://b.x/p2.html" -> "delete"), sourcePriority = prio))
    assert(out("https://b.x/p2.html") == "delete")
    assert(out("https://b.x/p9.html") == "keep") // priority min, not natural min
    assert(out("https://a.x/p1.html") == "delete")
    // and WITHOUT the priority the natural-order member wins — the guard
    // that this test would catch a dropped sourcePriority thread-through
    val plain = states(Decisions.applyOverrides(
      dec, overrides("https://b.x/p2.html" -> "delete")))
    assert(plain("https://a.x/p1.html") == "keep")
  }

  test("untouched clusters pass through unchanged") {
    val dec = decisions(
      ("https://h.x/e1.html", "https://h.x/e1.html", "keep"),
      ("https://h.x/e2.html", "https://h.x/e1.html", "delete"),
      ("https://h.x/e3.html", "https://h.x/e3.html", "unique"))
    val out = states(Decisions.applyOverrides(dec, overrides()))
    assert(out == Map(
      "https://h.x/e1.html" -> "keep",
      "https://h.x/e2.html" -> "delete",
      "https://h.x/e3.html" -> "unique"))
  }
}
