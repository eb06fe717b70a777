package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class SnapshotDeltaSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  // url u1: A → A → B   (new, unchanged, changed)
  // url u2: A → B → A   (new, changed, changed — the flip-flop contract:
  //                      consecutive equality, NOT whole-history membership)
  // url u3: only captured once (new), and missing from later snapshots
  // url u4: captured at snapshots 2 and 3 only, identical payload
  private def captures = {
    import spark.implicits._
    Seq(
      ("u1", 1L, "A"), ("u1", 2L, "A"), ("u1", 3L, "B"),
      ("u2", 1L, "A"), ("u2", 2L, "B"), ("u2", 3L, "A"),
      ("u3", 1L, "solo"),
      ("u4", 2L, "late"), ("u4", 3L, "late"))
      .toDF("url", "ts_s", "text")
  }

  test("classify: revisit-record statuses, consecutive-capture semantics") {
    val got = SnapshotDelta.classify(captures).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    val want = Map(
      ("u1", 1L) -> "new", ("u1", 2L) -> "unchanged", ("u1", 3L) -> "changed",
      ("u2", 1L) -> "new", ("u2", 2L) -> "changed", ("u2", 3L) -> "changed",
      ("u3", 1L) -> "new",
      ("u4", 2L) -> "new", ("u4", 3L) -> "unchanged")
    assert(got == want)
  }

  test("classify is partitioning-invariant") {
    for (parts <- Seq(1, 3, 8)) {
      val got = SnapshotDelta.classify(captures.repartition(parts))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(got.size == 9 && got.count(_._3 == "unchanged") == 2,
        s"parts=$parts")
    }
  }

  test("changedOnly drops exactly the unchanged captures, payload intact") {
    val kept = SnapshotDelta.changedOnly(captures).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Long]("ts_s"),
        r.getAs[String]("text"), r.getAs[String]("status"))).toSet
    assert(kept == Set(
      ("u1", 1L, "A", "new"), ("u1", 3L, "B", "changed"),
      ("u2", 1L, "A", "new"), ("u2", 2L, "B", "changed"),
      ("u2", 3L, "A", "changed"),
      ("u3", 1L, "solo", "new"), ("u4", 2L, "late", "new")))
  }

  test("deltaStats: per-snapshot churn rollup") {
    val got = SnapshotDelta.deltaStats(captures).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (1L, "new") -> 3L,
      (2L, "new") -> 1L, (2L, "unchanged") -> 1L, (2L, "changed") -> 1L,
      (3L, "unchanged") -> 1L, (3L, "changed") -> 2L))
  }

  test("statuses are computed on a narrow frame: no payload in the window exchange") {
    // the classify plan must not carry the text column past the digest
    // projection — round-trip through parquet first so constant folding
    // can't evaluate the digest at plan time (verify-skill gotcha)
    val dir = java.nio.file.Files.createTempDirectory("snapdelta").toString
    captures.write.mode("overwrite").parquet(dir)
    val plan = SnapshotDelta.classify(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    // the digest projection must sit BELOW the exchange (map-side: tree
    // prints parents first, so Window < Exchange < xxhash64 by offset)…
    val (w, ex, dig) =
      (plan.indexOf("Window"), plan.indexOf("Exchange"), plan.indexOf("xxhash64"))
    assert(w >= 0 && ex > w && dig > ex,
      s"digest not computed map-side before the exchange:\n$plan")
    // …and the window stage itself operates on (url, ts_s, __dig) only
    val windowLine = plan.linesIterator.find(_.contains("Window [")).get
    assert(!windowLine.contains("text#"),
      s"payload column leaked into the window stage:\n$plan")
  }
}
