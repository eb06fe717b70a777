package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def frames() = {
    import spark.implicits._
    // corpus holds texts A and B; batch brings B (corpus dup), C twice
    // (internal dup, two urls) and D (genuinely new)
    val corpus = Seq("text A", "text B").toDF("text")
      .select(sha2(col("text"), 256).as("sha"))
    val batch = Seq(
      ("u1", "text B"),
      ("u2", "text C"),
      ("u3", "text C"),
      ("u4", "text D")).toDF("url", "text")
    (batch, corpus)
  }

  test("newDocs drops corpus dups, elects one rep per internal-dup group") {
    val (batch, corpus) = frames()
    val out = IncrementalDedup.newDocs(batch, corpus).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
    assert(out == Map("u2" -> "text C", "u4" -> "text D"))
  }

  test("ingestStats accounting adds up") {
    val (batch, corpus) = frames()
    val r = IncrementalDedup.ingestStats(batch, corpus).collect().head
    assert(r.getAs[Long]("n_batch") == 4)
    assert(r.getAs[Long]("n_distinct") == 3)
    assert(r.getAs[Long]("n_internal_dups") == 1)
    assert(r.getAs[Long]("n_corpus_dups") == 1)
    assert(r.getAs[Long]("n_new") == 2)
  }

  test("digest dial changes the sha column but not the decisions") {
    val (batch, corpus0) = frames()
    import spark.implicits._
    val corpusMd5 = Seq("text A", "text B").toDF("text")
      .select(md5(col("text")).as("sha"))
    val out = IncrementalDedup.newDocs(batch, corpusMd5, algo = "md5").collect()
    assert(out.map(_.getAs[String]("url")).toSet == Set("u2", "u4"))
    assert(out.head.getAs[String]("sha").length == 32) // md5 hex width
    intercept[IllegalArgumentException] {
      IncrementalDedup.digestCol(col("text"), "sha1")
    }
    assert(corpus0.count() == 2) // silence unused warning path
  }

  test("exact duplicate (url, text) batch rows emit one output row per sha") {
    import spark.implicits._
    val batch = Seq(
      ("u1", "text C"), ("u1", "text C"), ("u1", "text C"),
      ("u2", "text D")).toDF("url", "text")
    val empty = Seq.empty[String].toDF("sha")
    val out = IncrementalDedup.newDocs(batch, empty).collect()
    assert(out.length == 2, s"one row per distinct sha, got ${out.length}")
    assert(out.map(_.getAs[String]("url")).toSet == Set("u1", "u2"))
  }

  test("empty corpus keeps every distinct batch text") {
    val (batch, _) = frames()
    import spark.implicits._
    val empty = Seq.empty[String].toDF("sha")
    val out = IncrementalDedup.newDocs(batch, empty).collect()
    assert(out.length == 3) // B, C (one rep), D
  }

  test("bloom-gated path returns exactly newDocs' rows") {
    val (batch, corpus) = frames()
    val bloom = IncrementalDedup.corpusBloom(corpus, expectedItems = 16)
    val gated = IncrementalDedup.newDocsBloomGated(batch, corpus, bloom).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("text"))).toSet
    val plain = IncrementalDedup.newDocs(batch, corpus).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("text"))).toSet
    assert(gated == plain && gated == Set("u2" -> "text C", "u4" -> "text D"))
  }

  test("bloom has no false negatives: every corpus sha probes true") {
    import spark.implicits._
    val corpus = (1 to 500).map(i => s"corpus text $i").toDF("text")
      .select(sha2(col("text"), 256).as("sha"))
    val bloom = IncrementalDedup.corpusBloom(corpus, expectedItems = 500)
    // re-submit the entire corpus as a batch: the gate must flag every row
    // maybe-dup, the anti-join confirms, and nothing comes out
    val batch = (1 to 500).map(i => (s"u$i", s"corpus text $i")).toDF("url", "text")
    val out = IncrementalDedup.newDocsBloomGated(batch, corpus, bloom)
    assert(out.count() == 0, "a bloom false negative leaked a corpus dup")
  }

  test("corpusBloom rejects bad sizing and null blooms are refused") {
    val (_, corpus) = frames()
    intercept[IllegalArgumentException] {
      IncrementalDedup.corpusBloom(corpus, expectedItems = 0)
    }
    intercept[IllegalArgumentException] {
      IncrementalDedup.newDocsBloomGated(corpus, corpus, null)
    }
  }

  test("corpusBloom returns null on an empty corpus (documented fallback)") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("sha")
    assert(IncrementalDedup.corpusBloom(empty, expectedItems = 16) == null)
  }

  test("bucketed corpus table: same rows as newDocs; corpus side plans NO exchange") {
    val (batch, corpus) = frames()
    val table = "corpus_shas_bucketed_spec"
    IncrementalDedup.saveShaTable(corpus, table, nBuckets = 4)
    try {
      val bucketed = spark.table(table)
      val out = IncrementalDedup.newDocsBucketed(batch, bucketed)
      val plain = IncrementalDedup.newDocs(batch, corpus)
      assert(out.exceptAll(plain).count() == 0 && plain.exceptAll(out).count() == 0)
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"),
        s"merge hint must pin SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"corpus scan must be bucketed:\n$plan")
      // the corpus side's bucketed scan satisfies the join's distribution:
      // no Exchange line may carry the bucketed relation's sha attribute.
      // The scan prints `Location ... [table]`; find its output attr id.
      val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
      // exactly the batch-side exchanges remain: reps agg + its join side
      // and the rid re-attach; the bucketed side contributes none, so every
      // Exchange must sit strictly below a node reading non-bucketed input.
      val scanLine = plan.linesIterator.find(l =>
        l.contains("Scan parquet") && l.contains(table)).getOrElse("")
      assert(scanLine.nonEmpty, s"bucketed scan not found:\n$plan")
      // the bucketed scan's sha attr (e.g. sha#123) must appear in no Exchange
      val shaAttr = "sha#\\d+".r.findFirstIn(scanLine)
      assert(shaAttr.isDefined, s"no sha attr on scan line: $scanLine")
      assert(exchanges.forall(!_.contains(shaAttr.get)),
        s"corpus sha ${shaAttr.get} crossed an Exchange:\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("texts never enter the election aggregate (narrow agg, re-join)") {
    val (batch, corpus) = frames()
    val plan = IncrementalDedup.newDocs(batch, corpus)
      .queryExecution.optimizedPlan.toString()
    // the aggregate must group (sha -> min(url)) only; text re-attaches by
    // a later join, so no Aggregate node may reference the text column
    val aggLines = plan.linesIterator.filter(_.contains("Aggregate")).toSeq
    assert(aggLines.nonEmpty && aggLines.forall(!_.contains("text")),
      s"texts leaked into the aggregate:\n$plan")
  }
}
