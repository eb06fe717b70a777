package graft

import org.apache.spark.sql.SparkSession

import graft.sources.SyntheticCorpus

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  *   - headline queries over SPARK_GRAFT_SF_DIR (seconds each);
  *   - the dedup pipeline over a distributed synthetic corpus
  *     (SPARK_GRAFT_BENCH_DOCS docs, default 100k) at local[8] and
  *     local[32] on identical input — the sandbox evidence for the
  *     north-rule two-cluster-size criterion: throughput at both levels
  *     plus scaling efficiency E = (T_8 / T_32) / 4 (see BASELINE.md).
  *
  * Set SPARK_GRAFT_BENCH_SCALING=0 to skip the scaling pass (CI smoke).
  */
object Bench {

  private val headline = Seq(
    "q1_agg", "q_exact_dup_groups", "q_dup_states", "q_token_count",
    "q_lang_stats", "q_events_by_type", "q_minhash_sigs", "q_near_dup_pairs",
    "q_ann_topk", "q_dedup_decisions")

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  /** Full pipeline wall time over `n` synthetic docs at `cpus` threads. */
  private def pipelineRun(cpus: Int, n: Int): Double = {
    val spark = session(cpus)
    try {
      val pages = SyntheticCorpus.distributed(spark, n, partitions = cpus * 2)
      timed {
        val r = DedupPipeline.run(spark, pages.toDF(), DedupConfig(), fromHtml = true)
        r.decisions.write.mode("overwrite").format("noop").save()
      }
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING", "1") == "1"

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    val spark = session(cpus)
    try {
      headline.foreach { name =>
        val fn = SparkEntry.queries(name)
        // warm the IO/codegen once so per-query numbers measure compute
        val sec = timed {
          try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
        }
        results(name) = sec
      }
    } finally spark.stop()

    if (doScaling) {
      val t8 = pipelineRun(8, benchDocs)
      val t32 = pipelineRun(32, benchDocs)
      val eff = (t8 / t32) / 4.0
      results("pipeline_c8_sec") = t8
      results("pipeline_c32_sec") = t32
      results("pipeline_docs_per_sec_c8") = benchDocs / t8
      results("pipeline_docs_per_sec_c32") = benchDocs / t32
      results("scaling_efficiency_8_to_32") = eff
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
