package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` of named SparkEntry queries to files —
  * the r06 optimization round's plan evidence
  * (plans/r06/<query>_<tag>.txt). Args: <outDir> <tag> <name>[,name...]
  * (names default to the bench headline set). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r06"
    val tag = if (args.length > 1) args(1) else "before"
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else Seq(
        "q1_agg", "q_exact_dup_groups", "q_dup_states", "q_token_count",
        "q_lang_stats", "q_events_by_type", "q_minhash_sigs",
        "q_near_dup_pairs", "q_ann_topk", "q_dedup_decisions",
        "q_span_dedup_keep", "q_perplexity_bucket", "q_langid_trigram",
        "q_gopher_repetition", "q_host_boilerplate", "q_epoch_mix",
        "q_unicode_dedup", "q_heavy_hitters", "q_pagerank", "q_ngram_lm",
        "q_quantiles", "q_incremental_near", "q_mirror_hosts",
        "q_kmv_distinct")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    // full plans wanted here — undo the session's listener-event bound
    spark.conf.set("spark.sql.maxPlanStringLength", Int.MaxValue - 15)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), plan)
        println(s"[plandump] wrote $outDir/${n}_$tag.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
