package graft.tools
import org.apache.spark.sql.functions._
import graft._
import graft.operators._
import graft.sources.SyntheticCorpus

/** One-off diagnostic: does AQE stage reuse deduplicate the candidatePairs
  * subtree when verifiedEdges consumes it unpersisted (the Pipeline shape),
  * or does the subtree execute once per plan instance? Compares wall time
  * and total shuffle-write bytes of verifiedEdges over persisted vs
  * unpersisted candidates. */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "500000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build(cpus, "graft-reusecheck")
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleW = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val cfg = DedupConfig()
    import graft.functions.gf
    val pages = SyntheticCorpus.distributed(spark, n, partitions = cpus * 2).toDF()
    val docs = pages
      .withColumn("etext", gf.extract_text(col("html")))
      .select(col("url"), col("etext").as("text"))
      .where(col("text").isNotNull && col("url").isNotNull)
      .withColumn("nk", gf.natural_sort_key(col("url")))
    val reps = docs.groupBy(sha2(col("text"), 256).as("sha"))
      .agg(min_by(col("url"), col("nk")).as("url"), min(col("nk")).as("nk"),
        first(col("text")).as("text"))
      .drop("sha")
    val sigs = Lsh.withSignatures(reps, cfg.lshConfig)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()

    // warm JIT with one throwaway pass (persisted shape)
    def persistedRun(): (Double, Double, Long) = {
      val t0 = System.nanoTime()
      shuffleW.set(0)
      val c = Lsh.candidatePairs(spark, sigs, cfg.lshConfig)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      val t1 = System.nanoTime()
      val nv = Lsh.verifiedEdges(c, sigs, cfg.lshConfig, cfg.jaccardTau).count()
      val t2 = System.nanoTime()
      c.unpersist(true)
      println(f"persisted: cand=${(t1 - t0) / 1e9}%.1f s verify=${(t2 - t1) / 1e9}%.1f s " +
        f"shW=${shuffleW.get() / 1e6}%.0f MB rows=$nv")
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, shuffleW.get())
    }
    def unpersistedRun(): (Double, Long) = {
      val t0 = System.nanoTime()
      shuffleW.set(0)
      val c = Lsh.candidatePairs(spark, sigs, cfg.lshConfig)
      val nv = Lsh.verifiedEdges(c, sigs, cfg.lshConfig, cfg.jaccardTau).count()
      val t1 = System.nanoTime()
      println(f"unpersisted: total=${(t1 - t0) / 1e9}%.1f s " +
        f"shW=${shuffleW.get() / 1e6}%.0f MB rows=$nv")
      ((t1 - t0) / 1e9, shuffleW.get())
    }
    persistedRun() // warm
    val p = persistedRun()
    val u = unpersistedRun()
    println(f"VERDICT: unpersisted/persisted wall = ${u._1 / (p._1 + p._2)}%.2fx, " +
      f"shuffle bytes = ${u._2.toDouble / p._3}%.2fx")
    spark.stop()
  }
}
