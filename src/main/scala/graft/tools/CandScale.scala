package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft._
import graft.operators._
import graft.sources.SyntheticCorpus

/** Interleaved min-of-N scaling micro-bench for the candidate-generation +
  * verification stages only (the host is noisy: only interleaved
  * comparisons are trustworthy). Also reports spill totals. */
object CandScale {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val best = scala.collection.mutable.Map[Int, (Double, Double)]()
    (0 until reps).foreach { _ =>
      Seq(8, 32).foreach { c =>
        val (cand, ver) = run(c, n)
        val cur = best.getOrElse(c, (Double.MaxValue, Double.MaxValue))
        best(c) = (math.min(cur._1, cand), math.min(cur._2, ver))
      }
    }
    val (c8, v8) = best(8)
    val (c32, v32) = best(32)
    println(f"BEST cand 8t=$c8%.1f 32t=$c32%.1f E=${c8 / c32 / 4}%.3f")
    println(f"BEST ver  8t=$v8%.1f 32t=$v32%.1f E=${v8 / v32 / 4}%.3f")
  }

  def run(cpus: Int, n: Int): (Double, Double) = {
    val spark = GraftSession.build(cpus, "graft-candscale")
    spark.sparkContext.setLogLevel("ERROR")
    val spill = new java.util.concurrent.atomic.AtomicLong()
    val mem = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { spill.addAndGet(m.diskBytesSpilled); mem.addAndGet(m.memoryBytesSpilled) }
      }
    })
    val cfg = DedupConfig()
    val pages = SyntheticCorpus.distributed(spark, n, partitions = cpus * 2).toDF()
    val docs = {
      import graft.functions.gf
      val d = Scope.withScopeCols(pages
        .withColumn("etext", gf.extract_text(col("html")))
        .select(col("url"), col("warc_ts"), col("lang"), col("etext").as("text"))
        .where(col("text").isNotNull && col("url").isNotNull)
        .withColumn("len", length(col("text")))
        .withColumn("nk", gf.natural_sort_key(col("url")))
        .withColumn("sha", sha2(col("text"), 256)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    val live = docs.where(col("len") >= cfg.minLen)
    val reps = {
      val r = live.groupBy(col("sha"))
        .agg(min_by(col("url"), col("nk")).as("url"), min(col("nk")).as("nk"),
          first(col("text")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val sigs = {
      val s = Lsh.withSignatures(reps, cfg.lshConfig)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    var t0 = System.nanoTime()
    val cands = Lsh.candidatePairs(spark, sigs, cfg.lshConfig)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nc = cands.count()
    val candSec = (System.nanoTime() - t0) / 1e9
    val spill1 = spill.get() / 1e6; val mem1 = mem.get() / 1e6
    t0 = System.nanoTime()
    val nv = Lsh.verifiedEdges(cands, sigs, cfg.lshConfig, cfg.jaccardTau).count()
    val verSec = (System.nanoTime() - t0) / 1e9
    println(f"RUN cpus=$cpus cand=$candSec%.1f ($nc) ver=$verSec%.1f ($nv) " +
      f"spillDisk=${spill1}%.0fMB spillMem=${mem1}%.0fMB")
    spark.stop()
    (candSec, verSec)
  }
}
