package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft._
import graft.operators._
import graft.sources.SyntheticCorpus

/** One-off diagnostic: where do candidatePairs/verifiedEdges spend time at
  * each parallelism level — executor CPU, GC, shuffle bytes, task skew. */
object CandProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toInt
    sys.env.getOrElse("SPARK_GRAFT_LEVELS", "32,8").split(",").foreach { c =>
      run(c.trim.toInt, n)
    }
  }

  def run(cpus: Int, n: Int): Unit = {
    val spark = GraftSession.build(cpus, "graft-candprofile")
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long, Long, Long)]()
    val spills = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          metrics.merge(t.stageId,
            (m.executorRunTime, m.jvmGCTime,
              m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead,
              m.executorDeserializeTime),
            (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4, a._5 + b._5))
          spills.merge(t.stageId,
            (m.memoryBytesSpilled, m.diskBytesSpilled, m.peakExecutionMemory),
            (a, b) => (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
          taskMax.merge(t.stageId, m.executorRunTime, (a, b) => math.max(a, b))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        names.put(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n').take(40))
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
    metrics.clear(); spills.clear(); names.clear(); taskMax.clear()
    var t0 = System.nanoTime()
    val cands = Lsh.candidatePairs(spark, sigs, cfg.lshConfig)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nc = cands.count()
    val candSec = (System.nanoTime() - t0) / 1e9
    println(f"== cpus=$cpus candidates: $candSec%.1f s rows=$nc")
    dump(metrics, spills, names, taskMax)

    metrics.clear(); spills.clear(); names.clear(); taskMax.clear()
    t0 = System.nanoTime()
    val nv = Lsh.verifiedEdges(cands, sigs, cfg.lshConfig, cfg.jaccardTau).count()
    val verSec = (System.nanoTime() - t0) / 1e9
    println(f"== cpus=$cpus verified: $verSec%.1f s rows=$nv")
    dump(metrics, spills, names, taskMax)
    spark.stop()
  }

  private def dump(
      metrics: java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long, Long, Long)],
      spills: java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)],
      names: java.util.concurrent.ConcurrentHashMap[Int, String],
      taskMax: java.util.concurrent.ConcurrentHashMap[Int, Long]): Unit = {
    import scala.jdk.CollectionConverters._
    metrics.asScala.toSeq.sortBy(_._1).foreach { case (sid, (run, gc, sw, sr, de)) =>
      val (memSp, diskSp, peak) = spills.getOrDefault(sid, (0L, 0L, 0L))
      println(f"  stage $sid%4d run=${run / 1000.0}%8.1fs gc=${gc / 1000.0}%7.1fs " +
        f"(${100.0 * gc / math.max(run, 1)}%4.1f%%) shW=${sw / 1e6}%8.1fMB " +
        f"shR=${sr / 1e6}%8.1fMB deser=${de / 1000.0}%6.1fs " +
        f"spillM=${memSp / 1e6}%7.1fMB spillD=${diskSp / 1e6}%7.1fMB " +
        f"peakTask=${peak / 1e6}%7.1fMB " +
        f"maxTask=${taskMax.getOrDefault(sid, 0L) / 1000.0}%6.1fs  ${names.getOrDefault(sid, "?")}")
    }
  }
}
