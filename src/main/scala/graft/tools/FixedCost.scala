package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import graft._
import graft.sources.SyntheticCorpus

/** One-off diagnostic for the N→4N scaling residual: decompose a full
  * pipeline run into (a) task-busy time (parallelizable), (b) inter-job
  * driver time — Catalyst planning, broadcast relation builds, RDD-loop
  * bookkeeping — and (c) GC, both task-attributed and process-wide
  * (in local mode driver + executors share one heap, so stop-the-world
  * pauses cost the same WALL at every thread count — a per-node cost a
  * real cluster multiplies with executors). Components (b) and (c) are the
  * candidates for the serial-but-∝n share that keeps measured E below the
  * hardware ceilings (BENCH.md samples 16-17: per-doc wall stable across a
  * 2× corpus at BOTH arms → the residual scales with n, not with cores).
  */
object FixedCost {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "500000").toInt
    sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,2,8,2").split(",").foreach { c =>
      run(c.trim.toInt, n)
    }
  }

  private def gcBeanMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def run(cpus: Int, n: Int): Unit = {
    val spark = GraftSession.build(cpus, "graft-fixedcost")
    spark.sparkContext.setLogLevel("ERROR")
    val jobSpans = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val agg = new java.util.concurrent.atomic.AtomicLongArray(3) // run, gc, tasks
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobSpans.merge(j.jobId, (j.time, Long.MinValue), (a, _) => a)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobSpans.merge(j.jobId, (Long.MaxValue, j.time),
          (a, b) => (a._1, b._2))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          agg.addAndGet(0, m.executorRunTime)
          agg.addAndGet(1, m.jvmGCTime)
          agg.addAndGet(2, 1L)
        }
      }
    })
    val gc0 = gcBeanMs()
    val t0 = System.nanoTime()
    val pages = SyntheticCorpus.distributed(spark, n, partitions = cpus * 2)
    val cfg = sys.env.get("SPARK_GRAFT_CC_MAX_DRIVER_EDGES")
      .map(v => DedupConfig(ccMaxDriverEdges = v.toLong))
      .getOrElse(DedupConfig())
    val r = DedupPipeline.run(spark, pages.toDF(), cfg, fromHtml = true)
    r.decisions.write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    val gcBean = (gcBeanMs() - gc0) / 1e3
    // give straggler listener events a beat to drain
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val spans = jobSpans.values.asScala.toSeq
      .filter { case (s, e) => s != Long.MaxValue && e != Long.MinValue }
      .map { case (s, e) => (s, math.max(s, e)) }
      .sortBy(_._1)
    // union of job intervals; wall minus this = pure driver time between jobs
    var covered = 0L
    var curS = Long.MinValue
    var curE = Long.MinValue
    spans.foreach { case (s, e) =>
      if (s > curE) { covered += curE - curS max 0; curS = s; curE = e }
      else if (e > curE) curE = e
    }
    covered += (curE - curS) max 0
    val jobSec = covered / 1e3
    val driverGap = wall - jobSec
    val runSec = agg.get(0) / 1e3
    val gcTask = agg.get(1) / 1e3
    println(f"FIXEDCOST cpus=$cpus%2d docs=$n wall=$wall%8.2f s " +
      f"jobs=${spans.size}%3d tasks=${agg.get(2)}%5d " +
      f"inJobs=$jobSec%8.2f driverGap=$driverGap%7.2f " +
      f"taskBusy=$runSec%8.2f util=${runSec / (wall * cpus)}%5.2f " +
      f"gcTask=$gcTask%6.2f gcBean=$gcBean%6.2f")
    spark.stop()
  }
}
