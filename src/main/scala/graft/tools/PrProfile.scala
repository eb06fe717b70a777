package graft.tools

import org.apache.spark.scheduler._

/** One-off profiling harness: runs a named SparkEntry query warm and
  * prints per-job wall times + stage counts from a listener, so the
  * fixed-overhead structure (job count × scheduling latency) is visible.
  * Profiling only — not a bench. */
object PrProfile {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_pagerank"
    val spark = graft.GraftSession.build(32, "graft-prprofile")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    @volatile var jobs = List.empty[(Int, Long, Int)] // id, ms, stages
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(), j.stageInfos.size))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null)
          jobs = (j.jobId, (System.nanoTime() - s._1) / 1000000L, s._2) :: jobs
      }
    })
    // warm twice, profile the third
    (0 until 2).foreach { _ =>
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    val profReps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "1").toInt
    (0 until profReps).foreach { _ =>
      jobs = Nil
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val js = jobs.reverse
      println(f"PROFILE $name wall=$wall%.2f s (build=$tBuild%.2f) " +
        f"jobs=${js.size} stages=${js.map(_._3).sum} jobms=${js.map(_._2).sum}")
      js.foreach { case (id, ms, st) =>
        println(f"  job $id%3d  $ms%5d ms  stages=$st") }
    }
    spark.stop()
  }
}
