package graft.tools
object StageProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(32, "graft-stageprof")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    (0 until 3).foreach { r =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_dedup_decisions")(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"REP $r total ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
