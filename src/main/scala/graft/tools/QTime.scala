package graft.tools
import graft._

/** Repeat-times named SparkEntry queries in one warm JVM — separates real
  * plan regressions from this host's co-tenant bursts (single cold runs
  * vary up to 10×; see BENCH.md "Measurement validity"). */
object QTime {
  def main(args: Array[String]): Unit = {
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "q_dedup_decisions").split(",")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_QTIME_REPS", "3").toInt
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-qtime")
    spark.sparkContext.setLogLevel("ERROR")
    (0 until reps).foreach { r =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n.trim)(spark, sf).write.mode("overwrite").format("noop").save()
        println(f"QTIME rep=$r ${n.trim}%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
