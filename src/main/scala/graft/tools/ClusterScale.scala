package graft.tools
import graft._
import graft.sources.SyntheticCorpus

/** The literal north-rule reading, de-confounded: N vs 4N REAL executor
  * JVMs (local-cluster), each with its own heap, GC, and JIT — but with
  * the JIT warmed INSIDE each arm's session instead of paying it per rep.
  *
  * The r1/r3 cluster-mode negative result (8 executors slower than 2)
  * tore the session down per rep, so every measured run was a cold-JIT
  * run across fresh 5 GB JVMs; this protocol keeps one session per arm
  * per cycle, runs an uncounted warmup, then measures min-of-N inside the
  * warm session. Arms alternate per cycle so a host burst penalizes both
  * symmetrically (the Bench interleave discipline at session granularity).
  *
  * Executors get 4 cores each (the buildCluster grouping): arms are
  * executor COUNTS, so "1,4" measures 1×4 vs 4×4 — N executors vs 4N
  * executors with per-node heap/GC/JIT held constant, which is exactly
  * the resource reading the north rule's criterion presumes (and the one
  * thing thread-mode arms cannot represent).
  */
object ClusterScale {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "500000").toInt
    val arms = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_ARMS", "1,4")
      .split(",").map(_.trim.toInt).toSeq
    val cycles = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_CYCLES", "2").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    require(GraftSession.clusterCapable,
      "needs SPARK_HOME + SPARK_SCALA_VERSION for executor JVMs")

    val best = scala.collection.mutable.Map[Int, Double]().withDefaultValue(Double.MaxValue)
    (1 to cycles).foreach { cycle =>
      arms.foreach { execs =>
        val spark = GraftSession.buildCluster(
          execs, coresPerExec = 4, memMbPerExec = 5120,
          appName = s"graft-clusterscale-$execs")
        try {
          def run(): Double = {
            val pages = SyntheticCorpus.distributed(spark, n, partitions = execs * 8)
            val cfg = sys.env.get("SPARK_GRAFT_CC_MAX_DRIVER_EDGES")
              .map(v => DedupConfig(ccMaxDriverEdges = v.toLong))
              .getOrElse(DedupConfig())
            val t0 = System.nanoTime()
            DedupPipeline.run(spark, pages.toDF(), cfg, fromHtml = true)
              .decisions.write.mode("overwrite").format("noop").save()
            val t = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache() // reps must not feed on each other
            t
          }
          val warm = run() // uncounted: executor JIT + first-plan codegen
          val times = (1 to reps).map(_ => run())
          times.zipWithIndex.foreach { case (t, i) =>
            best(execs) = math.min(best(execs), t)
            println(f"CLUSTERSCALE cycle=$cycle execs=$execs%2d rep=${i + 1} " +
              f"wall=$t%8.2f s (warmup was $warm%.2f)")
          }
        } finally spark.stop()
      }
    }
    if (arms.size == 2) {
      val (a, b) = (arms.min, arms.max)
      val eff = (best(a) / best(b)) / (b.toDouble / a)
      println(f"CLUSTERSCALE summary: T_${a}exec=${best(a)}%.2f s " +
        f"T_${b}exec=${best(b)}%.2f s E=${eff}%.3f " +
        f"(real executor JVMs, warm-JIT min-of-${cycles * reps})")
    }
  }
}
