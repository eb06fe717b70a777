package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.operators._
import graft.sources.SyntheticCorpus

/** Isolated connected-components scaling profile.
  *
  * Builds the 1M-doc pipeline edge list ONCE (32 threads) and parks it as
  * parquet, then times ONLY `ConnectedComponents.run` (distributed path
  * forced) at each `SPARK_GRAFT_LEVELS` core count over the identical
  * on-disk input. StageTimes measures CC inside the whole pipeline where
  * its input is a fresh cache; this tool answers the narrower question the
  * 2v8 scaling forensics need — how much of CC's wall time is per-round
  * job latency (constant in cores) vs shuffle work (scales with cores).
  * Set SPARK_GRAFT_CC_LOG=1 to see the per-phase breakdown inside each run.
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toInt
    val dir = "/tmp/graft_ccprof"
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,2,8")
      .split(",").map(_.trim.toInt).toSeq

    // ---- build nodes + edges once, park as parquet ----
    locally {
      val spark = GraftSession.build(32, "graft-ccprof-build")
      spark.sparkContext.setLogLevel("ERROR")
      val cfg = DedupConfig()
      import graft.functions.gf
      val pages = SyntheticCorpus.distributed(spark, n, partitions = 64).toDF()
      val docs = pages
        .withColumn("text", gf.extract_text(col("html")))
        .where(col("text").isNotNull && col("url").isNotNull)
        .withColumn("len", length(col("text")))
        .withColumn("nk", gf.natural_sort_key(col("url")))
        .withColumn("sha", sha2(col("text"), 256))
      val live = docs.where(col("len") >= cfg.minLen)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exactEdges =
        ExactDedup.repsAndEdges(live.select(col("url"), col("nk"), col("sha")))._2
      val reps = live.groupBy(col("sha"))
        .agg(min(struct(col("nk"), col("url"))).as("m"), first(col("text")).as("text"))
        .select(col("m.url").as("url"), col("m.nk").as("nk"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sigs = Lsh.withSignatures(reps, cfg.lshConfig)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cands = Lsh.candidatePairs(spark, sigs, cfg.lshConfig)
      val near = Lsh.verifiedEdges(cands, sigs, cfg.lshConfig, cfg.jaccardTau)
        .select("src", "dst")
      val subc = SubstringDup.candidatePairs(spark, reps, cfg.substrConfig)
      val sub = SubstringDup.verifiedEdges(subc, reps, cfg.substrConfig)
      val edges = exactEdges.select("src", "dst").unionByName(near).unionByName(sub)
      edges.write.mode("overwrite").parquet(s"$dir/edges")
      live.select(col("url"), col("nk")).write.mode("overwrite").parquet(s"$dir/nodes")
      spark.stop()
    }

    // ---- time CC alone at each level over the identical parquet input ----
    levels.foreach { cpus =>
      val spark = GraftSession.build(cpus, "graft-ccprof")
      spark.sparkContext.setLogLevel("ERROR")
      val nodes = spark.read.parquet(s"$dir/nodes")
      val edges = spark.read.parquet(s"$dir/edges")
      val t0 = System.nanoTime()
      val labels = ConnectedComponents.run(spark, nodes, edges, maxDriverEdges = 0L)
      val rows = labels.count()
      println(f"CC_TOTAL cpus=$cpus%-3d ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows")
      spark.stop()
    }
  }
}
