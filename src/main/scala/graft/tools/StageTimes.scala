package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.operators._
import graft.sources.SyntheticCorpus
object StageTimes {
  def time(name: String)(df: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val out = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = out.count()
    println(f"STAGE $name%-14s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    out
  }
  def run(cpus: Int, n: Int): Unit = {
    println(s"=== cpus=$cpus docs=$n ===")
    val spark = GraftSession.build(cpus, "graft-stagetimes")
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()
    val t0 = System.nanoTime()
    val pages = SyntheticCorpus.distributed(spark, n, partitions = cpus * 2).toDF()
    val docs = time("docs") {
      import graft.functions.gf
      Scope.withScopeCols(pages
        .withColumn("etext", gf.extract_text(col("html")))
        .select(col("url"), col("warc_ts"), col("lang"), col("etext").as("text"))
        .where(col("text").isNotNull && col("url").isNotNull)
        .withColumn("len", length(col("text")))
        .withColumn("nk", gf.natural_sort_key(col("url")))
        .withColumn("sha", sha2(col("text"), 256)))
    }
    val live = docs.where(col("len") >= cfg.minLen)
    val exactEdges = time("exact_edges") {
      ExactDedup.repsAndEdges(live.select(col("url"), col("nk"), col("sha")))._2
    }
    val reps = time("reps") {
      live.groupBy(col("sha"))
        .agg(min(struct(col("nk"), col("url"))).as("m"), first(col("text")).as("text"))
        .select(col("m.url").as("url"), col("m.nk").as("nk"), col("text"))
    }
    val sigs = time("signatures") { Lsh.withSignatures(reps, cfg.lshConfig) }
    val cands = time("candidates") { Lsh.candidatePairs(spark, sigs, cfg.lshConfig) }
    val near = time("near_edges") { Lsh.verifiedEdges(cands, sigs, cfg.lshConfig, cfg.jaccardTau).select("src","dst") }
    val subc = time("sub_cands") { SubstringDup.candidatePairs(spark, reps, cfg.substrConfig) }
    val sub = time("substr_edges") { SubstringDup.verifiedEdges(subc, reps, cfg.substrConfig) }
    val edges = exactEdges.select("src","dst").unionByName(near).unionByName(sub)
    val ccCap = sys.env.get("SPARK_GRAFT_CC_MAX_DRIVER_EDGES").map(_.toLong)
      .getOrElse(ConnectedComponents.DefaultMaxDriverEdges)
    val labels = time("cc") { ConnectedComponents.run(spark, live.select(col("url"), col("nk")), edges, maxDriverEdges = ccCap) }
    val dec = time("decisions") { Decisions.decide(docs.select(col("url"),col("len")), labels.select(col("url"),col("cluster_url")), cfg.minLen) }
    println(f"TOTAL ${(System.nanoTime()-t0)/1e9}%8.2f s")
    spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toInt
    sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32").split(",").foreach(c => run(c.trim.toInt, n))
  }
}
