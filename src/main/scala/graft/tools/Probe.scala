package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.sources._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(8, "graft-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val runDir = "/tmp/probe_ck"
    new scala.reflect.io.Directory(new java.io.File(runDir)).deleteRecursively()
    val corpus = SyntheticCorpus.local(400)
    val pages = spark.createDataFrame(corpus.pages)
    val cfg = DedupConfig(runDir = Some(runDir), verifyExtract = true)
    var t0 = System.nanoTime
    val r1 = DedupPipeline.run(spark, pages, cfg, fromHtml = true)
    val d1 = r1.decisions.orderBy("url").collect()
    println(f"PROBE_A first run: ${d1.length} decisions in ${(System.nanoTime-t0)/1e9}%.1f sec")
    t0 = System.nanoTime
    val r2 = DedupPipeline.run(spark, pages, cfg, fromHtml = true)
    val d2 = r2.decisions.orderBy("url").collect()
    println(f"PROBE_A resume: ${d2.length} decisions in ${(System.nanoTime-t0)/1e9}%.1f sec; identical=${d1.map(_.toString).sameElements(d2.map(_.toString))}")
    println("PROBE_A manifests: " + new java.io.File(runDir).list().count(_.contains("manifest")))

    val bad = r1.docs.where(!col("extract_ok")).count()
    println(s"PROBE_B extract mismatches: $bad of ${corpus.pages.size}")

    val garbage = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row("https://x/a.html", new java.sql.Timestamp(0L), null, null, "en"),
      org.apache.spark.sql.Row(null, new java.sql.Timestamp(0L), "<p>hi</p>".getBytes, null, "en"),
      org.apache.spark.sql.Row("https://x/b.html", new java.sql.Timestamp(0L), Array.empty[Byte], null, "en"))),
      pages.schema)
    val rg = DedupPipeline.run(spark, pages.unionByName(garbage), DedupConfig(), fromHtml = true)
    println(s"PROBE_C with-garbage decisions: ${rg.decisions.count()}")
    println("PROBE_C empty-html state: " + rg.decisions.where(col("url")==="https://x/b.html").select("state").collect().mkString)

    println("PROBE_D big clusters (skew bomb expect n=20 for s=400):")
    rg.decisions.where(col("cluster_size") >= 10).groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(when(col("state")==="keep",1).otherwise(0)).as("keeps")).show(5, false)

    // recall vs ground truth
    val lbl = r1.decisions.select(col("url"), col("cluster")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val pairs = corpus.truth
    val hit = pairs.count(p => lbl.get(p.a).exists(c => lbl.get(p.b).contains(c)))
    println(f"PROBE_E recall: $hit/${pairs.size} = ${hit.toDouble/pairs.size}%.4f")
    println("PROBE_DONE")
    spark.stop()
  }
}
