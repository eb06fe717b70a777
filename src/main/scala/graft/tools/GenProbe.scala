package graft.tools
import org.apache.spark.sql.functions._
import graft._
import graft.functions.gf
import graft.sources.SyntheticCorpus
object GenProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("N", "1000000").toInt
    val spark = GraftSession.build(32, "genprobe")
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(b: => Long): Unit = {
      val t0 = System.nanoTime(); val r = b
      println(f"GEN $name%-18s ${(System.nanoTime()-t0)/1e9}%8.2f s rows=$r")
    }
    val pages = SyntheticCorpus.distributed(spark, n, partitions = 64).toDF()
    t("generate-only")(pages.select(count(lit(1))).head().getLong(0))
    t("generate-again")(pages.select(count(lit(1))).head().getLong(0))
    t("gen+extract")(pages.select(gf.extract_text(col("html")).as("t"))
      .select(count(when(length(col("t")) > 0, 1))).head().getLong(0))
    t("gen+extract+sha+nk")(pages
      .withColumn("t", gf.extract_text(col("html")))
      .withColumn("nk", gf.natural_sort_key(col("url")))
      .withColumn("sha", sha2(col("t"), 256))
      .select(count(when(length(col("sha")) > 0, 1))).head().getLong(0))
    val cached = pages.withColumn("t", gf.extract_text(col("html")))
      .withColumn("nk", gf.natural_sort_key(col("url")))
      .withColumn("sha", sha2(col("t"), 256))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("…+cache-write")(cached.count())
    t("cache-read")(cached.count())
    spark.stop()
  }
}
