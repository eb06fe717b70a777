package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output sinks. The engine never mutates its input (the reference's
  * recycle-bin soft delete, `ViewModels/FileEntryViewModel.cs:209-214`,
  * becomes an idempotent decisions table write).
  */
object Sinks {

  /** Delete sink analog (O22, `ViewModels/MainViewModel.cs:1248-1346`):
    * persist the decisions table, partitioned by state so downstream
    * consumers prune to just `delete` (or just `keep`) at the scan. */
  def writeDecisions(decisions: DataFrame, outDir: String): Unit =
    decisions
      .write.mode("overwrite")
      .partitionBy("state")
      .parquet(outDir)

  /** Copy-unique sink analog (O23, `ViewModels/MainViewModel.cs:1348-1469`):
    * the deduplicated corpus, partitioned by source host — the Spark analog
    * of "preserve source-relative directory structure". */
  def writeDedupedCorpus(pages: DataFrame, decisions: DataFrame, outDir: String): Unit =
    pages
      .join(
        decisions.where(col("state") === "delete").select(col("url")),
        Seq("url"), "left_anti")
      .withColumn("source_host", Scope.host(col("url")))
      .write.mode("overwrite")
      .partitionBy("source_host")
      .parquet(outDir)
}
