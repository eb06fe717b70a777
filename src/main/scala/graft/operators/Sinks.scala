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
    * the deduplicated corpus. "Preserve source structure" is expressed as a
    * `source_host` COLUMN plus a partition on a bounded hash derivative of
    * it: a web corpus has millions of hosts, and `partitionBy(host)` would
    * mean millions of directories — a small-files explosion and a
    * driver-side partition-tracking blowup at 100 TB (VERDICT r1 §wrong.5).
    * `hostBuckets` bounds directory fan-out; all pages of one host still
    * land in one bucket, so per-host reads prune to a single partition. */
  def writeDedupedCorpus(
      pages: DataFrame,
      decisions: DataFrame,
      outDir: String,
      hostBuckets: Int = 1024): Unit =
    pages
      .join(
        decisions.where(col("state") === "delete").select(col("url")),
        Seq("url"), "left_anti")
      .withColumn("source_host", Scope.host(col("url")))
      .withColumn("host_bucket", pmod(xxhash64(col("source_host")), lit(hostBuckets)))
      .write.mode("overwrite")
      .partitionBy("host_bucket")
      .parquet(outDir)
}
