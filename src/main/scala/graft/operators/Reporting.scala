package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Result-surface operators: tri-state boolean aggregation, visibility
  * filtering, and presentation scalars.
  */
object Reporting {

  /** Tri-state boolean aggregation (O20): all-true / all-false / mixed per
    * group — the reference computes this per-folder over row flags
    * (`ViewModels/MainViewModel.cs:1618-1647`) by scanning; here it is one
    * `bool_and`/`bool_or` aggregation (mixed ⇔ they disagree). */
  def triState(df: DataFrame, group: Column, flag: Column): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(bool_and(flag).as("all_true"), bool_or(flag).as("any_true"))
      .withColumn(
        "tri_state",
        when(col("all_true"), "all")
          .when(!col("any_true"), "none")
          .otherwise("mixed"))

  /** Visibility filter (O21): keep decision rows whose (host, state) is
    * allowed by a per-host preference table (`ViewModels/MainViewModel.cs:
    * 1819-1851`). Prefs are small (one row per host × state) — broadcast. */
  def visible(decisions: DataFrame, prefs: DataFrame): DataFrame =
    decisions.join(broadcast(prefs), Seq("host", "state"), "left_semi")

  /** Simple global state filter variant of O21. */
  def visibleStates(decisions: DataFrame, states: Seq[String]): DataFrame =
    decisions.where(col("state").isin(states: _*))

  /** Human byte-size formatting (O27, `Converters/ByteSizeConverter.cs:9-45`
    * ÷1024 ladder): pure Column arithmetic so it is also expressible in the
    * DuckDB oracle as an equivalent CASE ladder. */
  def humanBytes(bytes: Column): Column = {
    val b = bytes.cast("double")
    when(b < 1024.0, concat(bytes.cast("long").cast("string"), lit(" B")))
      .when(b < 1024.0 * 1024, concat(round(b / 1024.0, 1).cast("string"), lit(" KiB")))
      .when(b < 1024.0 * 1024 * 1024,
        concat(round(b / (1024.0 * 1024), 1).cast("string"), lit(" MiB")))
      .otherwise(
        concat(round(b / (1024.0 * 1024 * 1024), 1).cast("string"), lit(" GiB")))
  }
}
