package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** `spark.sql.extensions` entry point: injects every engine function into
  * new sessions, so a stock deployment reaches the whole SQL surface with
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions app.jar
  *
  * and no driver-side registration code (the per-session alternative is
  * `GraftFunctions.register(spark)`). Injection-based registration is the
  * public extension mechanism Spark provides precisely so libraries ship
  * functions/rules without patching the session — preferred over temp
  * functions for anything long-lived.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
