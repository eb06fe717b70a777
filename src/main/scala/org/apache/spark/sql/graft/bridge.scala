package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters package-private
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so this one-file shim
  * lives in the spark namespace — the same pattern used by public Spark
  * extension libraries (cf. SNIPPETS.md [2], [3]). No Spark internals are
  * modified; this only re-exports the two converters.
  */
object bridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}

/** Declares all-LongType inputs with implicit casts. Lives here because
  * `AbstractDataType` is `private[sql]` in Spark 4, so an expression outside
  * the spark namespace cannot override `inputTypes` directly (ADVICE r2:
  * SQL-registered functions without declared input types turn an INT
  * argument into a runtime ClassCastException instead of a clean analysis
  * error / implicit cast). */
trait AllLongInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  self: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    children.map(_ => org.apache.spark.sql.types.LongType)
}

/** String-input twin of [[AllLongInputTypes]] — same rationale. */
trait AllStringInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  self: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    children.map(_ => org.apache.spark.sql.types.StringType)
}
