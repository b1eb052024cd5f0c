package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the standard
  * seam third-party Spark libraries use to surface custom Catalyst
  * expressions as `Column`s (Spark 4 moved the classic converters behind
  * `org.apache.spark.sql.classic`).
  */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. `expression` above wraps the
    * column's node in a lazy `ColumnNodeExpression` (Unevaluable) that only
    * the session's own analysis pass unwraps — returning it from a
    * FunctionRegistry builder (mid-analysis) leaves it unevaluable at
    * codegen time. This converts through the classic ColumnNode converter
    * immediately, yielding a plain catalyst tree (possibly with
    * UnresolvedFunction children, which the analyzer's fixed-point pass
    * then resolves normally). */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Rebind a DataFrame's analyzed logical plan onto another session of the
    * SAME SparkContext (`spark.newSession()`), so a pipeline can run under
    * isolated SQLConf (e.g. AQE scoped off) without mutating the caller's
    * session — the shared cache manager still recognizes persisted child
    * plans by canonical form, so cached inputs stay cached. This is the
    * `Dataset.ofRows` seam every multi-session Spark library uses; only the
    * plan pointer moves, nothing is re-executed.
    */
  def rebind(df: DataFrame, target: SparkSession): DataFrame =
    classic.Dataset.ofRows(
      target.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical)
}
