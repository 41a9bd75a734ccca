package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql-package-private Column ↔ Expression converters,
  * needed to expose a custom Catalyst [[Expression]] through the public
  * Column API without registering a session extension. This is the
  * conventional shim used by Spark-native extension libraries: the
  * converters are `private[sql]`, so the bridge lives inside the
  * org.apache.spark.sql package and re-exports exactly the two calls
  * (plus the `AbstractDataType` name that `ExpectsInputTypes`
  * signatures require). No behavior here — aliases only.
  */
object GraftShims {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
