package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression conversion (Spark 4 moved
  * the Column(expr) constructor behind `classic.ExpressionUtils`). Lives
  * in the org.apache.spark.sql package purely for access; no Spark
  * internals are modified.
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when the session holds no cached (InMemoryRelation) plans —
    * lets tests assert the library's scoped-cache contract
    * (`CacheScope`: no cache outlives the operator call).
    */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
