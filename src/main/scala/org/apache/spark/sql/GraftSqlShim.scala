package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSparkSession}

/** Minimal bridge into the `private[sql]` Dataset factory, so a custom
  * logical plan (graft.plans.AsOfJoin) can surface as an ordinary
  * DataFrame. This is the standard extension-point shim a Spark
  * library with its own LogicalPlan ships; it touches nothing but the
  * one factory method. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Column -> Catalyst Expression (the 4.x ColumnNode bridge). */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** `DataType.sameType` (nullability-insensitive equality) is
    * `private[spark]`; expose it for type-compatibility checks. */
  def sameType(a: types.DataType, b: types.DataType): Boolean = a.sameType(b)

  /** Is `dt` an integral type (`private[spark]` IntegralType)? */
  def isIntegral(dt: types.DataType): Boolean = dt.isInstanceOf[types.IntegralType]
}
