package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface of Spark 4.x.
  *
  * Spark 4 wraps `Column` around ColumnNode; building a `Column` from a
  * Catalyst `Expression`, and reaching the session FunctionRegistry, are
  * `private[sql]`. This shim lives inside the `org.apache.spark.sql`
  * package purely to re-export those two capabilities — the standard
  * pattern for Spark-native extension libraries. No Spark behavior is
  * modified.
  */
object Shim {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the listener bus so `QueryExecutionListener.onSuccess` (which
    * delivers `Dataset.observe` metrics asynchronously) has fired before
    * the caller reads them. `listenerBus` is `private[spark]`; this shim
    * package sits under `org.apache.spark` for exactly this bridge. */
  def awaitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register a temp function builder on an already-built session (the
    * `withExtensions` path in [[graft.expr.GraftExtensions]] is preferred;
    * this covers sessions we didn't construct). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
