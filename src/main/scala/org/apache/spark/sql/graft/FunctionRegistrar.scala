package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.classic.SparkSession

/** Runtime twin of graft.functions.GraftExtensions for sessions that are
  * already running (tests, shells): registers the graft SQL functions on
  * the session's function registry. Lives in the org.apache.spark.sql
  * namespace because `sessionState` is `private[sql]` — the same
  * supported seam ColumnBridge uses.
  */
object FunctionRegistrar {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[SparkSession].sessionState.functionRegistry
    graft.functions.GraftExtensions.definitions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
