package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Bridge into the `private[sql]` session state — the supported seam for
  * libraries that register native functions on a live session (the
  * config-time route is `spark.sql.extensions`, see
  * [[graft.GraftExtensions]]).
  */
object SessionBridge {
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
}
