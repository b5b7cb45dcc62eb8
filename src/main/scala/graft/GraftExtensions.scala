package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extensions entry point — the deployment-time registration
  * route for the engine's native SQL functions:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  * Injects the same builder table [[graft.functions.GraftFunctions
  * .register]] applies to a live session, so the two routes cannot
  * drift. Cassandra deployments stack this next to the connector's
  * `CassandraSparkExtensions` — `spark.sql.extensions` is comma-separated
  * (see [[graft.sources.CassandraConfig]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.all.foreach(extensions.injectFunction)
}
