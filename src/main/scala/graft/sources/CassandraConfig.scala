package graft.sources

/** Config mapping from the reference's Cassandra execution machinery to the
  * Spark Cassandra Connector's settings — the J9/S2/X1 parity contract.
  *
  * The reference implements three Cassandra-specific mechanisms by hand:
  *
  *  1. '''DSE direct join''' (hash_join.py:613-646): when one side of the
  *     join is small, it prepares per-token-range
  *     `token(pk) > ? AND token(pk) < ?` statements and point-reads only the
  *     matching partitions of the big table. Spark-side equivalent: the
  *     connector's `DirectJoinStrategy`, a Catalyst strategy (registered via
  *     `CassandraSparkExtensions`) that rewrites a join against a Cassandra
  *     table into per-key point reads when the other side is small enough —
  *     same optimization, chosen by the planner instead of by hand.
  *  2. '''Token-range fan-out''' (join_executor.py:254-265): it walks the
  *     cluster token ring, groups ranges by replica host, and ships a
  *     pickled executor per host over RabbitMQ. Spark-side equivalent: the
  *     connector's input partitioning — every Spark partition IS a
  *     token-range slice (sized by `input.split.sizeInMB`) with replica
  *     locality hints; the Spark scheduler replaces the message queue.
  *  3. '''Paged fetch''' (`cassandra_fetch_size`, hash_join.py:651): maps
  *     directly to `input.fetch.sizeInRows`.
  *
  * Everything here is plain strings — no connector classes are referenced,
  * so this compiles (and the contract is spec-testable) in an offline build;
  * the jar (`com.datastax.spark:spark-cassandra-connector_2.13`) is only
  * needed at deployment. [[CatalogResolver]] consumes the catalog these
  * settings register.
  */
object CassandraConfig {

  /** Must be set BEFORE the session is built — injects the connector's
    * Catalyst rules, including `DirectJoinStrategy` (J9).
    */
  val extensions: (String, String) =
    "spark.sql.extensions" -> "com.datastax.spark.connector.CassandraSparkExtensions"

  /** Register a Cassandra keyspace tree as Spark catalog `name`; after
    * this, `CatalogResolver(Seq(name, keyspace))` resolves every table.
    */
  def catalog(
      name: String,
      host: String,
      port: Int = 9042,
      localDc: Option[String] = None): Map[String, String] = {
    val base = Map(
      s"spark.sql.catalog.$name" ->
        "com.datastax.spark.connector.datasource.CassandraCatalog",
      s"spark.sql.catalog.$name.spark.cassandra.connection.host" -> host,
      s"spark.sql.catalog.$name.spark.cassandra.connection.port" -> port.toString)
    localDc.fold(base)(dc =>
      base + (s"spark.sql.catalog.$name.spark.cassandra.connection.localDC" -> dc))
  }

  /** Direct-join control (reference `is_DSE_direct_join`). `setting` is
    * `"on"` (always point-read), `"off"` (always full scan + shuffle), or
    * `"auto"` (planner decides when the key side is < `sizeRatio` × the
    * Cassandra table's estimated size — the connector analog of the
    * reference's hand-rolled small-side check).
    */
  def directJoin(setting: String = "auto", sizeRatio: Double = 0.9): Map[String, String] = {
    require(Set("on", "off", "auto")(setting), s"directJoin setting must be on|off|auto, got '$setting'")
    Map(
      "spark.sql.dse.search.enableOptimization" -> "off",
      "directJoinSetting" -> setting,
      "directJoinSizeRatio" -> sizeRatio.toString)
  }

  /** Token-range scan shape (reference token-ring walk + fetch paging).
    * `splitSizeMB` bounds a partition's data volume — at 100 TB this is the
    * parallelism knob (64 MB → ~1.6M splits, coalesced by the connector's
    * estimator); `fetchSizeRows` is the CQL page size per round-trip.
    */
  def tokenRangeScan(splitSizeMB: Int = 64, fetchSizeRows: Int = 1000): Map[String, String] = {
    require(splitSizeMB > 0 && fetchSizeRows > 0, "split/fetch sizes must be positive")
    Map(
      "spark.cassandra.input.split.sizeInMB" -> splitSizeMB.toString,
      "spark.cassandra.input.fetch.sizeInRows" -> fetchSizeRows.toString)
  }

  /** One-call bundle: everything a SparkSession.builder needs for a
    * keyspace-backed deployment of the executor facade.
    */
  def deployment(
      catalogName: String,
      host: String,
      keyspace: String,
      directJoinSetting: String = "auto"): Map[String, String] =
    Map(extensions) ++ catalog(catalogName, host) ++ directJoin(directJoinSetting) ++
      tokenRangeScan() +
      ("spark.sql.defaultCatalog" -> catalogName)
}
