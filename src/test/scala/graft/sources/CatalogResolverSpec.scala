package graft.sources

import graft.TestSpark
import graft.core.TableInfo
import graft.operators.HashJoinExecutor

import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.scalatest.funsuite.AnyFunSuite

/** J9 seam: the executor facade running against a Spark *catalog* instead
  * of parquet paths — the resolution path a Spark Cassandra Connector
  * `CassandraCatalog` deployment uses (CatalogResolver docs /
  * CassandraConfig). The session catalog stands in for the connector here
  * (offline build, no jar); the facade code path is identical.
  */
class CatalogResolverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def users: DataFrame = Seq((1L, "ann"), (2L, "bob"), (3L, "cat")).toDF("uid", "name")
  private def orders: DataFrame = Seq((1L, "o1", 10.0), (1L, "o2", 20.0), (2L, "o3", 30.0))
    .toDF("uid", "oname", "amount")

  test("facade joins through a catalog namespace (session temp views)") {
    users.createOrReplaceTempView("cat_users")
    orders.createOrReplaceTempView("cat_orders")
    val out = new HashJoinExecutor(spark, new CatalogResolver())
      .join(TableInfo("cat_users", "uid"), TableInfo("cat_orders", "uid"))
      .execute()
    assert(out.count() == 3)
    assert(out.columns.contains("cat_users__name") && out.columns.contains("cat_orders__amount"))
  }

  test("facade joins through a two-part namespace (global_temp = catalog.db stand-in)") {
    users.createOrReplaceGlobalTempView("ks_users")
    orders.createOrReplaceGlobalTempView("ks_orders")
    val out = new HashJoinExecutor(spark, new CatalogResolver(Seq("global_temp")))
      .join(TableInfo("ks_users", "uid"), TableInfo("ks_orders", "uid"))
      .execute()
    assert(out.count() == 3)
  }

  test("catalog resolver result agrees with in-memory resolver (differential)") {
    users.createOrReplaceTempView("cat_users")
    orders.createOrReplaceTempView("cat_orders")
    val viaCatalog = new HashJoinExecutor(spark, new CatalogResolver())
      .join(TableInfo("cat_users", "uid"), TableInfo("cat_orders", "uid")).execute()
    val viaMem = new HashJoinExecutor(spark,
      new InMemoryResolver(Map("cat_users" -> users, "cat_orders" -> orders)))
      .join(TableInfo("cat_users", "uid"), TableInfo("cat_orders", "uid")).execute()
    assert(viaCatalog.exceptAll(viaMem).isEmpty && viaMem.exceptAll(viaCatalog).isEmpty)
  }

  test("unknown table surfaces the catalog's resolution error") {
    assertThrows[AnalysisException] {
      new CatalogResolver().resolve(spark, "graft_no_such_table").schema
    }
  }

  test("CassandraConfig deployment bundle carries the full J9/S2 contract") {
    val conf = CassandraConfig.deployment("cass", "10.0.0.1", "ks")
    assert(conf("spark.sql.extensions") ==
      "com.datastax.spark.connector.CassandraSparkExtensions")
    assert(conf("spark.sql.catalog.cass") ==
      "com.datastax.spark.connector.datasource.CassandraCatalog")
    assert(conf("spark.sql.catalog.cass.spark.cassandra.connection.host") == "10.0.0.1")
    assert(conf("directJoinSetting") == "auto")
    assert(conf.contains("spark.cassandra.input.split.sizeInMB"))
    assert(conf.contains("spark.cassandra.input.fetch.sizeInRows"))
    assert(conf("spark.sql.defaultCatalog") == "cass")
  }

  test("CassandraConfig validates its knobs") {
    assertThrows[IllegalArgumentException](CassandraConfig.directJoin("sometimes"))
    assertThrows[IllegalArgumentException](CassandraConfig.tokenRangeScan(splitSizeMB = 0))
  }

  // ---- DSv2 mock-catalog contract (J9/S2 without a live cluster) ---------

  private def registerMockCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.mockcass", classOf[MockCassandraCatalog].getName)
    // CassandraConfig.catalog's settings use the same spark.sql.catalog.<name>.*
    // prefix the connector uses; Spark hands them to initialize() prefix-stripped
    CassandraConfig.catalog("mockcass", host = "10.9.9.9", port = 9999)
      .foreach { case (k, v) =>
        if (k != "spark.sql.catalog.mockcass") spark.conf.set(k, v)
      }
  }

  test("facade joins through a DSv2 catalog shaped like CassandraCatalog") {
    registerMockCatalog()
    val out = new HashJoinExecutor(spark, new CatalogResolver(Seq("mockcass", "ks")))
      .join(TableInfo("users", "uid"), TableInfo("orders", "uid"))
      .execute()
    // orders uid ∈ 2..12 (i%12+1, 30 orders), all present in users 1..12
    assert(out.count() == 30)
    assert(out.columns.contains("users__name") && out.columns.contains("orders__amount"))
  }

  test("catalog options flow to the connector-shaped initialize()") {
    registerMockCatalog()
    spark.table("mockcass.ks.users").count() // force catalog instantiation
    val opts = MockCassandraCatalog.capturedOptions
    assert(opts.get("spark.cassandra.connection.host").contains("10.9.9.9"))
    assert(opts.get("spark.cassandra.connection.port").contains("9999"))
  }

  test("scan fans out one Spark partition per token range (S2)") {
    registerMockCatalog()
    val df = spark.table("mockcass.ks.orders")
    assert(df.rdd.getNumPartitions == MockCassandraCatalog.TokenRanges)
    assert(df.count() == 30) // every range's rows arrive exactly once
  }

  test("direct-join gate: PK coverage decides eligibility (hash_join.py:811-818)") {
    registerMockCatalog()
    val users = MockCassandraCatalog.tables("users")   // PK (uid)
    val orders = MockCassandraCatalog.tables("orders") // PK (uid, oname)
    // single-key PK covered by the join column → direct join legal
    assert(DirectJoin.eligible(users.partitionKey, Seq("uid")))
    // composite PK only partially covered → ILLEGAL (point reads can't
    // enumerate matches) — the reference's subset check rejects this too
    assert(!DirectJoin.eligible(orders.partitionKey, Seq("uid")))
    assert(DirectJoin.eligible(orders.partitionKey, Seq("uid", "oname", "extra")))
    // PK metadata round-trips through the DSv2 table properties
    assert(users.properties().get("partition_key") == "uid")
    assert(orders.properties().get("partition_key") == "uid,oname")
  }

  test("direct-join decision: setting × size ratio, both ways") {
    val pk = Seq("uid")
    // auto: small key side → point-read; big key side → full scan
    assert(DirectJoin.decide("auto", pk, Seq("uid"), keySideBytes = 1L << 20,
      targetTableBytes = 1L << 40))
    assert(!DirectJoin.decide("auto", pk, Seq("uid"), keySideBytes = 1L << 40,
      targetTableBytes = 1L << 20))
    // off always scans, even when eligible and tiny
    assert(!DirectJoin.decide("off", pk, Seq("uid"), 1L, 1L << 40))
    // on forces the rewrite — but never past the correctness gate
    assert(DirectJoin.decide("on", pk, Seq("uid"), 1L << 40, 1L))
    assert(!DirectJoin.decide("on", Seq("uid", "oname"), Seq("uid"), 1L, 1L << 40))
    assertThrows[IllegalArgumentException](
      DirectJoin.decide("sometimes", pk, Seq("uid"), 1L, 1L))
  }
}
