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
}
