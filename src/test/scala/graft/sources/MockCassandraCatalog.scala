package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Test stand-in for the Spark Cassandra Connector's `CassandraCatalog`: a
  * DSv2 `TableCatalog` whose tables read like Cassandra tables read —
  * every Spark input partition is one token-range slice of the ring (rows
  * land in the slice that owns `hash(pk)`), and each table carries its
  * partition-key metadata in `properties()` the way the connector surfaces
  * `partition_key`. This lets `CatalogResolverSpec` drive the ENTIRE
  * J9/S2 contract — catalog registration via `spark.sql.catalog.*` conf,
  * option plumbing, namespace resolution, token-range fan-out, and the
  * direct-join PK gate — with zero cluster.
  *
  * Shapes mirrored from the reference: token-range fan-out
  * (join_executor.py:254-265 walks the ring and fans out one unit of work
  * per range — here `planInputPartitions` returns one `InputPartition`
  * per range); PK metadata for the direct-join gate (hash_join.py:811-818
  * reads `get_pk_columns_of_table`).
  */
class MockCassandraCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    MockCassandraCatalog.capturedOptions = options.asCaseSensitiveMap().asScala.toMap
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    MockCassandraCatalog.tables.keys
      .map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): Table =
    MockCassandraCatalog.tables.get(ident.name()) match {
      case Some(t) if ident.namespace().sameElements(Array("ks")) => t
      case _ => throw new NoSuchTableException(ident.namespace() :+ ident.name())
    }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("read-only mock")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only mock")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only mock")
}

object MockCassandraCatalog {
  /** Options the catalog was initialized with — the spec asserts that
    * `CassandraConfig.catalog(...)`'s `spark.sql.catalog.<name>.*` settings
    * arrive here (prefix-stripped), exactly how the real connector receives
    * its connection config.
    */
  @volatile var capturedOptions: Map[String, String] = Map.empty

  val TokenRanges = 4 // ring slices; one Spark partition per range

  private def usersSchema = StructType(Seq(
    StructField("uid", LongType), StructField("name", StringType)))
  private def ordersSchema = StructType(Seq(
    StructField("uid", LongType), StructField("oname", StringType),
    StructField("amount", DoubleType)))

  private val usersRows: Seq[Seq[Any]] =
    (1L to 12L).map(i => Seq[Any](i, s"user$i"))
  private val ordersRows: Seq[Seq[Any]] =
    (1L to 30L).map(i => Seq[Any](i % 12 + 1, s"o$i", i * 10.0))

  val tables: Map[String, MockCassTable] = Map(
    "users" -> new MockCassTable("users", usersSchema, Seq("uid"), usersRows),
    "orders" -> new MockCassTable("orders", ordersSchema, Seq("uid", "oname"), ordersRows))
}

/** One Cassandra-like table: partition-key hash routes each row to one of
  * [[MockCassandraCatalog.TokenRanges]] token-range slices.
  */
class MockCassTable(
    tableName: String,
    tableSchema: StructType,
    pks: Seq[String],
    rows: Seq[Seq[Any]]) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  /** Connector-parity metadata: the direct-join gate reads the partition
    * key from here (reference reads system_schema, utils.py:461-472).
    */
  override def properties(): util.Map[String, String] =
    Map("partition_key" -> pks.mkString(",")).asJava

  /** The table's partition key, as [[DirectJoin.eligible]] consumes it. */
  def partitionKey: Seq[String] = pks

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            val pkIdx = pks.map(tableSchema.fieldIndex)
            val slices = rows.groupBy { r =>
              math.floorMod(pkIdx.map(r(_)).hashCode(), MockCassandraCatalog.TokenRanges)
            }
            (0 until MockCassandraCatalog.TokenRanges).map { i =>
              TokenRangeSlice(i, slices.getOrElse(i, Nil)): InputPartition
            }.toArray
          }
          override def createReaderFactory(): PartitionReaderFactory =
            new MockRowReaderFactory()
        }
      }
    }
}

/** One token range's rows (the reference ships one executor per range over
  * its queue; Spark ships one task per InputPartition — same fan-out).
  */
case class TokenRangeSlice(rangeId: Int, rows: Seq[Seq[Any]]) extends InputPartition

class MockRowReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[TokenRangeSlice]
    new PartitionReader[InternalRow] {
      private val it = slice.rows.iterator
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        current = InternalRow.fromSeq(it.next().map {
          case s: String => UTF8String.fromString(s)
          case v => v
        })
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
