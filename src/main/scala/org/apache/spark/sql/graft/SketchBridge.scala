package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bridge to the Bloom-filter expressions Spark ships for its own runtime
  * row-level join filtering (`InjectRuntimeFilter`) but does not register
  * in the SQL function registry. Both are ordinary Catalyst expressions —
  * the aggregate builds a serialized `org.apache.spark.util.sketch
  * .BloomFilter` (binary), the probe tests a LONG against it with
  * codegen — so exposing them as `Column`s lets the library state the
  * same scan-side pruning EXPLICITLY, across queries and persisted
  * artifacts, where the optimizer's automatic injection cannot see the
  * reuse.
  */
object SketchBridge {

  /** Aggregate a LONG (hash) column into a serialized Bloom filter.
    * Returns NULL on empty input (the aggregate's own semantics — callers
    * must treat a null filter as "nothing can match").
    *
    * @param numBits sized by the caller; Spark caps it at
    *   `spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`-
    *   family limits (default max 67108864 bits = 8 MB serialized).
    */
  def bloomFilterAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(hashed),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of a LONG (hash) value against a serialized filter.
    * The filter side must be a CONSTANT (a `lit(bytes)` model artifact) —
    * the expression's own contract; it deserializes the filter once per
    * task, not per row.
    */
  def mightContain(bloom: Column, hashed: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hashed)))
}
