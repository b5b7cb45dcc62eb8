package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, ByteType, IntegerType, LongType, ShortType}

/** Bloom-prefiltered join — an explicit, cross-stage form of Spark's
  * runtime row-level filtering: condense the (filtered) dimension side's
  * join keys into a compact bloom sketch, broadcast it inside a single
  * codegen'd predicate, and drop non-matching fact rows BEFORE the join
  * shuffle. The exact join then removes the sketch's false positives, so
  * results are identical to the plain join while shuffle volume shrinks
  * to ~(matching rows + fpp × fact rows).
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the selected slice whenever the dimension is too
  * big to broadcast outright (so no BroadcastHashJoin) but its KEY SET
  * fits a few MB of bloom bits (1.2 MB per million keys at 1% fpp).
  * Spark's own `runtime.bloomFilter` optimization plans this shape only
  * within one query and under size thresholds; the operator makes it a
  * deliberate, reusable step — the sketch can also gate later pipelines
  * (e.g. a dedup keep-set) without re-reading the dimension.
  *
  * Mechanics: the sketch is built distributed (`DataFrame.stat
  * .bloomFilter`, one pass, mergeable OR-combine → deterministic bits)
  * and probed through Spark's own `BloomFilterMightContain` expression —
  * whole-stage-codegen'd, the bloom deserialized once per task, not per
  * row. Only the serialized bits (not the keys) hit the driver.
  *
  * Extension operator: the reference joins always fetch both inputs in
  * full (reference: hash_join.py:354-592 scans, then joins); its only
  * fetch-reduction device is the DSE direct join (hash_join.py:613-646),
  * which needs the key to be the partition key. A bloom prefilter is the
  * engine-agnostic counterpart with no key-layout precondition.
  */
object BloomJoin {

  /** Probe representation: integral keys go in as longs (the sketch's
    * native `putLong`); other types hash to a long with xxhash64. Build
    * and probe sides MUST map equal keys to equal longs, so the decision
    * is made over BOTH types at once — and mixed numeric types (e.g.
    * double fact key vs int dim key, where SQL equality coerces but both
    * long-cast and xxhash64 representations diverge) are rejected loudly
    * instead of silently dropping true matches.
    */
  private def keyRepr(
      factType: org.apache.spark.sql.types.DataType,
      dimType: org.apache.spark.sql.types.DataType): Column => Column = {
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    if (integral(factType) && integral(dimType)) c => c.cast("long")
    else if (factType == dimType) c => xxhash64(c)
    else throw new IllegalArgumentException(
      s"bloom join keys must both be integral or share one type, got " +
        s"$factType vs $dimType — cast both sides to a common type first")
  }

  /** Build a bloom sketch of `dim`'s `dimKey` values and return `fact`
    * reduced to rows whose `factKey` might be in it. Exact-superset
    * guarantee: every fact row with a real match survives; impostors are
    * ≤ fpp of the rest and must be removed by the exact join that follows.
    *
    * @param expectedItems sizing for the sketch (overestimate = more bits,
    *                      never lost keys); pass the dimension's
    *                      (approximate) distinct key count
    */
  def prefilter(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val repr = keyRepr(
      fact.schema(factKey).dataType, dim.schema(dimKey).dataType)
    // an EMPTY dimension matches nothing — return that directly:
    // stat.bloomFilter NPEs on zero rows (its merge starts from a null
    // buffer), and "no dim keys → no fact survivors" is the correct
    // prefilter answer anyway. limit(1) keeps the eager probe cheap.
    if (dim.select(col(dimKey)).limit(1).isEmpty) return fact.filter(lit(false))
    val bf = dim.stat.bloomFilter(repr(col(dimKey)), expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType), ColumnBridge.expression(repr(col(factKey)))))
    fact.filter(mightContain)
  }

  /** Prefilter + exact equi-join: result rows are exactly
    * `fact ⋈ dim` (false positives die in the join), with the fact-side
    * shuffle reduced to the bloom survivors.
    */
  def innerJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    prefilter(fact, factKey, dim, dimKey, expectedItems, fpp)
      .join(dim, col(factKey) === col(dimKey))
}
