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

  /** Magic + version prefix of every [[sketchBytes]] artifact. A bare
    * 1-byte tag was the whole header before; a corrupted/truncated blob
    * whose first byte happened to be 0 and whose next bytes parsed as a
    * UTF type string would then be accepted as a legal "empty dimension"
    * and silently filter out EVERY fact row. The probe now requires this
    * exact string first, so foreign bytes fail loudly instead.
    *
    * MIGRATION NOTE: artifacts persisted by the pre-magic format (bare
    * `[tag][ddl][bits]`, shipped before this header existed) fail the
    * probe LOUDLY with the missing-header message — deliberately no
    * legacy sniff, because the legacy header is exactly the ambiguous
    * shape this magic exists to reject (a corrupted blob can parse as
    * it). Rebuild persisted sketches with [[sketchBytes]] once on
    * upgrade; a build is one dimension scan, the same cost the original
    * artifact took to write.
    */
  private val Magic = "graft-bloomsketch:v1"

  /** Build `dim`'s key sketch as a SELF-DESCRIBING serialized artifact —
    * the persistable/reusable form of the prefilter's build side. Write
    * the bytes anywhere (a file, a table cell, a stream checkpoint dir)
    * and probe them later with the `prefilter(fact, factKey, sketch)`
    * overload: a streaming gate cold-starts without re-scanning the
    * dimension, and several pipelines can gate on one build pass.
    *
    * Format: `[magic "graft-bloomsketch:v1", UTF][tag: 0 = empty dim,
    * 1 = sketch follows][dim-key type DDL, UTF][bloom bits]`. The
    * recorded key type lets the probe side re-derive the key
    * representation and keep the loud mixed-numeric rejection — a sketch
    * is only probeable by keys that map equal values to equal longs (see
    * [[keyRepr]]). An empty dimension is a legal artifact (tag 0, a few
    * header bytes): probing it yields zero survivors, the correct
    * prefilter answer.
    *
    * COMPATIBILITY: artifacts written by the pre-magic format (before
    * the `graft-bloomsketch:v1` header) are rejected loudly by
    * `prefilter` — rebuild them once on upgrade (see [[Magic]] for why
    * no legacy sniff exists).
    *
    * @param expectedItems sizing for the sketch (overestimate = more bits,
    *                      never lost keys); pass the dimension's
    *                      (approximate) distinct key count
    */
  def sketchBytes(
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    val dimType = dim.schema(dimKey).dataType
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeUTF(Magic)
    // an EMPTY dimension matches nothing — record exactly that:
    // stat.bloomFilter NPEs on zero rows (its merge starts from a null
    // buffer), and "no dim keys → no fact survivors" is the correct
    // prefilter answer anyway. limit(1) keeps the eager probe cheap.
    if (dim.select(col(dimKey)).limit(1).isEmpty) {
      out.writeByte(0)
      out.writeUTF(dimType.catalogString)
    } else {
      out.writeByte(1)
      out.writeUTF(dimType.catalogString)
      dim.stat.bloomFilter(keyRepr(dimType, dimType)(col(dimKey)),
        expectedItems, fpp).writeTo(out)
    }
    out.flush()
    bos.toByteArray
  }

  /** Probe a [[sketchBytes]] artifact: `fact` reduced to rows whose
    * `factKey` might be in the sketched dimension key set. Same
    * exact-superset guarantee as the DataFrame form — byte-identical
    * survivors, since the bits and the probe expression are the same.
    */
  def prefilter(fact: DataFrame, factKey: String, sketch: Array[Byte]): DataFrame = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(sketch))
    // verify the magic BEFORE trusting anything else in the blob — see
    // [[Magic]]; readUTF on garbage throws (also the desired loud failure)
    val magic = scala.util.Try(in.readUTF()).getOrElse("")
    require(magic == Magic,
      s"not a BloomJoin.sketchBytes artifact (missing '$Magic' header)")
    val tag = in.readByte()
    require(tag == 0 || tag == 1, s"not a BloomJoin.sketchBytes artifact (tag $tag)")
    val dimType = org.apache.spark.sql.types.DataType.fromDDL(in.readUTF())
    // derive the representation BEFORE the empty short-circuit so a
    // mixed-numeric probe is rejected loudly even against an empty sketch
    val repr = keyRepr(fact.schema(factKey).dataType, dimType)
    if (tag == 0) return fact.filter(lit(false))
    val bytes = in.readAllBytes()
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType), ColumnBridge.expression(repr(col(factKey)))))
    fact.filter(mightContain)
  }

  /** Build a bloom sketch of `dim`'s `dimKey` values and return `fact`
    * reduced to rows whose `factKey` might be in it. Exact-superset
    * guarantee: every fact row with a real match survives; impostors are
    * ≤ fpp of the rest and must be removed by the exact join that follows.
    * One-shot convenience over [[sketchBytes]] + the byte-probing
    * overload — keep the bytes instead when the sketch outlives one query.
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
      fpp: Double = 0.01): DataFrame =
    prefilter(fact, factKey, sketchBytes(dim, dimKey, expectedItems, fpp))

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
