package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregator: union of MinHash signatures by elementwise
  * minimum. The MinHash property makes this exact: sig(A ∪ B) =
  * min(sig(A), sig(B)) elementwise, so group/partition/cluster signatures
  * can be maintained INCREMENTALLY — merge a new batch's signature into
  * yesterday's without revisiting old shingles. That is the sketch that
  * makes fleet-wide dedup feasible at 100 TB: signatures are a few hundred
  * bytes per group regardless of text volume, and the merge is
  * associative + commutative, so Spark's partial aggregation applies.
  */
class MinHashUnion(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(acc: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (sig(i) < acc(i)) acc(i) = sig(i); i += 1 }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(acc: Array[Long]): Seq[Long] = acc.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
