package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of fact rows share one key — the shape that pins a plain shuffle
  // join's hot partition to a single task
  private def fact = Seq.tabulate(1000) { i =>
    (i.toLong, if (i < 900) "hot" else s"k${i % 7}", i * 2L)
  }.toDF("row_id", "key", "payload")

  private def dim = Seq(
    ("hot", 1L), ("k1", 10L), ("k3", 30L), ("k5", 50L), ("zz", 99L)
  ).toDF("dkey", "dval")

  test("salted inner join is row-identical to the plain join on skewed keys") {
    val plain = fact.join(dim, col("key") === col("dkey"))
      .select("row_id", "key", "payload", "dval")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    val salted = SkewJoin.salted(
      fact.hint("merge"), col("key"), col("row_id"),
      dim.hint("merge"), col("dkey"), saltFactor = 8)
      .select("row_id", "key", "payload", "dval")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    assert(salted == plain)
    // ids 900..999 mod 7: residues 4,5 occur 15×, the rest 14× → k1:14,
    // k3:14, k5:15 matched rows beside the 900 hot ones
    assert(plain.size == 943,
      s"sanity: hot=900 plus the k1/k3/k5 slices, got ${plain.size}")
  }

  test("salted left join preserves unmatched left rows exactly once") {
    val plain = fact.join(dim, col("key") === col("dkey"), "left")
      .select("row_id", "dval").as[(Long, Option[Long])]
      .collect().sorted.toSeq
    val salted = SkewJoin.salted(
      fact, col("key"), col("row_id"), dim, col("dkey"), saltFactor = 4,
      joinType = "left")
      .select("row_id", "dval").as[(Long, Option[Long])]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 1000, "left join must keep every fact row")
  }

  test("the hot key's rows spread across saltFactor shuffle sub-keys") {
    val spread = SkewJoin.salted(
        fact, col("key"), col("row_id"), dim, col("dkey"), saltFactor = 8)
      .filter(col("key") === "hot")
      // re-derive the salt the operator used; distinct sub-keys actually hit
      .select(pmod(hash(col("row_id")), lit(8)).as("salt"))
      .distinct().count()
    assert(spread == 8, s"900 hot rows must scatter over all 8 salts, got $spread")
  }

  test("right and full joins are rejected (replication would duplicate unmatched right rows)") {
    val e = intercept[IllegalArgumentException] {
      SkewJoin.salted(fact, col("key"), col("row_id"), dim, col("dkey"),
        saltFactor = 4, joinType = "full")
    }
    assert(e.getMessage.contains("inner/left"))
  }
}
