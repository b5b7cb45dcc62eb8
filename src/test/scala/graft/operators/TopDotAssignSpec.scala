package graft.operators

import graft.TestSpark

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r18 zero-exchange IVF assignment fast path
  * ([[graft.functions.TopDotIds]] / [[graft.functions.ExpandIds]] via
  * [[Similarity.collectCentModel]]) BIT-IDENTICAL to the exchange
  * (crossJoin × window) formulation it replaces, on corpora built to hit
  * the edge semantics the window plan owns: NULL vectors, ragged
  * dimensions, zero vectors (NULL unit grid), exact dot ties, keep >
  * candidate count, sparse/offset centroid ids, and the hierarchical
  * filing's self-preference and rank-pick rules.
  *
  * Known deliberate boundary (documented, not pinned): rows with a NULL
  * id — the window groups all NULL ids into ONE partition (one shared
  * top-keep), the fast path ranks per row. No declared corpus carries
  * NULL vector ids (generated keys).
  */
class TopDotAssignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random floats (integer LCG, no RNG object). */
  private def f(i: Long, d: Int): Float = {
    val x = (i * 1103515245L + d * 12345L + 54321L) & 0x7fffffffL
    ((x % 2001L) - 1000L).toFloat / 250.0f
  }

  private def vec(i: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(d => f(i, d))

  /** 200-row corpus with the edge rows: NULL vector, ragged dims, zero
    * vector, and duplicate (tie) vectors.
    */
  private def corpus(dim: Int): DataFrame = {
    val normal = (0L until 200L).map(i => (i, vec(i, dim)))
    val edges = Seq(
      (500L, null.asInstanceOf[Array[Float]]), // NULL vector
      (501L, vec(7L, dim + 3)),                // ragged (dim mismatch)
      (502L, Array.fill(dim)(0.0f)),           // zero vector (NULL unit grid)
      (503L, vec(42L, dim)),                   // exact duplicate of id 42
      (504L, vec(42L, dim)))                   // second duplicate (ties)
    (normal ++ edges).toDF("vec_id", "v")
  }

  /** 16 centroids on sparse offset ids (7, 107, 207, ...). */
  private def cents(dim: Int): DataFrame =
    (0L until 16L).map(i => (7L + i * 100L, vec(i * 31L + 3L, dim)))
      .toDF("c_id", "cv")

  private def norm(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("c_id").cast("long"), col("vec_id"))
      .as[(Long, Long)].collect().toSeq.sorted

  test("flat fast path ≡ exchange path (keep 1 and 3, edge rows, ties)") {
    val dim = 8
    val df = corpus(dim)
    val cs = cents(dim)
    val cm = Similarity.collectCentModel(cs)
    assert(cm.isDefined)
    for (keep <- Seq(1, 3, 99)) {
      val fast = Similarity.ivfAssignTo(cs, df, "v", "vec_id", keep, cm)
      val exch = Similarity.ivfAssignToExchange(cs, df, "v", "vec_id", keep)
      assert(fast.schema == exch.schema, s"schema keep=$keep")
      assert(norm(fast) == norm(exch), s"rows keep=$keep")
    }
  }

  test("hier fast path ≡ exchange path across stride/sProbe/keep grid") {
    val dim = 8
    val b = corpus(dim).select(col("vec_id"), col("v"))
    val cs = cents(dim)
    val cm = Similarity.collectCentModel(cs).get
    for {
      stride <- Seq(1, 4, 16, 50) // 50 > |cents| → single super
      sProbe <- Seq(1, 2, 100)    // 100 > |supers|
      keep <- Seq(1, 2)
    } {
      val fast = Similarity.ivfAssignHierFast(b, cm, stride, sProbe, keep)
      val exch = Similarity.ivfAssignHierExchange(b, cs, stride, sProbe, keep)
      assert(norm(fast) == norm(exch),
        s"stride=$stride sProbe=$sProbe keep=$keep")
    }
  }

  test("hier fast ≡ exchange on a tie-heavy centroid set (self-preference)") {
    val dim = 4
    // duplicate centroid vectors across super boundaries: filing ties and
    // the displaced-super scenario (a super's nearest other super shares
    // its vector) — the self-preference rule must keep every super home
    val cs = (0L until 12L).map { i =>
      (i * 10L + 1L, vec((i % 3L) * 17L + 5L, dim)) // only 3 distinct vectors
    }.toDF("c_id", "cv")
    val b = corpus(dim).select(col("vec_id"), col("v"))
    val cm = Similarity.collectCentModel(cs).get
    for (stride <- Seq(2, 3, 5); sProbe <- Seq(1, 2)) {
      val fast = Similarity.ivfAssignHierFast(b, cm, stride, sProbe, 1)
      val exch = Similarity.ivfAssignHierExchange(b, cs, stride, sProbe, 1)
      assert(norm(fast) == norm(exch), s"stride=$stride sProbe=$sProbe")
    }
  }

  test("hierModel filing matches hierC2s/hierSupers row-for-row") {
    val dim = 6
    val cs = cents(dim)
    val cm = Similarity.collectCentModel(cs).get
    for (stride <- Seq(1, 3, 4, 16)) {
      val (sIds, _, members) = Similarity.hierModel(cm, stride)
      val supers = Similarity.hierSupers(cs, stride)
      val c2s = Similarity.hierC2s(cs, supers)
      val wantSupers = supers.select(col("s_id").cast("long"))
        .as[Long].collect().toSeq.sorted
      assert(sIds.toSeq == wantSupers, s"supers stride=$stride")
      val wantFiling = c2s.select(col("s_id").cast("long"),
        col("c_id").cast("long")).as[(Long, Long)].collect().toSeq.sorted
      val gotFiling = sIds.zip(members).flatMap { case (s, ms) =>
        ms.map(c => (s, c)) }.toSeq.sorted
      assert(gotFiling == wantFiling, s"filing stride=$stride")
    }
  }

  test("collectCentModel falls back (None) on non-model-able centroid sets") {
    val dim = 4
    // duplicate ids
    val dup = Seq((1L, vec(1, dim)), (1L, vec(2, dim))).toDF("c_id", "cv")
    assert(Similarity.collectCentModel(dup).isEmpty)
    // NULL centroid vector
    val nullv = Seq((1L, vec(1, dim)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("c_id", "cv")
    assert(Similarity.collectCentModel(nullv).isEmpty)
    // zero centroid vector: unit grid is all-zero (NOT NULL) — model-able,
    // and both paths score it dot=0 against every row
    val zero = Seq((1L, vec(1, dim)), (2L, Array.fill(dim)(0.0f)))
      .toDF("c_id", "cv")
    assert(Similarity.collectCentModel(zero).isDefined)
    // ragged centroid dims
    val ragged = Seq((1L, vec(1, dim)), (2L, vec(2, dim + 1)))
      .toDF("c_id", "cv")
    assert(Similarity.collectCentModel(ragged).isEmpty)
    // non-integral id type stays on the exchange path
    val strId = spark.createDataFrame(
      java.util.Arrays.asList(Row("a", Seq(1.0f, 2.0f, 0.5f, 0.1f))),
      StructType(Seq(StructField("c_id", StringType),
        StructField("cv", ArrayType(FloatType)))))
    assert(Similarity.collectCentModel(strId).isEmpty)
    // empty set
    val empty = Seq.empty[(Long, Array[Float])].toDF("c_id", "cv")
    assert(Similarity.collectCentModel(empty).isEmpty)
    // past the inline cap
    val big = (0L until 8193L).map(i => (i, vec(i, 2))).toDF("c_id", "cv")
    assert(Similarity.collectCentModel(big).isEmpty)
    // and a collectable set really is collected, ids ascending
    val ok = Seq((5L, vec(1, dim)), (2L, vec(2, dim))).toDF("c_id", "cv")
    val cm = Similarity.collectCentModel(ok).get
    assert(cm.ids.toSeq == Seq(2L, 5L) && cm.dim == dim)
  }
}
