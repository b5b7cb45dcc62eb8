package graft.operators

import graft.TestSpark
import graft.core.TableInfo
import graft.sources.InMemoryResolver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based join-algebra invariants (SURVEY.md §5.3): for arbitrary
  * small tables with nullable, collision-heavy keys,
  *   inner ⊆ left ⊆ full (as row multisets),
  *   left(A,B) ≡ column-mirror of right(B,A),
  *   θ-join ≡ cross-join + filter,
  *   null keys never appear in inner results,
  *   hash path ≡ nested path on equi-joins.
  *
  * Generators are seeded deterministically so failures reproduce.
  */
class JoinPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // keys drawn from a small domain to force collisions; ~20% nulls
  private val rowsGen: Gen[List[(Option[Long], Long)]] =
    Gen.choose(0, 12).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.frequency(4 -> Gen.choose(0L, 4L).map(Some(_)), 1 -> Gen.const(None))
        v <- Gen.choose(0L, 99L)
      } yield (k, v))
    }

  private def sample(seed: Long): List[(Option[Long], Long)] =
    rowsGen.pureApply(Gen.Parameters.default, Seed(seed))

  private def cases(n: Int): Seq[(DataFrame, DataFrame)] =
    (1 to n).map(i => (sample(i).toDF("k", "v"), sample(1000L + i).toDF("k", "v")))

  private def resolver(l: DataFrame, r: DataFrame) =
    new InMemoryResolver(Map("l" -> l, "r" -> r))

  private def runJoin(l: DataFrame, r: DataFrame, kind: String, nested: Boolean = false): DataFrame = {
    val ex = if (nested) new NestedJoinExecutor(spark, resolver(l, r))
    else new HashJoinExecutor(spark, resolver(l, r))
    val (lt, rt) = (TableInfo("l", "k"), TableInfo("r", "k"))
    (kind match {
      case "inner" => ex.join(lt, rt)
      case "left"  => ex.leftJoin(lt, rt)
      case "full"  => ex.fullOuterJoin(lt, rt)
    }).execute()
  }

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).map { case (k, v) => k -> v.length }

  private def subMultiset(a: Map[String, Int], b: Map[String, Int]): Boolean =
    a.forall { case (k, n) => b.getOrElse(k, 0) >= n }

  test("inner ⊆ left ⊆ full as row multisets") {
    cases(10).foreach { case (l, r) =>
      val inner = multiset(runJoin(l, r, "inner"))
      val left = multiset(runJoin(l, r, "left"))
      val full = multiset(runJoin(l, r, "full"))
      assert(subMultiset(inner, left), "inner ⊄ left")
      assert(subMultiset(left, full), "left ⊄ full")
    }
  }

  test("left(A,B) equals column-mirror of right(B,A)") {
    cases(10).foreach { case (l, r) =>
      val a = runJoin(l, r, "left").select("l__k", "l__v", "r__k", "r__v")
      val mirrored = new HashJoinExecutor(spark, resolver(l, r))
        .rightJoin(TableInfo("r", "k"), TableInfo("l", "k")).execute()
        .select("l__k", "l__v", "r__k", "r__v")
      assert(multiset(a) == multiset(mirrored))
    }
  }

  test("theta join equals cross join + filter; hash ≡ nested on equality") {
    cases(8).foreach { case (l, r) =>
      val thetaLt = new NestedJoinExecutor(spark, resolver(l, r))
        .join(TableInfo("l", "k"), TableInfo("r", "v"), "<").execute()
      val manual = l.select(col("k").as("lk")).crossJoin(r.select(col("v").as("rv")))
        .filter(col("lk") < col("rv"))
      assert(thetaLt.count() == manual.count())
      assert(multiset(runJoin(l, r, "inner", nested = true)) ==
        multiset(runJoin(l, r, "inner")))
    }
  }

  test("null keys never appear in inner results") {
    cases(10).foreach { case (l, r) =>
      val inner = runJoin(l, r, "inner")
      assert(inner.filter(col("l__k").isNull || col("r__k").isNull).count() == 0)
    }
  }
}
