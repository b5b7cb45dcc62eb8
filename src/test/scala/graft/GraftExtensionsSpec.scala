package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Both SQL-registration routes expose the native expressions: runtime
  * [[graft.functions.GraftFunctions.register]] on a live session, and
  * config-time [[GraftExtensions]] via `spark.sql.extensions` (a fresh
  * session over the SAME SparkContext — the shared TestSpark context is
  * never stopped).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def checkSql(s: SparkSession): Unit = {
    val r = s.sql(
      """SELECT
        |  round(graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 9) AS c_same,
        |  round(graft_cosine_sim(array(1.0D, 0.0D), array(0.0D, 2.0D)), 9) AS c_orth,
        |  graft_vector_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d_long,
        |  graft_vector_dot(array(1, 2), array(3, 4)) AS d_int_coerced,
        |  graft_vector_dot(array(0.5D, 0.5D), array(2.0D, 2.0D)) AS d_dbl,
        |  graft_polyhash('ab') = graft_polyhash('ab') AS h_stable
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
    assert(r.getLong(2) == 32L) // 4 + 10 + 18
    assert(r.getLong(3) == 11L) // int args coerce to long, stay exact
    assert(r.getDouble(4) == 2.0)
    assert(r.getBoolean(5))
    // float arrays widen to double via the declared input types
    val f = s.sql(
      """SELECT graft_cosine_sim(CAST(array(3.0, 0.0) AS array<float>),
        |                        CAST(array(9.0, 0.0) AS array<float>)) AS c
        |""".stripMargin).collect()(0)
    assert(f.getDouble(0) == 1.0)
    // the assignment grid: unit-grid projection + integer dot — a unit
    // vector self-dots to ~2^40 on the grid, SQL-side like operator-side
    val u = s.sql(
      """SELECT graft_vector_dot(graft_unit_micros(array(0.6D, 0.8D)),
        |                        graft_unit_micros(array(0.6D, 0.8D))) AS selfdot
        |""".stripMargin).collect()(0)
    assert(math.abs(u.getLong(0) - (1L << 40)) <= 4194304L, u.getLong(0).toString)
  }

  test("runtime registration: GraftFunctions.register on the live session") {
    val s = TestSpark.spark
    graft.functions.GraftFunctions.register(s)
    graft.functions.GraftFunctions.register(s) // idempotent re-register
    checkSql(s)
  }

  test("misuse fails at analysis, not in the executor") {
    val s = TestSpark.spark
    graft.functions.GraftFunctions.register(s)
    val typeErr = intercept[Exception](s.sql("SELECT graft_polyhash(123)").collect())
    assert(typeErr.getMessage.contains("string"), typeErr.getMessage)
    val arityErr = intercept[Exception](s.sql("SELECT graft_cosine_sim(array(1.0D))").collect())
    assert(arityErr.getMessage.contains("2 arguments"), arityErr.getMessage)
  }

  test("build-time registration: SparkSession.builder().withExtensions(new GraftExtensions)") {
    // `spark.sql.extensions` is a STATIC conf — read from the
    // SparkContext's conf at launch, so it cannot be exercised against the
    // suite's shared context. `withExtensions` drives the identical
    // injection path (the class IS the Function1 the conf route loads).
    val saved = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate() // fresh session, same SparkContext
      checkSql(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      saved.foreach { d =>
        SparkSession.setDefaultSession(d)
        SparkSession.setActiveSession(d)
      }
    }
  }
}
