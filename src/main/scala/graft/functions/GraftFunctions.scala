package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native Catalyst expressions, so pure
  * `spark.sql` users (and the `SparkEntry` SQL query paths) can call them
  * without the Scala facade:
  *
  *   - `graft_cosine_sim(a, b)` — fused one-pass cosine ([[CosineSim]])
  *   - `graft_vector_dot(a, b)` — fused dot product ([[VectorDot]])
  *   - `graft_polyhash(s)`      — rolling document hash ([[PolyHash]])
  *   - `graft_unit_micros(v)`   — exact integer unit-micros projection
  *     ([[UnitMicros]]): `graft_vector_dot(graft_unit_micros(a),
  *     graft_unit_micros(b))` is the bit-reproducible scaled cosine every
  *     assignment-deciding comparison ranks on — exposed so SQL-side
  *     pipelines can rank on the same grid the operators persist
  *
  * Two registration routes share one builder table:
  * [[register]] adds them to a live session's function registry
  * (session-scoped, idempotent); [[graft.GraftExtensions]] injects the
  * same table at session build time via `spark.sql.extensions`, the route
  * a cluster deployment configures once. `HyperplaneBuckets` is
  * deliberately absent: its plane-weight matrix is a constructor constant,
  * not a SQL-expressible argument — SQL callers go through
  * [[graft.operators.Similarity.lshTopK]].
  */
object GraftFunctions {

  type Description = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  // arity violations surface as the builder's IllegalArgumentException
  // (message names the function and both counts) rather than Spark's
  // positioned WRONG_NUM_ARGS — acceptable for this small surface, noted
  // here so the trade is deliberate

  private def fn(name: String, clazz: Class[_], arity: Int)(
      build: Seq[Expression] => Expression): Description =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity,
          s"$name expects $arity arguments, got ${args.length}")
        build(args)
      })

  val all: Seq[Description] = Seq(
    fn("graft_cosine_sim", classOf[CosineSim], 2)(a => CosineSim(a(0), a(1))),
    fn("graft_vector_dot", classOf[VectorDot], 2)(a => VectorDot(a(0), a(1))),
    fn("graft_polyhash", classOf[PolyHash], 1)(a => PolyHash(a(0))),
    fn("graft_unit_micros", classOf[UnitMicros], 1)(a => UnitMicros(a(0))))

  /** Register every function on a live session (replaces on re-register,
    * so repeated calls are safe).
    */
  def register(spark: SparkSession): Unit = {
    val registry = org.apache.spark.sql.graft.SessionBridge.functionRegistry(spark)
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
