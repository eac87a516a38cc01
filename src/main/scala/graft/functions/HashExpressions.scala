package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash h = fold(bytes, (h·31 + b) mod m)
  * — graft's engine-portable string id (the DuckDB oracles replay the
  * identical fold via `list_reduce` over `ascii()` codes; byte == code
  * point for the ASCII corpora this engine targets, documented at the
  * call sites).
  *
  * Exists as a native `Expression` so fingerprint/split/dedup hashing
  * stays inside whole-stage codegen: the typed `Dataset.map`
  * formulation pays an encoder round-trip per row and fences off the
  * surrounding operators, which matters on a 100 TB corpus scan where
  * the hash is the only non-column operation in the stage.
  */
case class StringPolyHash(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("poly_hash modulus must be a constant")
        else right.eval() match {
          case m: java.lang.Long if m > 0 => TypeCheckResult.TypeCheckSuccess
          case m => TypeCheckResult.TypeCheckFailure(
            s"poly_hash modulus must be a positive bigint constant, got $m")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"poly_hash requires (string, bigint modulus), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(s: Any, m: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    val mod = m.asInstanceOf[Long]
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31L + (bytes(i) & 0xffL)) % mod; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, m) => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xffL)) % $m;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
