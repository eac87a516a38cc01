package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.FloatVectorDot

/** Optimizer rule: recognize the declarative higher-order dot-product
  * idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0D, (acc, v) -> acc + v) }}}
  *
  * over `array<float>` columns and replace it with the codegen'd
  * [[graft.functions.FloatVectorDot]]. Spark evaluates higher-order
  * functions interpreted — a lambda frame per element — which is the
  * SURVEY §8 pitfall that dominates O(rows·dim) vector workloads; the
  * rewrite lets users keep the declarative form and still get the
  * fused primitive loop (bit-identical result: same double promotion,
  * same left-to-right accumulation order).
  *
  * Deliberately conservative: it fires ONLY when the zip lambda
  * multiplies both elements as doubles (a float·float multiply rounds
  * differently and is NOT rewritten), the zero is literal 0.0D, the
  * merge is a plain `acc + v`, and the finish lambda is the identity.
  */
object VectorDotRewriteRule extends Rule[LogicalPlan] {

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean = a match {
    case v: NamedLambdaVariable => v.exprId == b.exprId
    case _ => false
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(Cast(lx, DoubleType, _, _), Cast(ly, DoubleType, _, _), _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0d, DoubleType),
          LambdaFunction(Add(ma, mv, _),
            Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
          LambdaFunction(fb, Seq(fv: NamedLambdaVariable), _))
        if isFloatArray(l) && isFloatArray(r) &&
          sameVar(lx, zx) && sameVar(ly, zy) &&
          sameVar(ma, acc) && sameVar(mv, elem) &&
          sameVar(fb, fv) =>
      FloatVectorDot(l, r)
  }
}
