package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for vector math over `array<float>`
  * embedding columns.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) have no
  * `doGenCode` — they evaluate interpreted, allocating a lambda frame
  * per element. For O(pairs·dim) workloads (brute-force cosine, LSH
  * projections) that interpretation dominates the runtime, so the dot
  * product is implemented here as a `BinaryExpression` with whole-stage
  * codegen: one fused primitive loop, no allocation.
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native expressions as SQL functions, so they
  * compose with `expr(...)`/`spark.sql`. Idempotent.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    GraftSqlShim.registerFunction(spark, "vector_dot",
      exprs => FloatVectorDot(exprs(0), exprs(1)))
    GraftSqlShim.registerFunction(spark, "poly_hash",
      exprs => StringPolyHash(exprs(0), exprs(1)))
    registerBloom(spark)
  }

  /** Spark ships executor-side Bloom sketches as internal expressions
    * (used by its own runtime row-level filtering) without SQL names;
    * surfacing them keeps filter_bloom's build side a mergeable
    * aggregate and its probe side codegen'd — no driver funnel, no UDF.
    */
  def registerBloom(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    GraftSqlShim.registerFunction(spark, "graft_bloom_agg",
      exprs => exprs.size match {
        case 1 => new BloomFilterAggregate(exprs.head)
        case 2 => new BloomFilterAggregate(exprs(0), exprs(1))
        case _ => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
      })
    GraftSqlShim.registerFunction(spark, "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)))
  }
}

/** SparkSessionExtensions installer — the public, cluster-friendly
  * registration path: `--conf spark.sql.extensions=graft.functions
  * .GraftExtensions` (or `builder.withExtensions`) makes graft's native
  * functions available in every session of the application without
  * touching internal registries.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FloatVectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("poly_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[StringPolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => StringPolyHash(exprs(0), exprs(1))))
    // whole-operator top-k-per-group (graft.plans): logical node →
    // partial/final physical pair
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // declarative aggregate(zip_with(·,·,double-mul)) dot products →
    // codegen'd FloatVectorDot
    e.injectOptimizerRule(_ => graft.plans.VectorDotRewriteRule)
  }
}
