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

  // Result is null for length-mismatched inputs or null elements even
  // when both arrays are non-null, so nullability cannot be derived
  // from the children.
  override def nullable: Boolean = true

  override def prettyName: String = "vector_dot"

  /** Canonical fold semantics — exactly what
    * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)`
    * computes: null for a null array, a length mismatch (zip_with pads
    * with nulls, which poison the fold), or any null element;
    * otherwise the left-to-right double accumulation. Matching the
    * fold bit-for-bit is what makes [[graft.plans.VectorDotRewriteRule]]
    * unconditionally sound.
    */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         |}
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
    GraftSqlShim.registerFunction(spark, "minhash_sig",
      exprs => StringMinHashSig(exprs(0)))
    GraftSqlShim.registerFunction(spark, "cdc_chunks",
      exprs => CdcChunks(exprs(0)))
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
        case 3 => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        case n => throw new IllegalArgumentException(
          s"graft_bloom_agg expects 1 to 3 arguments, got $n")
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
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[StringMinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => StringMinHashSig(exprs(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_chunks"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CdcChunks].getName, "cdc_chunks"),
      (exprs: Seq[Expression]) => CdcChunks(exprs(0))))
    // whole-operator top-k-per-group (graft.plans): logical node →
    // partial/final physical pair
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // columnar multimodal batch decode (graft.plans.MmDecode)
    e.injectPlannerStrategy(_ => graft.plans.MmDecodeStrategy)
    // declarative aggregate(zip_with(·,·,double-mul)) dot products →
    // codegen'd FloatVectorDot
    e.injectOptimizerRule(_ => graft.plans.VectorDotRewriteRule)
  }
}
