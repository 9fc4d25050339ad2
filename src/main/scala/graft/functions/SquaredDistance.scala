package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared L2 distance over two array<double> columns — the hot
  * inner loop of every L2 assigner (PQ codebook assignment scores
  * m·nlist candidate entries per vector, each a d-dim loop).
  *
  * Same design as [[DotProduct]] (`graft_dot`): a codegen'd primitive
  * loop replacing the `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)),
  * 0D, (a,x) -> a + x)` higher-order expression, with EXACTLY its
  * accumulation semantics — a sequential left fold of the per-position
  * squared differences, so distances are bit-identical to the HOF form
  * the DuckDB oracles replay (each partial `(x-y)*(x-y)` and each
  * `a + x` is the same IEEE op in the same order). The r17 round
  * measured that literal-compiling pqAssign WITHOUT this expression is
  * 3× slower (zip_with folds over literal arrays leave whole-stage
  * codegen); this is the missing native kernel.
  *
  * Registered as `graft_dist2` by Tables.sessionBuilder via
  * SparkSessionExtensions.injectFunction. Whole-array nulls propagate
  * null (BinaryExpression's null-safe contract); mismatched dimensions
  * yield NULL — exactly what the zip_with HOF does (the shorter side
  * pads with null, poisoning the fold) — so a malformed vector
  * surfaces as a detectable null, never a truncated-but-plausible
  * distance.
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  // nullable even over non-null children: dimension mismatch → NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dist2 requires array<double> inputs, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dist2"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = a.getDouble(i) - b.getDouble(i)
        s += d * d
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
