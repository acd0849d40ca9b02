package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd cosine similarity over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * CodegenFallback — every element evaluates interpreted expression trees —
  * so the ANN scoring loop (corpus × queries × dim evaluations in
  * bruteForceTopK/ivfTopK) pays tree-walking per multiply. This expression
  * emits the fused dot/norm loop inline in whole-stage codegen.
  *
  * Semantics match the HOF formulation exactly: single left-to-right fused
  * accumulation over the common prefix length (results are bit-identical to
  * the HOF version on equal-length inputs), zero-norm or empty input → null
  * (the HOF's divide-by-zero yields NULL in ANSI-off Spark SQL, and NaN
  * would sort ABOVE every real score in a top-k), null input → null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // may return null for zero-norm inputs even when both children are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        final int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          final double $xv = $a.getDouble($i);
          final double $yv = $b.getDouble($i);
          $dot += $xv * $yv;
          $na += $xv * $xv;
          $nb += $yv * $yv;
        }
        if ($na == 0.0 || $nb == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
