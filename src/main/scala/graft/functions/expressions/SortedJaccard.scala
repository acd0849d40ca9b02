package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: exact Jaccard similarity of two SORTED
  * distinct `array<bigint>` columns via a merge scan.
  *
  * This is the (b)-tier of the custom-operator preference order (SURVEY
  * §7.3): the dedup verification path evaluates it once per candidate pair,
  * so unlike the scalar-UDF kernels it participates in whole-stage codegen
  * — `doGenCode` emits the merge loop inline over `ArrayData.getLong`, no
  * boxing, no Scala closure call, no UDF serialization in the plan.
  *
  * Null semantics: null on either side → null (standard BinaryExpression
  * null-intolerance). Two empty arrays → 1.0 (empty sets are identical),
  * matching [[graft.functions.HashKernels.sortedJaccard]].
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sorted_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val union = ctx.freshName("union")
      s"""
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        int $i = 0, $j = 0, $inter = 0;
        while ($i < $nx && $j < $ny) {
          final long $xv = $a.getLong($i);
          final long $yv = $b.getLong($j);
          if ($xv == $yv) { $inter++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        final int $union = $nx + $ny - $inter;
        ${ev.value} = ($union == 0) ? 1.0 : ((double) $inter) / $union;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
