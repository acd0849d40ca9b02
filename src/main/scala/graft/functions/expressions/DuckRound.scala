package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd DuckDB-exact decimal rounding (see
  * [[graft.functions.Rounding]] for the semantics and the 200k-value
  * DuckDB validation). One expression node that binds its child ONCE —
  * the pure-Column spelling duplicates the child across the when/floor/
  * ceil branches, which defeats codegen subexpression elimination and
  * re-evaluates expensive inputs (regex char ratios, HOF cosines)
  * several times per row.
  *
  * `scale` is a compile-time Int (the query surface only rounds at
  * literal scales); the power of ten is precomputed once per expression.
  */
case class DuckRound(child: Expression, scale: Int) extends UnaryExpression {

  private val p: Double = math.pow(10, scale)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"duck_round expects double, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "duck_round"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Double]
    val r =
      if (x >= 0) math.floor(x * p + 0.5) / p
      else math.ceil(x * p - 0.5) / p
    if (r == 0.0) math.copySign(0.0, x) else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("r")
      s"""
        double $r = ($x >= 0.0)
          ? Math.floor($x * ${p}D + 0.5) / ${p}D
          : Math.ceil($x * ${p}D - 0.5) / ${p}D;
        if ($r == 0.0) $r = Math.copySign(0.0, $x);
        ${ev.value} = $r;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DuckRound =
    copy(child = newChild)
}
