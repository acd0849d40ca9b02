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

  // exact-fraction half-away-from-zero == std::round (see Rounding's
  // object doc: floor(s+0.5) carries across an integer at s = pred(0.5)
  // and for odd integral s in [2^52, 2^53)). a − floor(a) is exact for
  // every finite double so no magnitude guard is needed; ±Inf passes
  // through (Inf − Inf = NaN ≥ 0.5 is false → m = Inf), NaN propagates.
  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Double]
    val s = x * p
    val a = math.abs(s)
    val f = math.floor(a)
    val m = if (a - f >= 0.5) f + 1.0 else f
    val r = math.copySign(m, s) / p
    if (r == 0.0) math.copySign(0.0, x) else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val a = ctx.freshName("a")
      val f = ctx.freshName("f")
      val r = ctx.freshName("r")
      s"""
        double $s = $x * ${p}D;
        double $a = Math.abs($s);
        double $f = Math.floor($a);
        double $r = Math.copySign(($a - $f >= 0.5) ? $f + 1.0 : $f, $s) / ${p}D;
        if ($r == 0.0) $r = Math.copySign(0.0, $x);
        ${ev.value} = $r;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DuckRound =
    copy(child = newChild)
}
