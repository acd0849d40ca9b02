package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd asymmetric-distance (ADC) scoring for product
  * quantization: `pq_adc(codes, table)` = −Σₛ table[s·ksub + codes[s]],
  * the negated squared L2 distance of a PQ-encoded corpus vector from the
  * query whose per-subspace distance table is `table`
  * (`ksub = table.length / codes.length`).
  *
  * The table rides as a COLUMN of the broadcast query side (one flat
  * m×ksub `array<double>` per query row), not as expression state — so this
  * is a plain registry expression with no payload, and the per-row work
  * stays inside whole-stage codegen: m array loads and adds, no UDF
  * row-boxing, no broadcast-map lookup per row (the previous spelling was a
  * Scala UDF against a broadcast `Map[qid, table]`, deserializing codes to
  * `Seq[Int]` per corpus row).
  *
  * Null in either input → null. Empty codes → −0.0 (the UDF's empty fold).
  * Out-of-range codes (violating the encode contract) throw, exactly like
  * the array access in the UDF.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<int>, array<double>), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codesAny: Any, tableAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val table = tableAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) return -0.0
    val ksub = table.numElements() / m
    var d = 0.0
    var s = 0
    while (s < m) {
      d += table.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    -d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      s"""
        final int $m = $codes.numElements();
        if ($m == 0) {
          ${ev.value} = -0.0;
        } else {
          final int $ksub = $table.numElements() / $m;
          double $d = 0.0;
          for (int $s = 0; $s < $m; $s++) {
            $d += $table.getDouble($s * $ksub + $codes.getInt($s));
          }
          ${ev.value} = -$d;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
