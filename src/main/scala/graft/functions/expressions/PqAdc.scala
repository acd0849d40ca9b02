package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd asymmetric-distance (ADC) scoring for product
  * quantization: `pq_adc(codes, table, ksub)` = −Σₛ table[s·ksub + codes[s]],
  * the negated squared L2 distance of a PQ-encoded corpus vector from the
  * query whose per-subspace distance table is `table`.
  *
  * `ksub` is part of the ENCODE contract, so it is an explicit argument,
  * not derived from `table.length / codes.length`: a derived ksub would
  * silently re-stride the table when a stale or mis-wired table (built for
  * a different `m`) happens to divide evenly, turning a wiring bug into
  * plausible-looking wrong scores. Instead the expression checks the
  * contract per row — `table.length == ksub · codes.length` and every
  * code in `[0, ksub)` — and throws a descriptive error on violation,
  * like the array-out-of-bounds the UDF spelling produced.
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
  */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case _ if ksub <= 0 => TypeCheckResult.TypeCheckFailure(
      s"pq_adc ksub must be positive, got $ksub")
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
    if (table.numElements() != ksub.toLong * m)
      throw new IllegalArgumentException(
        s"pq_adc: table length ${table.numElements()} != ksub $ksub * m $m")
    var d = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) throw new IllegalArgumentException(
        s"pq_adc: code $c at subspace $s outside [0, $ksub)")
      d += table.getDouble(s * ksub + c)
      s += 1
    }
    -d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
        final int $m = $codes.numElements();
        if ($m == 0) {
          ${ev.value} = -0.0;
        } else {
          if ($table.numElements() != ${ksub}L * $m) {
            throw new IllegalArgumentException(
              "pq_adc: table length " + $table.numElements() +
              " != ksub $ksub * m " + $m);
          }
          double $d = 0.0;
          for (int $s = 0; $s < $m; $s++) {
            final int $c = $codes.getInt($s);
            if ($c < 0 || $c >= $ksub) {
              throw new IllegalArgumentException(
                "pq_adc: code " + $c + " at subspace " + $s +
                " outside [0, $ksub)");
            }
            $d += $table.getDouble($s * $ksub + $c);
          }
          ${ev.value} = -$d;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
