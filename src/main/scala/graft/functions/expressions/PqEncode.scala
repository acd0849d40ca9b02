package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd product-quantization encoder: for each of `m`
  * subspaces of width `sub = dim/m`, the index of the nearest sub-centroid
  * (squared L2, strict `<` so the LOWEST index wins ties — the same
  * first-min contract as `Similarity.nearestCentroid`, which keeps
  * codes, and therefore goldens, bit-identical to the UDF spelling).
  *
  * The codebooks are a flat `double[]` constructor payload (subspace-major:
  * centroid (s, c) starts at `(s·ksub + c)·sub`), attached to the generated
  * class as a reference object — the per-row loop is m·ksub·sub fused
  * multiply-adds inside whole-stage codegen, replacing a Scala UDF that
  * boxed every embedding into `Seq[Double]` and allocated a slice copy per
  * subspace. This is THE per-row kernel of the PQ corpus scan (encode cost
  * dominates table lookups at any corpus size), so it is the expression
  * worth keeping codegen-native.
  *
  * Null vector → null. A vector shorter than `m·sub` throws on the array
  * access, like the UDF's copyOfRange.
  */
case class PqEncode(child: Expression, codebooks: Array[Double],
                    m: Int, ksub: Int)
    extends UnaryExpression {

  private val sub: Int = codebooks.length / (m * ksub)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(vecAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val t = v.getDouble(s * sub + i) - codebooks(base + i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
        final int[] $codes = new int[$m];
        for (int $s = 0; $s < $m; $s++) {
          int $best = 0;
          double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $ksub; $c++) {
            final int $base = ($s * $ksub + $c) * $sub;
            double $d = 0.0;
            for (int $i = 0; $i < $sub; $i++) {
              final double $t = $v.getDouble($s * $sub + $i) - $cb[$base + $i];
              $d += $t * $t;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          $codes[$s] = $best;
        }
        ${ev.value} =
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
