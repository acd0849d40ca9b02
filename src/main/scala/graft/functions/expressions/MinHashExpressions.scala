package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, k)` — sorted distinct 64-bit hashes of the
  * k-word shingles of `text`, as a native codegen expression.
  *
  * The (b)-tier of the custom-operator preference order (SURVEY §7.3):
  * this is the entry point of every MinHash dedup scan (q28 miner, q92
  * cross-corpus, q146 streaming gate), previously a Scala UDF whose
  * Array[Long] result crossed a boxing/encoder boundary per row before
  * the next UDF in the chain. The generated code calls the
  * [[graft.functions.HashKernels.shingleHashesData]] kernel directly —
  * one call per row inside whole-stage codegen, primitive arrays
  * throughout, standard null propagation (the UDF spelling needed an
  * explicit `when(isNotNull…)` guard).
  *
  * `k` is a construction-time constant (like [[DuckRound]]'s scale):
  * the SQL surface validates it in the [[graft.GraftExtensions]] builder.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (string, positive int k), got " +
        s"(${child.dataType.simpleString}, k=$k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.HashKernels.shingleHashesData(
      input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.shingleHashesData($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_band_keys(shingle_hashes, numHashes, bands)` — the LSH band
  * keys of a document's sorted shingle-hash set, with the MinHash
  * signature FUSED inside the kernel: the `numHashes`-long signature is
  * a stack array in one JVM call instead of an intermediate array column
  * crossing a second UDF boundary per row. Bit-identical to
  * `bandKeys(minHashSig(sh, numHashes), bands, numHashes / bands)`
  * (spec-pinned), so band keys computed by either spelling collide
  * identically.
  *
  * `numHashes` and `bands` are construction-time constants; `bands` must
  * divide `numHashes` (builder-validated on the SQL surface).
  */
case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull = true is ACCEPTED at analysis (any array<bigint>
    // read back from parquet — e.g. a stored shingle column — carries
    // the flag by default, with no user-facing way to re-declare it)
    // but its elements are null-scanned at eval time: the kernel reads
    // primitive getLong(i), which would silently unbox a null element
    // to 0 and hash it as a real shingle. A genuinely-null element
    // throws; the internal shingle_hashes pipeline emits
    // containsNull = false and skips the scan entirely.
    val typeOk = child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (typeOk && numHashes > 0 && bands > 0 && numHashes % bands == 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys expects (array<bigint>, " +
        s"numHashes divisible by bands), got " +
        s"(${child.dataType.simpleString}, " +
        s"numHashes=$numHashes, bands=$bands)")
  }

  private def rowsPerBand: Int = numHashes / bands

  private def mayHaveNullElements: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  private def kernelName: String =
    if (mayHaveNullElements) "minHashBandKeysDataChecked"
    else "minHashBandKeysData"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      graft.functions.HashKernels.minHashBandKeysDataChecked(
        input.asInstanceOf[ArrayData], numHashes, bands, rowsPerBand)
    else
      graft.functions.HashKernels.minHashBandKeysData(
        input.asInstanceOf[ArrayData], numHashes, bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.$kernelName(" +
        s"$c, $numHashes, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
