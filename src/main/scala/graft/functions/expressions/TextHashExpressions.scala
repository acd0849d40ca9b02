package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen spellings of the remaining per-row text kernels on hot
  * corpus scans (the same (b)-tier graduation [[ShingleHashes]] made):
  * `simhash40`, `fingerprint40`, `word_ngrams`, `pos_gram_hashes`. Each
  * generated call goes straight to the JVM kernel inside whole-stage
  * codegen — no UDF encoder boundary, no Seq boxing.
  *
  * Null semantics mirror the UDF spellings they replace exactly:
  * simhash40/fingerprint40 propagate null; word_ngrams/pos_gram_hashes
  * return an EMPTY array for null input (their kernels' contract — the
  * explode/explode_outer consumers depend on it).
  */
case class SimHash40(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash40 expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash40"
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.HashKernels.simHash40(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.simHash40($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Fingerprint40(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fingerprint40 expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint40"
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.HashKernels.fingerprint40(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.fingerprint40($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_ngrams(text, n)` — distinct space-joined word n-grams; null text
  * → EMPTY array (never null), like the kernel UDF it replaces.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects (string, positive int n), got " +
        s"(${child.dataType.simpleString}, n=$n)")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_ngrams"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    graft.functions.TextFunctions.wordNgramsData(
      if (v == null) null else v.asInstanceOf[UTF8String], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      $javaType ${ev.value} = graft.functions.TextFunctions.wordNgramsData(
        ${c.isNull} ? null : ${c.value}, $n);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `char_class_ratio(text, class)` — fraction of code points matching a
  * (construction-constant) compiled character class; null text → null,
  * empty → 0.0. Value-identical to the `regexp_replace` double-`length`
  * spelling of [[graft.functions.TextFunctions.charRatio]] — both divide
  * the same two exact integer counts once — at one code-point scan per
  * row instead of a regex replace + result-string build (the
  * quality-signal hot path, round-14).
  */
case class CharClassRatio(child: Expression, cls: String)
    extends UnaryExpression {
  private lazy val spec: graft.functions.CharClassSpec =
    graft.functions.CharClassSpec.parse(cls).getOrElse(
      throw new IllegalArgumentException(
        s"char_class_ratio: unsupported character class '$cls'"))
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_class_ratio expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_class_ratio"
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.TextFunctions.charClassRatioData(
      input.asInstanceOf[UTF8String], spec)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("spec", spec,
      classOf[graft.functions.CharClassSpec].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextFunctions.charClassRatioData($c, $specRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `stopword_ratio(text, stopwords)` — fraction of whitespace tokens in
  * the (construction-constant) stopword set; null text → null, blank →
  * 0.0, exactly the kernel UDF's contract.
  */
case class StopwordRatio(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  private lazy val sw: Set[String] = stopwords.toSet
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stopword_ratio expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "stopword_ratio"
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.TextFunctions.stopwordRatioData(
      input.asInstanceOf[UTF8String], sw)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val swRef = ctx.addReferenceObj("sw", sw, "scala.collection.immutable.Set")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextFunctions.stopwordRatioData($c, $swRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `quality_score(text, stopwords)` — the composite prose-quality score;
  * null text → 0.5 (never null), the kernel's contract.
  */
case class QualityScore(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  private lazy val sw: Set[String] = stopwords.toSet
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_score expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "quality_score"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    graft.functions.TextFunctions.qualityScoreData(
      if (v == null) null else v.asInstanceOf[UTF8String], sw)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val swRef = ctx.addReferenceObj("sw", sw, "scala.collection.immutable.Set")
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      double ${ev.value} = graft.functions.TextFunctions.qualityScoreData(
        ${c.isNull} ? null : ${c.value}, $swRef);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `lang_id(text)` — stopword-vote language ID over the engine's default
  * profiles; null/blank → "und" (never null), the kernel's contract.
  */
case class LangId(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "lang_id"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    graft.functions.TextFunctions.langIdData(
      if (v == null) null else v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      $javaType ${ev.value} = graft.functions.TextFunctions.langIdData(
        ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `linear_score(text, weights, bias)` — hashed-feature linear classifier
  * inference (sigmoid of bias + mean token-hash weight); the weight
  * vector is a construction-time constant carried as a reference object
  * in generated code (dim = weights.length). Null/blank text → null
  * score, the kernel's contract.
  */
case class LinearScore(child: Expression, weights: Array[Double], bias: Double)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && weights.nonEmpty)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"linear_score expects (string, non-empty weights), got " +
        s"(${child.dataType.simpleString}, ${weights.length} weights)")
  override def dataType: DataType = DoubleType
  // blank (non-null) text also scores null, so nullability cannot be
  // inherited from the child — a non-nullable text column still yields
  // null scores
  override def nullable: Boolean = true
  override def prettyName: String = "linear_score"
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.HashKernels.linearScore(
      input.asInstanceOf[UTF8String].toString, weights.length, weights, bias)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    val c = child.genCode(ctx)
    val tmp = ctx.freshName("score")
    ev.copy(code = c.code + code"""
      java.lang.Double $tmp = ${c.isNull} ? null :
        graft.functions.HashKernels.linearScore(
          ${c.value}.toString(), ${weights.length}, $wRef, $bias);
      boolean ${ev.isNull} = $tmp == null;
      double ${ev.value} = ${ev.isNull} ? 0.0 : $tmp.doubleValue();""")
  }
  // weights is an Array: reference equality would break plan canonical
  // comparisons between structurally-equal instances
  override def equals(o: Any): Boolean = o match {
    case LinearScore(c, w, b) =>
      c == child && java.util.Arrays.equals(w, weights) && b == bias
    case _ => false
  }
  override def hashCode(): Int =
    (child, java.util.Arrays.hashCode(weights), bias).hashCode()
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `repetition_stats(text)` — Gopher/C4 repetition filters as one struct
  * `(_1 dup_token_frac, _2 top_bigram, _3 top_bigram_frac)` (the kernel
  * UDF's tuple field names, so consumers read identically either way);
  * null text → null struct.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", StringType),
    StructField("_3", DoubleType, nullable = false)))
  override def prettyName: String = "repetition_stats"
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.TextFunctions.repetitionStatsData(
      input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextFunctions.repetitionStatsData($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `gopher_stats(text)` — the Gopher document-shape statistics struct
  * (same named fields as the kernel UDF's case-class encoding); null
  * text → null struct.
  */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("bullet_frac", DoubleType, nullable = false),
    StructField("ellipsis_frac", DoubleType, nullable = false),
    StructField("alpha_frac", DoubleType, nullable = false)))
  override def prettyName: String = "gopher_stats"
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.TextFunctions.gopherStatsData(
      input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextFunctions.gopherStatsData($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `window_pairs(tokens, w)` — normalized sliding-window token pairs for
  * collocation statistics (multiplicity kept, equal tokens skipped);
  * null tokens → EMPTY array, the kernel's contract.
  */
case class WindowPairs(child: Expression, w: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok && w > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_pairs expects (array<string>, positive int w), got " +
        s"(${child.dataType.simpleString}, w=$w)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "window_pairs"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    graft.functions.TextFunctions.windowPairsData(
      if (v == null) null
      else v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      $javaType ${ev.value} = graft.functions.TextFunctions.windowPairsData(
        ${c.isNull} ? null : ${c.value}, $w);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `rebuild_trimmed(tokens, covered)` — rejoin a token array with the
  * sorted covered positions dropped (the dup-span trim's final step);
  * null cover acts as empty (a left-join miss means nothing to drop),
  * null tokens → null.
  */
case class RebuildTrimmed(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && (right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rebuild_trimmed expects (array<string>, array<int>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "rebuild_trimmed"
  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else graft.functions.TextFunctions.rebuildTrimmedData(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      right.eval(input)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = l.code + r.code + code"""
      boolean ${ev.isNull} = ${l.isNull};
      $javaType ${ev.value} = ${ev.isNull}
        ? null
        : graft.functions.TextFunctions.rebuildTrimmedData(
            ${l.value}, ${r.isNull} ? null : ${r.value});""")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `rebuild_trimmed_spans(tokens, starts, n)` — [[RebuildTrimmed]]'s span
  * form: token i is dropped iff some start s in the SORTED `starts` has
  * s ≤ i ≤ s+n-1. The dup-span trim aggregates only gram START positions
  * (one per duplicated gram) instead of exploding every covered position
  * n-fold; null starts act as empty (left-join miss), null tokens → null.
  */
case class RebuildTrimmedSpans(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && (right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }) && n > 0
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rebuild_trimmed_spans expects (array<string>, array<int>, " +
        s"positive int n), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}, n=$n)")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "rebuild_trimmed_spans"
  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else graft.functions.TextFunctions.rebuildTrimmedSpansData(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      right.eval(input)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = l.code + r.code + code"""
      boolean ${ev.isNull} = ${l.isNull};
      $javaType ${ev.value} = ${ev.isNull}
        ? null
        : graft.functions.TextFunctions.rebuildTrimmedSpansData(
            ${l.value}, ${r.isNull} ? null : ${r.value}, $n);""")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `spans_covered(starts, n)` — total token positions covered by the
  * union of `[s, s+n-1]` intervals over the SORTED starts (the trim's
  * `n_removed` in O(|starts|), no covered-position materialization).
  * Null starts → 0 (a left-join miss removes nothing).
  */
case class SpansCovered(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = child.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"spans_covered expects (array<int>, positive int n), got " +
        s"(${child.dataType.simpleString}, n=$n)")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "spans_covered"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    graft.functions.TextFunctions.spansCoveredData(
      if (v == null) null
      else v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      $javaType ${ev.value} = graft.functions.TextFunctions.spansCoveredData(
        ${c.isNull} ? null : ${c.value}, $n);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pos_gram_hashes(tokens, n)` — hash of the space-joined n-gram at every
  * start position (order-preserving, not distinct); null tokens → EMPTY
  * array (never null), like the kernel UDF it replaces.
  */
case class PosGramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pos_gram_hashes expects (array<string>, positive int n), got " +
        s"(${child.dataType.simpleString}, n=$n)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pos_gram_hashes"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    graft.functions.HashKernels.posGramHashesData(
      if (v == null) null
      else v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      $javaType ${ev.value} = graft.functions.HashKernels.posGramHashesData(
        ${c.isNull} ? null : ${c.value}, $n);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
