package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{ApproxTopItems, CharClassRatio, CosineSimilarity, DuckRound, Fingerprint40, GopherStatsExpr, LangId, LinearScore, MinHashBandKeys, PosGramHashes, PqAdc, PqEncode, QualityScore, RebuildTrimmed, RebuildTrimmedSpans, RepetitionStats, ShingleHashes, SimHash40, SortedJaccard, SpansCovered, StopwordRatio, TopKByScore, WindowPairs, WordNgrams}

/** Engine extension point, registered via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (the public
  * `SparkSessionExtensions` API): injects the engine's native Catalyst
  * expressions into the function registry so they're usable from both the
  * DataFrame API (`expr("sorted_jaccard(a, b)")`) and SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Evaluate a construction-time scalar argument. Builders run during
    * ANALYSIS, before constant folding, so SQL spellings like
    * `array(1.0d, 2.0d)` or `2 + 2` arrive as foldable expression trees,
    * not `Literal`s — pattern-matching `Literal` would reject every
    * SQL-surface call. Foldable + eval accepts exactly the set of
    * arguments that are constants by query start.
    */
  private def constArg(e: Expression, what: String): Any = {
    require(e.foldable && e.deterministic,
      s"$what must be a constant expression, got $e")
    val v = e.eval()
    require(v != null, s"$what must not be null")
    v
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinNative.AsOfJoinStrategy)
    // large×large range joins written as plain theta joins plan as
    // BroadcastNestedLoopJoin without this — see IntervalJoinRewrite doc
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("sorted_jaccard"),
      new ExpressionInfo(classOf[SortedJaccard].getName, "sorted_jaccard"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "sorted_jaccard(a, b) takes two arguments")
        SortedJaccard(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "topk_by_score(score, id, k) takes three arguments")
        TopKByScore(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("approx_top_items"),
      new ExpressionInfo(classOf[ApproxTopItems].getName, "approx_top_items"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "approx_top_items(item, k, capacity) takes three arguments")
        ApproxTopItems(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingle_hashes(text, k) takes two arguments")
        val k = constArg(children(1), "shingle_hashes k") match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"shingle_hashes k must be an integer constant, got $other")
        }
        ShingleHashes(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "minhash_band_keys"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "minhash_band_keys(sh, numHashes, bands) takes three arguments")
        val (n, b) = (constArg(children(1), "minhash_band_keys numHashes"),
            constArg(children(2), "minhash_band_keys bands")) match {
          case (ni: Int, bi: Int) => (ni, bi)
          case other => throw new IllegalArgumentException(
            s"minhash_band_keys numHashes/bands must be integer constants, got $other")
        }
        MinHashBandKeys(children.head, n, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash40"),
      new ExpressionInfo(classOf[SimHash40].getName, "simhash40"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash40(text) takes one argument")
        SimHash40(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("fingerprint40"),
      new ExpressionInfo(classOf[Fingerprint40].getName, "fingerprint40"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "fingerprint40(text) takes one argument")
        Fingerprint40(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_ngrams(text, n) takes two arguments")
        val n = constArg(children(1), "word_ngrams n") match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"word_ngrams n must be an integer constant, got $other")
        }
        WordNgrams(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("pos_gram_hashes"),
      new ExpressionInfo(classOf[PosGramHashes].getName, "pos_gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "pos_gram_hashes(tokens, n) takes two arguments")
        val n = constArg(children(1), "pos_gram_hashes n") match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"pos_gram_hashes n must be an integer constant, got $other")
        }
        PosGramHashes(children.head, n)
      }))
    def constStopwords(e: Expression, what: String): Seq[String] =
      (e.dataType, constArg(e, what)) match {
        case (org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _),
            a: org.apache.spark.sql.catalyst.util.ArrayData) =>
          a.toObjectArray(org.apache.spark.sql.types.StringType)
            .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
            .toSeq
        case (t, _) => throw new IllegalArgumentException(
          s"$what must be an array<string> constant, got type $t")
      }
    ext.injectFunction((
      FunctionIdentifier("stopword_ratio"),
      new ExpressionInfo(classOf[StopwordRatio].getName, "stopword_ratio"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "stopword_ratio(text, stopwords) takes two arguments")
        StopwordRatio(children.head,
          constStopwords(children(1), "stopword_ratio stopwords"))
      }))
    ext.injectFunction((
      FunctionIdentifier("char_class_ratio"),
      new ExpressionInfo(classOf[CharClassRatio].getName, "char_class_ratio"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "char_class_ratio(text, class) takes two arguments")
        val cls = constArg(children(1), "char_class_ratio class") match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"char_class_ratio class must be a string constant, got $other")
        }
        CharClassRatio(children.head, cls)
      }))
    ext.injectFunction((
      FunctionIdentifier("quality_score"),
      new ExpressionInfo(classOf[QualityScore].getName, "quality_score"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "quality_score(text, stopwords) takes two arguments")
        QualityScore(children.head,
          constStopwords(children(1), "quality_score stopwords"))
      }))
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "lang_id(text) takes one argument")
        LangId(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("linear_score"),
      new ExpressionInfo(classOf[LinearScore].getName, "linear_score"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "linear_score(text, weights, bias) takes three arguments")
        import org.apache.spark.sql.catalyst.util.ArrayData
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        val w = (children(1).dataType, constArg(children(1), "linear_score weights")) match {
          case (ArrayType(DoubleType, _), a: ArrayData) => a.toDoubleArray()
          case (t, _) => throw new IllegalArgumentException(
            s"linear_score weights must be an array<double> constant, got type $t")
        }
        val b = constArg(children(2), "linear_score bias") match {
          case d: Double => d
          case other => throw new IllegalArgumentException(
            s"linear_score bias must be a double constant, got $other")
        }
        LinearScore(children.head, w, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("window_pairs"),
      new ExpressionInfo(classOf[WindowPairs].getName, "window_pairs"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "window_pairs(tokens, w) takes two arguments")
        val w = constArg(children(1), "window_pairs w") match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"window_pairs w must be an integer constant, got $other")
        }
        WindowPairs(children.head, w)
      }))
    ext.injectFunction((
      FunctionIdentifier("rebuild_trimmed"),
      new ExpressionInfo(classOf[RebuildTrimmed].getName, "rebuild_trimmed"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "rebuild_trimmed(tokens, covered) takes two arguments")
        RebuildTrimmed(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("rebuild_trimmed_spans"),
      new ExpressionInfo(classOf[RebuildTrimmedSpans].getName, "rebuild_trimmed_spans"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "rebuild_trimmed_spans(tokens, starts, n) takes three arguments")
        val n = constArg(children(2), "rebuild_trimmed_spans n") match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"rebuild_trimmed_spans n must be an integer constant, got $other")
        }
        RebuildTrimmedSpans(children.head, children(1), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("spans_covered"),
      new ExpressionInfo(classOf[SpansCovered].getName, "spans_covered"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "spans_covered(starts, n) takes two arguments")
        val n = constArg(children(1), "spans_covered n") match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"spans_covered n must be an integer constant, got $other")
        }
        SpansCovered(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "repetition_stats(text) takes one argument")
        RepetitionStats(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("gopher_stats"),
      new ExpressionInfo(classOf[GopherStatsExpr].getName, "gopher_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "gopher_stats(text) takes one argument")
        GopherStatsExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("duck_round"),
      new ExpressionInfo(classOf[DuckRound].getName, "duck_round"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "duck_round(x, scale) takes two arguments")
        val scale = constArg(children(1), "duck_round scale") match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"duck_round scale must be an integer constant, got $other")
        }
        DuckRound(children.head, scale)
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim(a, b) takes two arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "pq_adc(codes, table, ksub) takes three arguments")
        val ksub = constArg(children(2), "pq_adc ksub") match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"pq_adc ksub must be an integer constant, got $other")
        }
        PqAdc(children.head, children(1), ksub)
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "pq_encode(vec, codebooks, m, ksub) takes four arguments")
        import org.apache.spark.sql.catalyst.util.ArrayData
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        val cb = (children(1).dataType, constArg(children(1), "pq_encode codebooks")) match {
          case (ArrayType(DoubleType, _), a: ArrayData) => a.toDoubleArray()
          case (t, _) => throw new IllegalArgumentException(
            s"pq_encode codebooks must be an array<double> constant, got type $t")
        }
        val (m, ksub) = (constArg(children(2), "pq_encode m"),
            constArg(children(3), "pq_encode ksub")) match {
          case (mi: Int, ki: Int) => (mi, ki)
          case other => throw new IllegalArgumentException(
            s"pq_encode m/ksub must be integer constants, got $other")
        }
        PqEncode(children.head, cb, m, ksub)
      }))
  }
}
