package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE (byte-pair-encoding) vocabulary induction + tokenizer
  * application (Sennrich et al. 2016) — the piece that turns the engine's
  * "BPE-ish" token heuristics into a LEARNED subword vocabulary.
  *
  * Scale shape: training first reduces the corpus ONCE to its
  * word-frequency table (distinct words × counts — VOCABULARY-bounded,
  * not corpus-bounded; the standard BPE trick). Every merge round then
  * runs on that table alone: one map-side-combined weighted pair-count
  * aggregate, one argmax (a driver collect of exactly ONE row), and one
  * per-word kernel merge pass, with `localCheckpoint` keeping lineage
  * flat across rounds — the [[Dedup.connectedComponents]] /
  * [[Similarity.trainIvfCentroids]] iterative convention. Deterministic
  * by construction: integer count sums are schedule-independent and the
  * argmax tie-breaks (count desc, pair lexicographic asc), so the learned
  * merge table is bit-identical run to run — which the golden gate
  * requires and a reproducible tokenizer build wants anyway.
  *
  * Surrogate-pair caveat: initial symbols are UTF-16 code units (corpus
  * contract: BMP text); widen to code points for astral alphabets.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Corpus word-frequency table: (w, cnt) over whitespace tokens of the
    * lower-cased text. The ONLY corpus-sized pass in training. Empty
    * tokens (artifacts of non-space edge whitespace: split keeps
    * leading/trailing empties) are excluded — they are not words, and an
    * empty w would make `sequence(1, length(w))` count DOWN to [1, 0]
    * and corrupt the symbol array. [[encodeUdf]] drops them identically.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  private def zipAdjacent(sym: Column): Column =
    zip_with(
      slice(sym, lit(1), greatest(size(sym) - 1, lit(0))),
      slice(sym, lit(2), greatest(size(sym) - 1, lit(0))),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** One left-to-right merge pass of the pair (a, b) over a symbol
    * sequence — greedy, non-overlapping, the reference BPE semantics.
    */
  private[graft] def mergeOnce(sym: Seq[String], a: String,
                                   b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `numMerges` merges. Returns them in rank order. Stops early if
    * no adjacent pair remains.
    *
    * Scale-adaptive routing (the [[Dedup.connectedComponents]] /
    * ingestGate convention): the corpus reduces to its word-frequency
    * table either way (the only corpus-sized pass); when that table has
    * at most `smallVocabWords` distinct words it is collected once and
    * the merge rounds run in-driver — 20 rounds over a bench-scale vocab
    * do not deserve 20 distributed jobs of fixed scheduling cost. The
    * driver path replicates the distributed semantics bit-for-bit: exact
    * integer count sums and the same (count desc, pair lexicographic asc)
    * argmax tie-break — BMP strings order identically under Java UTF-16
    * comparison and Spark's UTF-8 binary ordering, which the corpus
    * contract already assumes. `smallVocabWords = 0` forces the
    * distributed loop (the spec equivalence path).
    */
  def train(docs: DataFrame, textCol: String,
            numMerges: Int,
            smallVocabWords: Long = 1000000L): Seq[(String, String)] = {
    if (smallVocabWords > 0) {
      val wf = wordFreq(docs, textCol).localCheckpoint(false)
      if (wf.count() <= smallVocabWords) {
        val rows = wf.collect().map(r => (r.getLong(1), r.getString(0)))
        return trainDriver(rows, numMerges)
      }
      // fall through: reuse the checkpointed word table in the loop
      return trainDistributed(wf, numMerges)
    }
    // forced-distributed escape (smallVocabWords <= 0): checkpoint the
    // word table here too — trainImpl's kernel-stage spread counts it,
    // and an unpinned frame would recompute the corpus aggregate
    trainDistributed(wordFreq(docs, textCol).localCheckpoint(false), numMerges)
  }

  /** In-driver merge loop over a bounded word-frequency table; semantics
    * identical to [[trainImpl]] (spec-asserted).
    */
  private def trainDriver(words: Array[(Long, String)],
                          numMerges: Int): Seq[(String, String)] = {
    val cnts = words.map(_._1)
    // split by CODE POINTS, not UTF-16 units: the distributed route's
    // substring/length split by code points, so a surrogate-pair split here
    // would make the two routes learn different merge tables for any word
    // containing a non-BMP character (emoji, CJK extensions) — and which
    // route runs flips silently at the smallVocabWords threshold
    val syms: Array[Seq[String]] =
      words.map { case (_, w) =>
        w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toSeq :+ EndOfWord
      }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pc = new java.util.HashMap[(String, String), Long]()
      var i = 0
      while (i < syms.length) {
        val s = syms(i); val c = cnts(i)
        var j = 0
        while (j < s.length - 1) {
          pc.merge((s(j), s(j + 1)), c, (a: Long, b: Long) => a + b)
          j += 1
        }
        i += 1
      }
      if (pc.isEmpty) done = true
      else {
        var bestK: (String, String) = null
        var bestC = Long.MinValue
        pc.forEach { (k, v) =>
          val better = v > bestC || (v == bestC &&
            (k._1 < bestK._1 || (k._1 == bestK._1 && k._2 < bestK._2)))
          if (better) { bestK = k; bestC = v }
        }
        merges += bestK
        var i2 = 0
        while (i2 < syms.length) {
          syms(i2) = mergeOnce(syms(i2), bestK._1, bestK._2)
          i2 += 1
        }
      }
      round += 1
    }
    merges.toSeq
  }

  private def trainDistributed(wordTable: DataFrame,
                               numMerges: Int): Seq[(String, String)] = {
    // Static planning scoped over the merge rounds (the
    // [[Dedup.connectedComponents]] convention): AQE splits each round's
    // single top-pair action into separate map/result stage-jobs and
    // re-plans the vocabulary shuffle every round. The pair-count table
    // is vocabulary-bounded (thousands of rows at any corpus scale), so
    // a narrow fixed layout is the right shape; the one corpus-sized
    // pass (wordFreq) runs before the loop and is unaffected by the
    // narrow setting in practice (its aggregate is map-side combined).
    val spark = wordTable.sparkSession
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partPrev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try trainImpl(wordTable, numMerges)
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
      spark.conf.set("spark.sql.shuffle.partitions", partPrev)
    }
  }

  private def trainImpl(wordTable: DataFrame,
                        numMerges: Int): Seq[(String, String)] = {
    // the per-round explode/merge maps are KERNEL-bound over this table,
    // and the upstream wordFreq aggregate may have been AQE-coalesced by
    // BYTES down to one partition — spread a big-but-narrow word table
    // BEFORE the loop's first checkpoint, so the checkpoint blocks land
    // at the spread partitioning and the exchange runs exactly once
    // (spreadForKernelStage: no-op for small or already-parallel tables;
    // wordTable arrives checkpointed from train(), so its count is a
    // trivial cached-blocks job)
    var words = Dedup.spreadForKernelStage(wordTable)
      .select(col("cnt"),
        concat(
          transform(sequence(lit(1), length(col("w"))),
            i => col("w").substr(i, lit(1))),
          array(lit(EndOfWord))).as("sym"))
      // LAZY checkpoints throughout the merge loop: the next round's
      // top-pair TakeOrdered job scans every partition, which both
      // materializes the persist (lineage cut) and finds the pair — one
      // job per round instead of an eager-checkpoint job plus the
      // top-pair job, and the final round's table never materializes
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = words
        .select(col("cnt"), explode(zipAdjacent(col("sym"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val mergeUdf = udf((sym: Seq[String]) => mergeOnce(sym, a, b))
        words = words.select(col("cnt"), mergeUdf(col("sym")).as("sym"))
          .localCheckpoint(false)
      }
      round += 1
    }
    merges.toSeq
  }

  /** Apply a learned merge table to one word (rank order, the reference
    * encoder semantics).
    */
  private[graft] def encodeWord(word: String,
                                    merges: Seq[(String, String)]): Seq[String] = {
    var sym: Seq[String] = word.map(_.toString) :+ EndOfWord
    merges.foreach { case (a, b) => sym = mergeOnce(sym, a, b) }
    sym
  }

  /** Subword tokenizer over a text column: whitespace-split the
    * lower-cased text, BPE-encode each word. A per-row kernel over the
    * broadcast merge table — scan rate, no shuffle, batch or stream.
    * Null/blank text → null.
    *
    * Natural-language corpora follow Zipf's law, so the same words
    * recur millions of times: each UDF instance keeps a bounded
    * word→subwords cache (per task, deserialized with the closure), so
    * the merge loop runs once per DISTINCT word per task instead of once
    * per occurrence. Pure memoization — output is byte-identical
    * (golden-pinned by q105).
    */
  def encodeUdf(merges: Seq[(String, String)]): UserDefinedFunction = {
    val cacheMax = 65536
    // per-closure-instance cache; Spark deserializes one closure per
    // task, so no cross-thread sharing and no synchronization needed
    @transient lazy val cache =
      new java.util.LinkedHashMap[String, Seq[String]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Seq[String]]): Boolean =
          size() > cacheMax
      }
    udf((text: String) => {
      if (text == null) null
      else {
        // the EXACT wordFreq token stream: space-only trim (SQL trim
        // semantics, not Java trim), Locale.ROOT lower, \s+ split
        // keeping edge empties (Spark split limit -1), empties dropped —
        // so the tokenizer applies to precisely the words the
        // vocabulary was induced from
        val t = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
          .reverse.toLowerCase(java.util.Locale.ROOT)
        if (t.isEmpty) null
        else t.split("\\s+", -1).toSeq.filter(_.nonEmpty)
          .flatMap { w =>
            val hit = cache.get(w)
            if (hit != null) hit
            else { val enc = encodeWord(w, merges); cache.put(w, enc); enc }
          }
      }
    })
  }

  /** Corpus tokenization: (`idCol`, bpe_tokens, n_bpe) per document. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val enc = encodeUdf(merges)
    docs.select(col(idCol), enc(col(textCol)).as("bpe_tokens"))
      .withColumn("n_bpe", coalesce(size(col("bpe_tokens")), lit(0)))
  }
}
