package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline surface: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All shuffle-conscious:
  *
  *  - exact dedup is one hash-groupBy (map-side combine) — no full-text
  *    shuffle, only the 64-bit hash + id;
  *  - MinHash/LSH candidate generation shuffles only (band_id, band_hash,
  *    doc_id) triples, never documents, and pairs are emitted per LSH
  *    bucket so the quadratic blow-up is bounded by bucket size;
  *  - verification re-joins the shingle sets for candidate pairs only.
  */
object Dedup {

  /** Word shingles (k-grams) of the lower-cased text as an array column;
    * documents shorter than k words get their whole token sequence as one
    * shingle.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
    val n = size(toks)
    when(n <= k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), n - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Distinct shingle 64-bit hashes (the MinHash universe for a doc). */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(transform(shingles(text, k), s => xxhash64(s)))

  /** MinHash signature of length `numHashes`: hᵢ = min over shingles of
    * xxhash64(shingle, i). Deterministic, pure expressions.
    */
  def minHashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val hashes = shingleHashes(text, k)
    array((0 until numHashes).map { i =>
      array_min(transform(hashes, h => xxhash64(h, lit(i))))
    }: _*)
  }

  /** LSH band keys: the signature split into `bands` bands of `rowsPerBand`,
    * each band hashed to one long. Emitted as array of structs
    * (band, band_hash); explode + groupBy(band, band_hash) gives candidate
    * buckets.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand), lit(b)).as("band_hash"))
    }: _*)

  /** Exact dedup: keep the row with the smallest `idCol` per identical
    * `text` (compared via 128-bit-ish (xxhash64, length) key so the shuffle
    * carries hashes, not documents). Returns the de-duplicated rows.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("__k", xxhash64(col(textCol)))
      .withColumn("__len", length(col(textCol)))
    val w = Window.partitionBy(col("__k"), col("__len")).orderBy(col(idCol))
    keyed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__k", "__len", "__rn")
  }

  /** Exact-dup groups: (keep_id, copies) per distinct text — the audit view
    * of [[exactDedup]].
    */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("__k"), length(col(textCol)).as("__len"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))
      .drop("__k", "__len")
      .select("keep_id", "copies")

  /** MinHash+LSH near-duplicate candidate pairs with exact-Jaccard
    * verification: returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard ≥ `minJaccard`. `bands × rowsPerBand` must equal the signature
    * length.
    */
  def minHashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, numHashes: Int = 64,
                      bands: Int = 16, rowsPerBand: Int = 4,
                      minJaccard: Double = 0.5): DataFrame = {
    require(bands * rowsPerBand == numHashes, "bands*rowsPerBand must equal numHashes")
    val sigs = df.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), k).as("sh"),
      minHashSignature(col(textCol), k, numHashes).as("sig"))
    val buckets = sigs
      .select(col("id"), explode(lshBands(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.band_hash"))
    // candidate pairs from shared buckets (dedup across bands)
    val a = buckets.as("a")
    val b = buckets.as("b")
    val cands = a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // cheap signature-agreement estimate first (64 longs vs full shingle
    // sets), then exact Jaccard only on plausible pairs — at scale the
    // estimate prunes most of the candidate set before the set ops run
    val shA = sigs.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sig").as("sig_a"))
    val shB = sigs.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sig").as("sig_b"))
    val est = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
      b => b)).cast("double") / numHashes
    cands.join(shA, "id_a").join(shB, "id_b")
      .filter(est >= minJaccard - 0.2)
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over word tokens: bit b is 1 when the weighted sum of
    * token-hash bit b is positive. Pure higher-order expressions.
    */
  def simHash(text: Column): Column = {
    val toks = split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
      val vote = aggregate(hashes, lit(0L),
        (s, h) => s + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      acc + when(vote > 0, lit(1L << b)).otherwise(0L)
    }
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, k: Int): Column = {
    val sa = shingleHashes(a, k)
    val sb = shingleHashes(b, k)
    size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
  }

  /** Embedding near-dup pairs: cosine ≥ `minCosine` among candidate pairs
    * sharing an LSH bucket (random hyperplanes). Shuffles only
    * (bucket, id, vector); at scale, raise `nBits` to shrink buckets.
    */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, nBits: Int = 8,
                        minCosine: Double = 0.95): DataFrame = {
    import graft.functions.VectorFunctions
    val withBucket = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.lshBucket(col(vecCol), dim, nBits).as("bucket"))
    val a = withBucket.as("a")
    val b = withBucket.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", round(VectorFunctions.cosine(col("a.v"), col("b.v")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
