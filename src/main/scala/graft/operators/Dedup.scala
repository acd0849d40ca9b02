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
    *
    * Execution shape (designed for the 100 TB fan-in):
    *  1. one scan computes per doc the sorted shingle-hash set + signature
    *    (tight-loop kernels, [[graft.functions.HashKernels]]); persisted so
    *    the candidate and verification stages don't recompute text hashing;
    *  2. candidates come from `groupBy(band, band_hash)` + per-bucket pair
    *    expansion — the shuffle carries only (band_hash, id) pairs, never
    *    documents, and there is no self-join;
    *  3. a bucket larger than `maxBucket` ids is capped (sorted ids, first
    *    `maxBucket` kept) to bound the quadratic pair blow-up of a skewed
    *    bucket — the only approximation besides LSH banding itself;
    *  4. verification joins the shingle sets for surviving pairs only and
    *    computes exact Jaccard with a merge scan (no estimate prefilter —
    *    every emitted pair satisfies the threshold exactly).
    */
  def minHashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, numHashes: Int = 64,
                      bands: Int = 16, rowsPerBand: Int = 4,
                      minJaccard: Double = 0.5,
                      maxBucket: Int = 1024): DataFrame = {
    require(bands * rowsPerBand == numHashes, "bands*rowsPerBand must equal numHashes")
    import graft.functions.HashKernels
    val sigs = df
      .select(
        col(idCol).cast("long").as("id"),
        HashKernels.shingleHashSetUdf(k)(col(textCol)).as("sh"))
      .withColumn("sig", HashKernels.minHashSigUdf(numHashes)(col("sh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = sigs.select(col("id"),
      posexplode(HashKernels.bandKeysUdf(bands, rowsPerBand)(col("sig"))))
      .toDF("id", "band", "band_hash")
    val cands = buckets
      .groupBy(col("band"), col("band_hash"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(HashKernels.bucketPairsUdf(maxBucket)(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()
    cands
      .join(sigs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(HashKernels.sortedJaccardCol(col("sh_a"), col("sh_b")), 6))
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
    * sharing an LSH bucket (random hyperplanes). Same execution shape as
    * [[minHashDupPairs]]: pairs expand per bucket (capped at `maxBucket`)
    * so the shuffle carries (bucket, id) — vectors are joined back for the
    * surviving pairs only. At scale, raise `nBits` to shrink buckets.
    */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, nBits: Int = 8,
                        minCosine: Double = 0.95,
                        maxBucket: Int = 4096): DataFrame = {
    import graft.functions.{HashKernels, VectorFunctions}
    val withBucket = df.select(
        col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        VectorFunctions.lshBucket(col(vecCol), dim, nBits).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = withBucket
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(HashKernels.bucketPairsUdf(maxBucket)(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
    cands
      .join(withBucket.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(withBucket.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cosine", round(HashKernels.cosineCol(col("v_a"), col("v_b")), 6))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }
}
