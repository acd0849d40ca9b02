package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the small-query-set baseline.
  *    The query side is broadcast; the corpus is scanned once with a
  *    map-side partial top-k (window over the broadcast-joined product), so
  *    the shuffle carries only (query, corpus_id, sim) triples.
  *  - [[ivfTopK]]: IVF-style scale path — corpus pre-bucketed by coarse LSH
  *    bucket; queries probe only their own bucket (and optionally
  *    neighbours), cutting the scanned fraction by ~2^nBits.
  */
object Similarity {

  /** Exact top-k by cosine: for each row of `queries` (id + vector), the `k`
    * nearest corpus rows. `queries` must be broadcast-size; ties broken by
    * corpus id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")))
    val scored = corpus
      .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
      .join(q)
      .withColumn("cosine", VectorFunctions.cosineBest(corpus.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** IVF/LSH-bucketed approximate top-k: corpus and queries are assigned a
    * coarse random-hyperplane bucket; each query scans only its bucket.
    * Recall is traded for a ~2^nBits scan reduction — the 100 TB path.
    */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              dim: Int, k: Int, nBits: Int = 4): DataFrame = {
    val cb = corpus.select(
      col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"),
      VectorFunctions.lshBucket(col(corpusVec), dim, nBits).as("bucket"))
    val qb = broadcast(queries.select(
      col(queryId).as("query_id"), col(queryVec).as("qv"),
      VectorFunctions.lshBucket(col(queryVec), dim, nBits).as("bucket")))
    val scored = cb.join(qb, "bucket")
      .withColumn("cosine", VectorFunctions.cosineBest(corpus.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }
}
