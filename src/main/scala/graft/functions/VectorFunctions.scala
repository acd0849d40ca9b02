package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` embedding columns, as higher-order
  * Catalyst expressions (`zip_with` / `aggregate`) — codegen'd, no UDFs.
  * Accumulation is in double regardless of the storage element type so
  * results are engine-stable.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; null-safe via division (0-norm yields null). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine through the codegen'd native expression when GraftExtensions is
    * installed (the HOF version is CodegenFallback — interpreted per
    * element), else the HOF formulation. Both accumulate left-to-right and
    * both yield null on zero-norm input, so results are bit-identical.
    */
  def cosineBest(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (spark.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")))
      call_function("cosine_sim", a.cast("array<double>"), b.cast("array<double>"))
    else cosine(a, b)

  /** Euclidean distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Sign bit of `a · hyperplane` — building block for random-hyperplane LSH
    * (1 when non-negative).
    */
  def hyperplaneSign(a: Column, hyperplane: Seq[Double]): Column = {
    val h = array(hyperplane.map(lit): _*)
    when(dot(a, h) >= 0, 1).otherwise(0)
  }

  /** Pack `nBits` hyperplane signs into one long bucket id. Hyperplanes are
    * generated from a seeded xorshift so buckets are deterministic.
    */
  def lshBucket(a: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes = Seq.fill(nBits)(Seq.fill(dim)(rng.nextGaussian()))
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (plane, i)) =>
      acc + hyperplaneSign(a, plane).cast("long") * lit(1L << i)
    }
  }
}
