package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-exact decimal rounding.
  *
  * Spark's `round(x, n)` is decimal-string based — `BigDecimal(x.toString)
  * .setScale(n, HALF_UP)` on the double's SHORTEST decimal representation —
  * while DuckDB (the correctness oracle) rounds the BINARY value:
  * `std::floor(x·10ⁿ + 0.5) / 10ⁿ` for x ≥ 0 (`ceil(x·10ⁿ − 0.5)` for
  * x < 0), preserving the sign of zero. The two agree except when x sits
  * on (or within an ulp of) an exact decimal half — e.g. 32.4796875 at
  * 6 dp: its nearest double is 32.47968749999…, so DuckDB rounds DOWN
  * while Spark's shortest-repr "…875" string rounds UP. Empirically
  * validated against DuckDB 1.x on 200k adversarial values (uniform,
  * dyadic, exact scaled halves, signed zeros, subnormals) at scales
  * 0/2/4/6: zero mismatches for the formula below, including `-0.0`
  * outputs for small negatives (which the driver's hash compare
  * distinguishes from `0.0`).
  *
  * Every oracle-compared query column therefore rounds through
  * [[dround]] (files shadow the imported `functions.round` with it), so
  * a value landing exactly on a half — ~1e-4 probability per rounded
  * aggregate per testdata regeneration — hashes identically on both
  * engines instead of failing the gate. [[droundDouble]] is the JVM-twin
  * for scalar kernels; the property spec pins Column ≡ JVM bit-for-bit.
  *
  * Internal fixed-point integerizations (`functions.round(x·1e9)` in
  * Similarity's deterministic trainers) are NOT oracle-facing and keep
  * Spark semantics — their only contract is self-consistency with their
  * own JVM twins.
  */
object Rounding {

  /** DuckDB-exact round to `scale` decimal places (see object doc).
    * Through the native [[graft.functions.expressions.DuckRound]] when
    * [[graft.GraftExtensions]] is installed — one codegen node that binds
    * its child once; the pure-Column fallback below duplicates the child
    * across its conditional branches, re-evaluating expensive inputs
    * (regex ratios, HOF cosines) several times per row.
    */
  def dround(c: Column, scale: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    if (spark.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier("duck_round")))
      call_function("duck_round", c.cast("double"), lit(scale))
    else droundColumnFallback(c, scale)
  }

  /** The extension-free Column spelling (exposed for the spec; prefer the
    * native expression — this form duplicates `c` across its branches).
    */
  private[functions] def droundColumnFallback(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    val scaled = c * lit(p)
    // |scaled| ≥ 2^53: scaled is integral in FP and +0.5 vanishes below
    // the ulp, so DuckDB's ops reduce to scaled/p; below that, the
    // long-valued floor/ceil are exact and cast back losslessly
    val r = when(abs(scaled) >= lit(9007199254740992.0), scaled / lit(p))
      .otherwise(
        when(c >= 0, floor(scaled + lit(0.5)).cast("double") / lit(p))
          .otherwise(ceil(scaled - lit(0.5)).cast("double") / lit(p)))
    // sign-of-zero: DuckDB keeps the input's sign; c*0.0 is IEEE copysign
    when(r === lit(0.0), c * lit(0.0)).otherwise(r)
  }

  /** JVM twin of [[dround]] for scalar kernels — same IEEE ops. */
  def droundDouble(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    val r =
      if (x >= 0) math.floor(x * p + 0.5) / p
      else math.ceil(x * p - 0.5) / p
    if (r == 0.0) math.copySign(0.0, x) else r
  }
}
