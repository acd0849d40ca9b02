package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-exact decimal rounding.
  *
  * Spark's `round(x, n)` is decimal-string based — `BigDecimal(x.toString)
  * .setScale(n, HALF_UP)` on the double's SHORTEST decimal representation —
  * while DuckDB (the correctness oracle) rounds the BINARY value:
  * `std::round(x·10ⁿ) / 10ⁿ` — an EXACT half-away-from-zero on the scaled
  * double, preserving the sign of zero. The two agree except when x sits
  * on (or within an ulp of) an exact decimal half — e.g. 32.4796875 at
  * 6 dp: its nearest double is 32.47968749999…, so DuckDB rounds DOWN
  * while Spark's shortest-repr "…875" string rounds UP.
  *
  * `std::round` is NOT `floor(s + 0.5)`: the FP add can carry across an
  * integer. At s = pred(0.5) = 0.49999999999999994, s + 0.5 rounds to
  * 1.0 so floor gives 1 while std::round gives 0; and for odd integral s
  * in [2^52, 2^53), s + 0.5 ties-to-even UP so floor gives s+1. The
  * faithful spelling below compares the exact fraction instead:
  * `a = |s|; f = floor(a); m = if (a − f ≥ 0.5) f+1 else f;
  * copysign(m, s)` — `a − f` is exact for every finite double, so no
  * magnitude guard is needed (for a ≥ 2^52, a − f = 0). Empirically
  * validated against DuckDB 1.0 on ~200k adversarial values (uniform,
  * dyadic, exact scaled halves ±1 ulp at k ∈ {0,1,2,7,123,2^52−1}, odd
  * integers in [2^52, 2^53), signed zeros, subnormals, infinities) at
  * scales 0/2/4/6/9: **0 mismatches in 1,002,855 comparisons** for this
  * formula, including `-0.0` outputs for small negatives (which the
  * driver's hash compare distinguishes from `0.0`). The previous
  * `floor(s+0.5)` spelling mismatched at exactly the two families above.
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
    // resolve via getActiveSession, not SparkSession.active: Column
    // construction must not throw in session-free contexts, and a missing
    // session just means the semantically-identical fallback spelling
    val hasNative = org.apache.spark.sql.SparkSession.getActiveSession.exists(
      _.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("duck_round")))
    if (hasNative) call_function("duck_round", c.cast("double"), lit(scale))
    else droundColumnFallback(c, scale)
  }

  /** The extension-free Column spelling (exposed for the spec; prefer the
    * native expression — this form duplicates `c` across its branches).
    */
  private[functions] def droundColumnFallback(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    val scaled = c * lit(p)
    // exact-fraction half-away (see object doc). Column `floor` is
    // LONG-valued, so guard at 2^52: every double ≥ 2^52 is integral and
    // std::round is the identity there (this also routes ±Inf through
    // scaled/p); below 2^52 the long floor is exact and a − f is the
    // exact fraction. NaN falls through to m = 0 → caught by the
    // sign-of-zero branch, where NaN · 0.0 = NaN propagates it.
    val a = abs(scaled)
    val f = floor(a).cast("double")
    val m = when(a - f >= lit(0.5), f + lit(1.0)).otherwise(f)
    val r = when(a >= lit(4503599627370496.0), scaled / lit(p))
      .otherwise(when(scaled < 0, -m).otherwise(m) / lit(p))
    // sign-of-zero: DuckDB keeps the input's sign; c*0.0 is IEEE copysign
    when(r === lit(0.0), c * lit(0.0)).otherwise(r)
  }

  /** JVM twin of [[dround]] for scalar kernels — same IEEE ops. */
  def droundDouble(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    val s = x * p
    val a = math.abs(s)
    val f = math.floor(a)
    val m = if (a - f >= 0.5) f + 1.0 else f
    val r = math.copySign(m, s) / p
    if (r == 0.0) math.copySign(0.0, x) else r
  }
}
