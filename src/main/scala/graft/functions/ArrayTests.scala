package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-instrument advanced flag building blocks (SURVEY §2.9 C7, §2.5
  * A6-A8): across-beam vote counts (calculateFunctions.py:154-171),
  * any-out-of-range over array slices (:839-859, :928-961), and
  * flat/erratic-signal tests via the array standard deviation (:937-947,
  * :964-966). All higher-order Catalyst expressions — codegen-eligible,
  * zero shuffles; they compose into [[Qartod.combineFlags]] digit strings.
  */
object ArrayTests {

  /** A6 vote count: number of elements (of the first `take`, or all when
    * `take` ≤ 0) strictly greater than `thresh` — the reference's
    * `(beams > t).sum(dim='beam')`.
    */
  def countAbove(a: Column, thresh: Double, take: Int = 0): Column = {
    val s = if (take > 0) slice(a, 1, take) else a
    size(filter(s, x => x > thresh))
  }

  /** A6 k-of-n failure: fewer than `k` of the first `take` elements above
    * `thresh` (e.g. ADCP "fewer than 2 of 4 beams with good correlation").
    */
  def voteFail(a: Column, thresh: Double, k: Int, take: Int): Column =
    countAbove(a, thresh, take) < k

  /** A7 any-out-of-range: true when any element falls outside [lo, hi]
    * (reference `(arr < lo | arr > hi).any(axis=1)`).
    */
  def anyOutOfRange(a: Column, lo: Double, hi: Double): Column =
    exists(a, x => x < lo || x > hi)

  /** Population standard deviation of an array column via one fused
    * aggregate pass (sum, sum-of-squares, count) — A8's
    * `signal.std(axis=1)`, numpy default ddof=0.
    */
  def arrayStd(a: Column): Column = {
    val acc = aggregate(
      a,
      struct(lit(0.0).as("s"), lit(0.0).as("ss"), lit(0L).as("n")),
      (st, x) => struct(
        (st.getField("s") + x.cast("double")).as("s"),
        (st.getField("ss") + x.cast("double") * x.cast("double")).as("ss"),
        (st.getField("n") + 1L).as("n")))
    // clamp before sqrt: the one-pass E[x²]−E[x]² variance cancels to a
    // TINY NEGATIVE for flat arrays (measured −1.7e-18 for [0.1,0.1,0.1]),
    // and sqrt(negative) = NaN would make flatSignal miss exactly the
    // stuck-sensor signals it exists to catch
    when(acc.getField("n") > 0,
      sqrt(greatest(
        acc.getField("ss") / acc.getField("n") -
          (acc.getField("s") / acc.getField("n")) * (acc.getField("s") / acc.getField("n")),
        lit(0.0))))
  }

  /** A8 flat-signal test: std below `minStd` (sensor stuck). */
  def flatSignal(a: Column, minStd: Double): Column = arrayStd(a) < minStd
}
