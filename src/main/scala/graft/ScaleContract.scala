package graft

/** The scale-parameterization contracts, as code instead of scaladoc.
  *
  * Several operators have a knob that must GROW with the data for the
  * operator's per-group work to stay bounded (the no-quadratic-kernel
  * rule): SemDeDup's cluster count k keeps per-cluster occupancy
  * m ≈ N/k constant (Abbas et al. 2023 run k ∝ N), and hyperplane-LSH's
  * bit count keeps bucket occupancy ≈ N/2^nBits constant. The gate
  * queries derive those knobs from the observed table size through
  * these formulas, so the SAME query definition runs the sf oracles
  * (where the formulas reproduce the historical fixed values — every
  * golden and oracle row unchanged) and the 10×/100× grown gates (where
  * the knobs grow per contract instead of letting m blow up
  * quadratically). The formulas are integer-exact: no float log/ceil
  * whose rounding could flip a knob at a scale boundary.
  *
  * Anchors (spec-pinned): documents/embeddings at sf0.001/0.01/0.1
  * (N ≤ 2000) reproduce k = 8 and nBits = 4 exactly.
  */
object ScaleContract {

  /** SemDeDup cluster count: smallest k ≥ 8 with occupancy N/k ≤ 250,
    * capped at `dim` (the closed-form basis codebook the gate oracle can
    * replicate has at most `dim` centroids; past the cap, train a real
    * codebook — [[graft.operators.Similarity.trainIvfCentroids]] — and
    * keep k ∝ N, as measured in probes/ratio_all_r11.txt's 100× section).
    * ceil(N/250) in integer arithmetic.
    */
  def semanticClusters(n: Long, dim: Int = 64): Int =
    math.min(dim.toLong, math.max(8L, (n + 249L) / 250L)).toInt

  /** Within-cluster kernel cap for [[graft.operators.Dedup.semanticDedup]]:
    * 4× the expected occupancy N/k, never below the operator's 8192
    * default backstop. Once k hits its codebook ceiling ([[
    * semanticClusters]]'s dim cap), occupancy grows with N and cluster
    * SKEW decides whether the cap binds: measured at the 100× gate, the
    * argmax-basis codebook's largest cluster holds 2.63× the mean
    * (8213 of mean 3125) — 21 rows silently lost their lower-neighbor
    * stats to the stock cap, the round-12 gate100x catch. 4× headroom
    * covers that skew class; a corpus with hotter clusters should train
    * a real codebook with larger k instead of raising this further
    * (per-cluster kernel work is O(m²)).
    */
  def semanticMaxCluster(n: Long, k: Int): Int =
    math.min(math.max(8192L, 4L * (n / math.max(k, 1))), Int.MaxValue.toLong).toInt

  /** Hyperplane-LSH bits: smallest nBits ≥ 4 with FLOOR occupancy
    * floor(N/2^nBits) ≤ 125 — the floor bound is the contract, not a
    * rounding accident: the sf0.1 anchor (N = 2000 → 2000>>4 = 125 at
    * 4 bits) relies on it, and for the N just past a multiple of 2^b
    * (e.g. 2001..2015 at b = 4) the true expected occupancy exceeds 125
    * by < 1 before the knob steps — immaterial to the ~125 design point,
    * and switching to a ceil bound would flip the spec-pinned anchors.
    * Integer shift, not float log2 — at the exact power-of-two boundary
    * a float `ceil(log2(n/125))` could round either way.
    */
  def lshBits(n: Long): Int = {
    var b = 4
    while ((n >> b) > 125L && b < 30) b += 1
    b
  }
}
