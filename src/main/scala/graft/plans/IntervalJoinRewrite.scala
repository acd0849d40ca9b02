package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Automatic large×large range-join rewrite (SURVEY §4.1).
  *
  * A user writing the reference's hottest join shape directly —
  * `samples.join(profiles, $"t" >= $"start" && $"t" <= $"end")`
  * (ref qaqc/dashboard.py:1438-1441, qaqc/calculate.py:145-191) — gets a
  * BroadcastNestedLoopJoin from vanilla Spark, and when BOTH sides are
  * above the broadcast threshold that plan is a scale-killer: one side is
  * collected and every executor scans the full cross space. This rule
  * detects that shape in the optimizer and rewrites it through the same
  * bucketing [[graft.operators.TemporalJoins.bucketizedIntervalJoin]]
  * performs explicitly: the interval side explodes each `[lo, hi]` into
  * the fixed-width time buckets it covers, the point side computes its
  * bucket, and the join becomes a shuffle-capable EQUI-join on the bucket
  * key with the original predicate re-applied exactly as a post-filter.
  *
  * Covered join types — Inner, LeftOuter, RightOuter, FullOuter,
  * LeftSemi, LeftAnti (the reference's overlap shapes also appear as outer/anti
  * compositions: open-ended annotation windows ref qaqc/dashboard.py:324-338,
  * reconciliation anti-joins ref qaqc/plots.py:500). RightOuter is
  * commuted to LeftOuter first. The rewrite shape depends on which side
  * is PRESERVED relative to which side holds the point:
  *
  *  - '''Point side preserved''' (LeftOuter/LeftSemi/LeftAnti with `t` on
  *    the left, and Inner either way): the direct bucketed join is already
  *    exact — a point falls in exactly ONE bucket, so each matched
  *    (point, interval) pair survives the bucket equi-join exactly once,
  *    and outer/semi/anti semantics over the exploded interval side equal
  *    the theta semantics (an interval row with null/inverted bounds
  *    explodes to nothing, and can never theta-match either). No dedup.
  *  - '''Interval side preserved''' (LeftOuter/LeftSemi/LeftAnti with `t`
  *    on the right): the explode duplicates preserved rows, so each gets
  *    a one-shot `monotonically_increasing_id` BEFORE the explode and the
  *    rewrite re-collapses on it — semi as the bucketed inner join plus a
  *    group-by-rowid dedup; anti as an outer-explode + left-outer bucketed
  *    join + per-rowid `max(matched) = 0` aggregate; outer as the same
  *    left-outer join + a per-rowid window `any-match` flag that keeps
  *    matched rows and exactly one null-extended row for matchless rowids.
  *    All three are SINGLE-branch plans: the nondeterministic rowid is
  *    evaluated once per query, never joined against a second evaluation
  *    of itself (a two-branch matched ∪ unmatched union would re-run the
  *    id assignment with no order guarantee after a shuffle).
  *    Interval-preserved rows with null/inverted bounds are kept by anti
  *    and null-extended by outer via `Generate(..., outer = true)` — the
  *    explode emits one null-bucket row instead of dropping them, matching
  *    the theta join, where such a row matches nothing but is preserved.
  *
  * Eligibility (conservative — anything else is left to Spark's planner):
  *  - one of the join types above, no join hints, deterministic condition;
  *  - the conjunction contains a lower and an upper bound tying ONE
  *    point expression `t` (from one side) to two bound expressions from
  *    the other side — `>=`/`>` and `<=`/`<` in either operand order;
  *  - NO cross-side equality conjunct (with an equi-key Spark already
  *    plans a shuffle join on it, the right default) — UNLESS the key is
  *    low-cardinality (per-site series), where the keyed shuffle join
  *    degenerates to a per-key cross product and appending the time
  *    bucket to the key restores bounded work per task. Low cardinality
  *    is decided COST-BASED when ANALYZE'd ndv stats exist (CBO on,
  *    provable composite ndv ≤ `spark.graft.intervalJoin.equiKeyedMaxNdv`,
  *    default the shuffle partition count) AND the same stats prove the
  *    widest interval's bucket cover fits `maxBucketsPerRow` (min/max on
  *    the bound columns — auto must never turn a slow-but-working keyed
  *    join into a bucket-cap runtime error on sentinel bounds); without
  *    stats the decision is not knowable and the join is left alone.
  *    `spark.graft.intervalJoin.rewriteEquiKeyed` = `true`/`false`
  *    overrides the cost decision in either direction (default `auto`);
  *  - both sides' size estimates exceed the broadcast threshold (below
  *    it, the nested-loop join over a broadcast build side is the better
  *    plan and `TemporalJoins.intervalJoin` uses it deliberately);
  *  - `t`/`lo`/`hi` are timestamps (TZ or NTZ) or integral epochs.
  *
  * The rewritten join carries the bucket equality AND the original
  * condition, so correctness never depends on the bucketing (buckets
  * merely cover the range; the exact predicate prunes). The rewrite
  * is self-stabilizing in the fixed-point optimizer batch: its own output
  * joins contain a cross-side equality, which fails eligibility — and
  * when the equi-keyed refinement applies (knob or cost-based, where
  * equalities no longer disqualify)
  * stabilization rests on the reserved bucket column names instead: a
  * join whose side already exposes them is the rewrite's (or the
  * explicit bucketized operator's) own output.
  *
  * Bucket width is `spark.graft.intervalJoin.bucketSeconds` (default one
  * day): the explode factor per interval row is `⌈span/width⌉ + 1`, so
  * size it ≳ the median interval span. A row that would produce more than
  * `spark.graft.intervalJoin.maxBucketsPerRow` buckets (default 100 000 —
  * ~274 years at day buckets, far beyond any real validity interval but
  * ~1000× under the sentinel-bound pathology) fails fast with an error
  * naming both knobs instead of silently materializing millions of bucket
  * rows per input row: an open-ended interval encoded as `hi = 9999-12-31`
  * needs a bucketless plan (disable the rule) or a coarser bucket, and
  * either choice should be the user's, made on a clear error, not an OOM.
  * Disable the rule entirely with
  * `spark.graft.intervalJoin.rewrite.enabled=false`.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.intervalJoin.rewrite.enabled"
  val BucketKey = "spark.graft.intervalJoin.bucketSeconds"
  val MaxBucketsKey = "spark.graft.intervalJoin.maxBucketsPerRow"
  val EquiKeyedKey = "spark.graft.intervalJoin.rewriteEquiKeyed"
  val EquiKeyedMaxNdvKey = "spark.graft.intervalJoin.equiKeyedMaxNdv"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean
  private def bucketSeconds: Long = {
    val b = conf.getConfString(BucketKey, "86400").toLong
    require(b > 0, s"$BucketKey must be positive, got $b")
    b
  }
  private def maxBucketsPerRow: Long = {
    val m = conf.getConfString(MaxBucketsKey, "100000").toLong
    require(m > 0, s"$MaxBucketsKey must be positive, got $m")
    m
  }
  /** ndv ceiling for the cost-based equi-keyed auto-enable: a composite
    * equi-key provably holding fewer distinct values than the shuffle
    * partition count cannot occupy every partition, so the keyed shuffle
    * join both idles executors and goes quadratic per key.
    */
  private def equiKeyedMaxNdv: BigInt = {
    val m = BigInt(conf.getConfString(
      EquiKeyedMaxNdvKey, conf.numShufflePartitions.toString))
    require(m > 0, s"$EquiKeyedMaxNdvKey must be positive, got $m")
    m
  }

  private def supportedType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti | FullOuter => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(_, _, jt, Some(cond), hint)
          if hint == JoinHint.NONE && cond.deterministic && supportedType(jt) =>
        rewrite(j).getOrElse(j)
    }
  }

  /** Seconds-scale monotone image of a time-like expression, or None for
    * unsupported types. Monotonicity is all bucketing needs; both sides
    * go through the same mapping, so the bucket cover stays exact.
    */
  private def secondsOf(e: Expression): Option[Expression] = e.dataType match {
    case TimestampType => Some(UnixSeconds(e))
    // NTZ→TZ cast is monotone; applied to all three expressions alike
    case TimestampNTZType =>
      Some(UnixSeconds(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))))
    case LongType => Some(e)
    case IntegerType => Some(Cast(e, LongType))
    case _ => None
  }

  private def bucketOf(e: Expression, b: Long): Option[Expression] =
    // integral div truncates toward zero — monotone non-decreasing, which
    // is the only property the cover needs (matches lo ≤ t ≤ hi ⇒
    // bucket(lo) ≤ bucket(t) ≤ bucket(hi))
    secondsOf(e).map(s => new IntegralDivide(s, Literal(b)))

  /** One range bound extracted from a conjunct: `t` lives entirely on one
    * side of the join, `bound` entirely on the other.
    */
  private case class RangeBound(t: Expression, tOnLeft: Boolean, bound: Expression)

  private def rewrite(j: Join): Option[LogicalPlan] = j.joinType match {
    case RightOuter =>
      // commute to LeftOuter so every preserved-side case below is "left";
      // a final Project restores the original column order
      val commuted =
        Join(j.right, j.left, LeftOuter, j.condition, JoinHint.NONE)
      rewriteNormalized(commuted).map(p => Project(j.output, p))
    case _ => rewriteNormalized(j)
  }

  private def rewriteNormalized(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    // which side an expression's references live on, if exactly one
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    }
    def crossSide(a: Expression, b: Expression): Boolean =
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }

    val equiConjuncts = conjuncts.collect {
      case e @ EqualTo(a, b) if crossSide(a, b) => e
      case e @ EqualNullSafe(a, b) if crossSide(a, b) => e.asInstanceOf[BinaryComparison]
    }
    val hasEquiKey = equiConjuncts.nonEmpty
    // With an equi-key Spark already plans a shuffle join on it — usually
    // right, so equi-keyed range joins are left alone by default. But when
    // the shared key is LOW-cardinality (the reference's per-(site,
    // deployment) series shape), each key's partition degenerates to a
    // per-key cross product under that plan; the rewrite then appends the
    // time bucket to the join key (the planner extracts bucketEq alongside
    // the original equalities automatically), refining (site) →
    // (site, bucket) at the cost of the interval-side explode. Whether the
    // key IS low-cardinality is decided cost-based when the decision is
    // knowable: under CBO, ANALYZE'd column stats carry ndv, and a
    // provable composite-key ndv bound below `equiKeyedMaxNdv` (default:
    // the shuffle partition count — fewer occupied partitions than that
    // means idle executors AND per-key quadratic work) auto-enables the
    // refinement. Without stats the decision is not knowable and the
    // default stays hands-off; the knob overrides in either direction.
    // When the refinement applies, the bucket equality itself no longer
    // fails eligibility, so self-stabilization rests on the reserved
    // column names instead: a join whose side already exposes the
    // rewrite's own bucket columns IS the rewrite's output.
    def ownOutput(p: LogicalPlan): Boolean = p.output.exists(a =>
      a.name == "__graft_bucket" || a.name == "__graft_bucket_i" ||
        // TemporalJoins.bucketizedIntervalJoin's explicit spelling: its
        // post-join filter can be pushed into the join in the same batch,
        // and re-bucketing an already-bucketed join would square the
        // interval-side explode
        a.name == "__bucket")
    // provable upper bound on the composite equi-key's distinct count:
    // shared keys ≤ either side's ndv per conjunct (take the min of the
    // sides whose ANALYZE'd stats are known), composite ndv ≤ the product
    // over conjuncts; any conjunct with no known side → unknowable.
    def ndvBound: Option[BigInt] = {
      def ndvOf(e: Expression): Option[BigInt] = e match {
        case a: Attribute =>
          val side = if (j.left.outputSet.contains(a)) j.left else j.right
          side.stats.attributeStats.get(a).flatMap(_.distinctCount)
        case _ => None
      }
      equiConjuncts.foldLeft(Option(BigInt(1))) { (acc, c) =>
        for {
          p <- acc
          n <- (ndvOf(c.left), ndvOf(c.right)) match {
            case (Some(x), Some(y)) => Some(x.min(y))
            case (one @ Some(_), None) => one
            case (None, one @ Some(_)) => one
            case _ => None
          }
        } yield p * n
      }
    }
    val mode = conf.getConfString(EquiKeyedKey, "auto").toLowerCase match {
      case m @ ("true" | "false" | "auto") => m
      // fail loudly: a typo'd force-enable silently falling into auto
      // would change plan selection with no signal to the user
      case other => throw new IllegalArgumentException(
        s"$EquiKeyedKey must be one of true/false/auto, got '$other'")
    }
    val equiKeyed = mode match {
      case "true" => true
      case "false" => false
      case _ => hasEquiKey && ndvBound.exists(_ <= equiKeyedMaxNdv)
    }
    if (hasEquiKey && !equiKeyed) return None
    // auto-enable must not DEGRADE a working plan: the keyed shuffle join
    // it replaces runs (slowly) on any data, while the rewrite fails fast
    // past the bucket cap — so under auto (never under an explicit
    // knob=true) the bounds are re-checked against the cap further down,
    // where the lo/hi expressions are known
    val autoEnabled = hasEquiKey && mode == "auto"
    // the reserved-name guard matters ONLY under the knob (where bucket
    // equalities no longer fail eligibility); applying it unconditionally
    // would silently strand a user range join that merely happens to
    // carry a like-named column on the BNLJ plan
    if (equiKeyed && (ownOutput(j.left) || ownOutput(j.right))) return None

    val threshold = conf.autoBroadcastJoinThreshold
    def big(p: LogicalPlan): Boolean =
      threshold < 0 || p.stats.sizeInBytes > threshold
    if (!big(j.left) || !big(j.right)) return None

    // each comparison yields BOTH readings (a bounded by b / b bounded
    // by a); a (lower, upper) pair on the same t from the same side is a
    // range join
    val lowers = scala.collection.mutable.ArrayBuffer.empty[RangeBound]
    val uppers = scala.collection.mutable.ArrayBuffer.empty[RangeBound]
    def record(lo: Expression, hi: Expression): Unit =
      if (crossSide(lo, hi)) {
        // lo ≤ hi: hi is lower-bounded by lo, lo is upper-bounded by hi
        lowers += RangeBound(hi, sideOf(hi).get, lo)
        uppers += RangeBound(lo, sideOf(lo).get, hi)
      }
    conjuncts.foreach {
      case GreaterThanOrEqual(a, b) => record(b, a)
      case GreaterThan(a, b) => record(b, a)
      case LessThanOrEqual(a, b) => record(a, b)
      case LessThan(a, b) => record(a, b)
      case _ =>
    }

    val pair = (for {
      l <- lowers
      u <- uppers
      if l.tOnLeft == u.tOnLeft && l.t.semanticEquals(u.t)
    } yield (l, u)).headOption

    pair.flatMap { case (lo, hi) =>
      // cost-based auto-enable only: the same ANALYZE'd stats must also
      // prove the explode stays under the bucket cap — the widest
      // possible interval (min(lo) .. max(hi)) must fit maxBucketsPerRow.
      // Without this, a sentinel bound (hi = 9999-12-31) that ran fine on
      // Spark's keyed join would start FAILING with the bucket-cap
      // raise_error the day someone ANALYZEs the table. Bare-attribute
      // bounds with min/max stats are required; anything else is
      // unknowable and auto declines (explicit knob=true still forces).
      val ivSide = if (lo.tOnLeft) j.right else j.left
      if (autoEnabled && !spanProvablyWithinCap(ivSide, lo.bound, hi.bound))
        None
      else {
        val b = bucketSeconds
        (bucketOf(lo.t, b), bucketOf(lo.bound, b), bucketOf(hi.bound, b)) match {
          case (Some(tB), (Some(loB)), Some(hiB)) =>
            build(j, factOnLeft = lo.tOnLeft, tB, loB, hiB)
          case _ => None
        }
      }
    }
  }

  /** Seconds-scale value of a bound attribute's ANALYZE'd min/max
    * column stat, computed by EVALUATING the plan's own [[secondsOf]]
    * expression over a literal of the stat value — so the stats-side
    * mapping is the live mapping by construction. A hand-rolled
    * `micros / 1000000` here diverged from the plan twice (UnixSeconds
    * floor-divides, so pre-1970 values truncated one second high; NTZ
    * stats skipped the session-zone cast, off by up to ±50400 s), which
    * could pass [[spanProvablyWithinCap]] exactly at the cap edge and
    * then hit the bucket-cap raise_error the auto proof promises to
    * preclude. None when the bound is not a bare attribute, has no
    * stats, or has an unsupported type.
    */
  private def statsSeconds(side: LogicalPlan, e: Expression,
                           wantMax: Boolean): Option[Long] = e match {
    case a: Attribute =>
      side.stats.attributeStats.get(a)
        .flatMap(cs => if (wantMax) cs.max else cs.min)
        .flatMap { v =>
          e.dataType match {
            case TimestampType | TimestampNTZType | LongType | IntegerType =>
              secondsOf(Literal(v, e.dataType)).flatMap { expr =>
                expr.eval(null) match {
                  case s: Long => Some(s)
                  case _ => None
                }
              }
            case _ => None
          }
        }
    case _ => None
  }

  /** True iff column stats PROVE every interval's bucket cover fits the
    * explode cap: bucket(max(hi)) − bucket(min(lo)) < maxBucketsPerRow
    * (the cover size is the difference + 1; [[bucketCover]] raises at
    * difference ≥ cap). Long division truncates toward zero exactly like
    * the plan's IntegralDivide, so the proof uses the plan's own bucket
    * arithmetic.
    */
  private def spanProvablyWithinCap(side: LogicalPlan, loB: Expression,
                                    hiB: Expression): Boolean = {
    val b = bucketSeconds
    (for {
      mn <- statsSeconds(side, loB, wantMax = false)
      mx <- statsSeconds(side, hiB, wantMax = true)
    } yield (mx / b) - (mn / b) < maxBucketsPerRow).getOrElse(false)
  }

  /** The `[loB, hiB]` bucket-cover array for one interval row: empty for
    * inverted bounds (matches the theta join, which such a row can never
    * satisfy — rather than Sequence's default descending walk), null for
    * null bounds, a clear fail-fast error past the explode cap.
    */
  private def bucketCover(loB: Expression, hiB: Expression): Expression = {
    // Sequence is TimeZoneAwareExpression: without an explicit zone
    // it reports unresolved even over longs, and the optimizer's
    // plan validator rejects the rewrite. Step pinned to 1: without
    // it Sequence walks DESCENDING when lo > hi.
    val arrTy = ArrayType(LongType, containsNull = false)
    val seqExpr = Sequence(loB, hiB, Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val emptyBuckets = Literal.create(
      org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[Long]), arrTy)
    val cap = maxBucketsPerRow
    val tooWide = Cast(new RaiseError(Literal(
      s"interval-join rewrite: an interval spans more than $cap " +
        s"buckets of $bucketSeconds s; raise $BucketKey / $MaxBucketsKey or " +
        s"disable $EnabledKey")), arrTy)
    // bucket count is hiB − loB + 1, so ≥ cap on the difference enforces
    // count ≤ cap exactly (a strict > would let a cap+1-bucket row slip)
    If(LessThan(hiB, loB), emptyBuckets,
      If(GreaterThanOrEqual(Subtract(hiB, loB), Literal(cap)), tooWide, seqExpr))
  }

  private def freshRowId(name: String): Alias =
    Alias(MonotonicallyIncreasingID(), name)()

  /** The interval-preserved rewrites re-collapse explode duplicates with
    * an Aggregate grouped on the one-shot rowid(s) ALONE; every original
    * output column is functionally dependent on the rowid(s) (all copies
    * of a preserved row carry identical values), so each is reconstructed
    * as `first(col)` — the same shape Spark's own
    * `ReplaceDeduplicateWithAggregate` emits, with the alias pinned to the
    * original exprId so parent references stay resolved. Narrow long keys
    * mean the aggregate hashes/compares 8–16 bytes per row instead of the
    * full (possibly wide) schema, and map-typed outputs — not groupable,
    * but fine as `first` results — no longer force the BNLJ fallback.
    */
  private def firstOf(attrs: Seq[Attribute]): Seq[NamedExpression] =
    attrs.map { a =>
      Alias(new aggregate.First(a).toAggregateExpression(), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }

  private def build(
      j: Join,
      factOnLeft: Boolean,
      tB: Expression,
      loB: Expression,
      hiB: Expression): Option[LogicalPlan] = {
    val (factSide, intervalSide) =
      if (factOnLeft) (j.left, j.right) else (j.right, j.left)
    val bucketAlias = Alias(tB, "__graft_bucket")()
    val factWithBucket = Project(factSide.output :+ bucketAlias, factSide)
    val buckets = bucketCover(loB, hiB)
    val cond = j.condition.get

    def explodedInterval(outer: Boolean, child: LogicalPlan): (LogicalPlan, Attribute) = {
      val genAttr = AttributeReference(
        "__graft_bucket_i", LongType, nullable = outer)()
      (Generate(Explode(buckets), unrequiredChildIndex = Nil, outer = outer,
        qualifier = None, generatorOutput = Seq(genAttr), child = child), genAttr)
    }

    j.joinType match {
      // ---- point side preserved (or inner): the direct rewrite is exact
      case Inner | LeftOuter | LeftSemi | LeftAnti if factOnLeft || j.joinType == Inner =>
        val (exploded, genAttr) = explodedInterval(outer = false, intervalSide)
        val newCond = And(EqualTo(bucketAlias.toAttribute, genAttr), cond)
        val (newLeft, newRight) =
          if (factOnLeft) (factWithBucket, exploded)
          else (exploded: LogicalPlan, factWithBucket: LogicalPlan)
        Some(Project(j.output,
          Join(newLeft, newRight, j.joinType, Some(newCond), JoinHint.NONE)))

      // ---- interval side preserved: rowid before the explode, collapse after
      case LeftSemi =>
        // bucketed inner + distinct-on-rowid: an interval spanning many
        // buckets matches once per (bucket, point) pair; grouping on the
        // one-shot rowid alone (outputs reconstructed via [[firstOf]])
        // restores ≤1 row per input
        val rowId = freshRowId("__graft_rowid")
        val withId = Project(intervalSide.output :+ rowId, intervalSide)
        val (exploded, genAttr) = explodedInterval(outer = false, withId)
        val newCond = And(EqualTo(genAttr, bucketAlias.toAttribute), cond)
        val inner =
          Join(exploded, factWithBucket, Inner, Some(newCond), JoinHint.NONE)
        val dedup = Aggregate(
          Seq(rowId.toAttribute), firstOf(intervalSide.output), inner)
        Some(Project(j.output, dedup))

      case LeftAnti =>
        // outer-explode (null/inverted-bound rows survive as one
        // null-bucket row, as the theta anti keeps them) + left-outer
        // bucketed join + keep rowids where max(matched) = 0
        val rowId = freshRowId("__graft_rowid")
        val withId = Project(intervalSide.output :+ rowId, intervalSide)
        val (exploded, genAttr) = explodedInterval(outer = true, withId)
        val newCond = And(EqualTo(genAttr, bucketAlias.toAttribute), cond)
        val louter =
          Join(exploded, factWithBucket, LeftOuter, Some(newCond), JoinHint.NONE)
        // the fact bucket is non-null on every matched row (the bucket
        // equality can only hold between non-nulls) and null on every
        // null-extended one, so it doubles as the match flag
        val matched = If(IsNotNull(bucketAlias.toAttribute), Literal(1L), Literal(0L))
        val anyMatch = Alias(
          AggregateExpression(Max(matched), Complete, isDistinct = false),
          "__graft_any")()
        val agg = Aggregate(Seq(rowId.toAttribute),
          firstOf(intervalSide.output) :+ anyMatch, louter)
        val kept = Filter(EqualTo(anyMatch.toAttribute, Literal(0L)), agg)
        Some(Project(j.output, kept))

      case LeftOuter =>
        // same left-outer bucketed join; a per-rowid window any-match flag
        // keeps matched rows and exactly one null-extended row for
        // matchless rowids. The fact side gets its own rowid so identical
        // fact duplicates stay distinct through the final dedup aggregate
        // (which only collapses the k null-extended copies an interval
        // spanning k unmatched buckets produces).
        val rowId = freshRowId("__graft_rowid")
        val withId = Project(intervalSide.output :+ rowId, intervalSide)
        val (exploded, genAttr) = explodedInterval(outer = true, withId)
        val factRowId = freshRowId("__graft_rowid_r")
        val factB =
          Project(factSide.output :+ bucketAlias :+ factRowId, factSide)
        val newCond = And(EqualTo(genAttr, bucketAlias.toAttribute), cond)
        val louter = Join(exploded, factB, LeftOuter, Some(newCond), JoinHint.NONE)
        val mAlias = Alias(
          If(IsNotNull(bucketAlias.toAttribute), Literal(1L), Literal(0L)),
          "__graft_m")()
        val flagged = Project(louter.output :+ mAlias, louter)
        val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
        val anyAlias = Alias(
          WindowExpression(
            AggregateExpression(Max(mAlias.toAttribute), Complete, isDistinct = false),
            WindowSpecDefinition(Seq(rowId.toAttribute), Nil, frame)),
          "__graft_any")()
        val windowed = Window(Seq(anyAlias), Seq(rowId.toAttribute), Nil, flagged)
        val kept = Filter(
          Or(EqualTo(mAlias.toAttribute, Literal(1L)),
            EqualTo(anyAlias.toAttribute, Literal(0L))), windowed)
        // group by the rowid pair alone ([[firstOf]] reconstructs the
        // outputs — all functionally dependent on the pair); the window
        // and this aggregate share the rowid clustering, so no second
        // shuffle is planned between them
        val dedup = Aggregate(
          Seq(rowId.toAttribute, factRowId.toAttribute), firstOf(j.output), kept)
        Some(dedup)

      case FullOuter =>
        // both sides preserved: explode the interval side on a one-shot
        // rowid, full-outer bucketed join, then collapse interval-side
        // explode duplicates exactly as the LeftOuter case — with one
        // twist: unmatched FACT rows surface with a NULL rowid, and a
        // window partitioned on the bare rowid would funnel every one of
        // them (the common case at scale) into a single null partition.
        // Each fact row carries its own id, so the partition key is
        // coalesce(rowid, −factRowId − 1): real intervals keep their
        // (non-negative) rowid, each unmatched fact row becomes its own
        // single-row partition (strictly negative — the id spaces cannot
        // collide), and the any-match flag still aggregates over exactly
        // the rows of one preserved interval row.
        val rowId = freshRowId("__graft_rowid")
        val withId = Project(intervalSide.output :+ rowId, intervalSide)
        val (exploded, genAttr) = explodedInterval(outer = true, withId)
        val factRowId = freshRowId("__graft_rowid_r")
        val factB =
          Project(factSide.output :+ bucketAlias :+ factRowId, factSide)
        val newCond = And(EqualTo(genAttr, bucketAlias.toAttribute), cond)
        val (jl, jr) =
          if (factOnLeft) (factB, exploded) else (exploded: LogicalPlan, factB: LogicalPlan)
        val fouter = Join(jl, jr, FullOuter, Some(newCond), JoinHint.NONE)
        val mAlias = Alias(
          If(And(IsNotNull(bucketAlias.toAttribute), IsNotNull(genAttr)),
            Literal(1L), Literal(0L)),
          "__graft_m")()
        val flagged = Project(fouter.output :+ mAlias, fouter)
        val partKey = Alias(
          Coalesce(Seq(rowId.toAttribute,
            Subtract(Literal(-1L), factRowId.toAttribute))),
          "__graft_part")()
        val keyed = Project(flagged.output :+ partKey, flagged)
        val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
        val anyAlias = Alias(
          WindowExpression(
            AggregateExpression(Max(mAlias.toAttribute), Complete, isDistinct = false),
            WindowSpecDefinition(Seq(partKey.toAttribute), Nil, frame)),
          "__graft_any")()
        val windowed = Window(Seq(anyAlias), Seq(partKey.toAttribute), Nil, keyed)
        val kept = Filter(
          Or(EqualTo(mAlias.toAttribute, Literal(1L)),
            EqualTo(anyAlias.toAttribute, Literal(0L))), windowed)
        val dedup = Aggregate(
          Seq(rowId.toAttribute, factRowId.toAttribute), firstOf(j.output), kept)
        Some(dedup)

      case _ => None
    }
  }
}
