package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
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
  * Eligibility (conservative — anything else is left to Spark's planner):
  *  - inner join, no join hints, deterministic condition;
  *  - the conjunction contains a lower and an upper bound tying ONE
  *    point expression `t` (from one side) to two bound expressions from
  *    the other side — `>=`/`>` and `<=`/`<` in either operand order;
  *  - NO cross-side equality conjunct (with an equi-key Spark already
  *    plans a shuffle join and the extra bucket would only skew it);
  *  - both sides' size estimates exceed the broadcast threshold (below
  *    it, the nested-loop join over a broadcast build side is the better
  *    plan and `TemporalJoins.intervalJoin` uses it deliberately);
  *  - `t`/`lo`/`hi` are timestamps (TZ or NTZ) or integral epochs.
  *
  * The rewritten join carries the bucket equality AND the original
  * condition, so correctness never depends on the bucketing (buckets
  * merely cover the range; the exact predicate prunes). Intervals with
  * null bounds produce no buckets (Sequence propagates null, Generate
  * drops it); inverted bounds (`lo > hi`) explicitly produce an EMPTY
  * bucket array — matching the theta join, which such a row can never
  * satisfy — rather than Sequence's default descending walk. The rewrite
  * is self-stabilizing in the fixed-point optimizer batch: its own output
  * contains a cross-side equality, which fails eligibility.
  *
  * Bucket width is `spark.graft.intervalJoin.bucketSeconds` (default one
  * day): the explode factor per interval row is `⌈span/width⌉ + 1`, so
  * size it ≳ the median interval span. A row whose span would explode
  * past `spark.graft.intervalJoin.maxBucketsPerRow` (default 100 000 —
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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), hint)
          if hint == JoinHint.NONE && cond.deterministic =>
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

  private def rewrite(j: Join): Option[LogicalPlan] = {
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

    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
    if (hasEquiKey) return None

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
      val b = bucketSeconds
      (bucketOf(lo.t, b), bucketOf(lo.bound, b), bucketOf(hi.bound, b)) match {
        case (Some(tB), Some(loB), Some(hiB)) =>
          val (factSide, intervalSide) =
            if (lo.tOnLeft) (j.left, j.right) else (j.right, j.left)
          val bucketAlias = Alias(tB, "__graft_bucket")()
          val factWithBucket =
            Project(factSide.output :+ bucketAlias, factSide)
          val genAttr =
            AttributeReference("__graft_bucket_i", LongType, nullable = false)()
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
              s"buckets of $b s; raise $BucketKey / $MaxBucketsKey or " +
              s"disable $EnabledKey")), arrTy)
          val buckets = If(LessThan(hiB, loB), emptyBuckets,
            If(GreaterThan(Subtract(hiB, loB), Literal(cap)), tooWide, seqExpr))
          val exploded = Generate(
            Explode(buckets),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(genAttr), child = intervalSide)
          val newCond =
            And(EqualTo(bucketAlias.toAttribute, genAttr), j.condition.get)
          val (newLeft, newRight) =
            if (lo.tOnLeft) (factWithBucket, exploded)
            else (exploded: LogicalPlan, factWithBucket: LogicalPlan)
          Some(Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), JoinHint.NONE)))
        case _ => None
      }
    }
  }
}
