package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure Hamilton seat math behind
  * [[Curation.apportion]] (no Spark session needed): the invariants the
  * example-based spec can't sweep.
  */
object ApportionProps extends Properties("Apportion") {

  private val weightsGen: Gen[Map[String, Long]] = for {
    k <- Gen.choose(1, 12)
    ws <- Gen.listOfN(k, Gen.choose(0L, 50L))
    if ws.sum > 0
  } yield ws.zipWithIndex.map { case (w, i) => s"c$i" -> w }.toMap

  private val nGen: Gen[Long] = Gen.choose(0L, 10000L)

  property("allocations sum exactly to totalN") =
    forAll(weightsGen, nGen) { (w, n) =>
      Curation.hamiltonAlloc(w, n).map(_._5).sum == n
    }

  property("every allocation is base or base + 1") =
    forAll(weightsGen, nGen) { (w, n) =>
      Curation.hamiltonAlloc(w, n).forall { case (_, _, base, _, alloc) =>
        alloc == base || alloc == base + 1
      }
    }

  property("quota: alloc is floor or ceil of the exact proportional share") =
    forAll(weightsGen, nGen) { (w, n) =>
      val den = w.values.sum
      Curation.hamiltonAlloc(w, n).forall { case (c, wt, _, _, alloc) =>
        val fl = n * wt / den // exact floor in integer arithmetic
        val ceil = if (n * wt % den == 0) fl else fl + 1
        alloc == fl || alloc == ceil
      }
    }

  property("zero-weight classes get zero") =
    forAll(weightsGen, nGen) { (w, n) =>
      Curation.hamiltonAlloc(w, n)
        .filter(_._2 == 0L).forall(_._5 == 0L)
    }

  property("deterministic: same inputs, same seats") =
    forAll(weightsGen, nGen) { (w, n) =>
      Curation.hamiltonAlloc(w, n) == Curation.hamiltonAlloc(w, n)
    }
}
