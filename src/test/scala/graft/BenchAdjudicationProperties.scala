package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for [[BenchAdjudication]] — pure arithmetic,
  * no Spark, so these run at full ScalaCheck sample counts (unlike
  * [[GraftProperties]], which caps samples because each evaluates a
  * Spark job). Complements the example-based [[BenchAdjudicationSpec]]:
  * the examples pin the designed scenarios; these pin the algebra for
  * arbitrary sessions.
  */
object BenchAdjudicationProperties
    extends Properties("bench-adjudication") {
  import BenchAdjudication._

  private val genHist: Gen[Double] = Gen.choose(0.05, 10.0)
  private val genPositions: Gen[Vector[Int]] =
    Gen.choose(1, 8).map(n => (0 until n).map(_ * 20).toVector :+ n * 20)
  private def genCps(histCheap: Double, histMid: Double,
                     lo: Double, hi: Double): Gen[Checkpoints] =
    for {
      pos <- genPositions
      ch <- Gen.listOfN(pos.size, Gen.choose(lo, hi).map(_ * histCheap))
      md <- Gen.listOfN(pos.size, Gen.choose(lo, hi).map(_ * histMid))
    } yield Checkpoints(pos, ch.toVector, md.toVector)

  property("localFactor always lands in [1, cap], holes and all") =
    forAll(genHist, genHist, Gen.choose(0, 200),
      genCps(1.0, 1.0, 0.1, 6.0)) { (hc, hm, i, cps0) =>
      // Punch -1 holes into half the readings to exercise the skip path.
      val cps = Checkpoints(cps0.positions,
        cps0.cheap.zipWithIndex.map { case (v, j) => if (j % 2 == 0) -1.0 else v },
        cps0.mid)
      val f = localFactor(cps, i, hc, hm)
      f >= 1.0 && f <= FactorCap
    }

  property("uniform host perturbation (k <= cap) never changes the flag set") =
    forAll(
      Gen.listOfN(12, Gen.zip(Gen.identifier.map(_.take(8)), genHist)),
      Gen.choose(1.0, 2.45), Gen.choose(0.1, 4.0)) { (entries, k, mult) =>
      val history = entries.toMap
      val histCheap = 0.3
      val histMid = 1.0
      val names = history.keys.toSeq.sorted
      // Readings at an arbitrary multiple of each query's history time,
      // spread across positions; quiet session = checkpoints exactly at
      // the history baskets.
      val indexed = names.zipWithIndex.map { case (n, i) =>
        (n, history(n) * mult * (1.0 + (i % 3) * 0.31), i * 5) }
      val nPos = Vector(0, 20, 40, 60)
      val quiet = Checkpoints(nPos, Vector.fill(4)(histCheap),
        Vector.fill(4)(histMid))
      val noisy = Checkpoints(nPos, Vector.fill(4)(histCheap * k),
        Vector.fill(4)(histMid * k))
      val base = overBudget(indexed, history, quiet, histCheap, histMid)
      val scaled = overBudget(
        indexed.map { case (n, t, i) => (n, t * k, i) },
        history, noisy, histCheap, histMid)
      Prop(base == scaled) :| s"quiet=$base noisy=$scaled k=$k"
    }

  property("a flag always implies a raw 2x-of-history breach (factor >= 1 never manufactures flags)") =
    forAll(
      Gen.listOfN(10, Gen.zip(Gen.identifier.map(_.take(8)), genHist)),
      Gen.choose(0.1, 6.0),
      genCps(0.3, 1.0, 0.4, 6.0)) { (entries, mult, cps) =>
      val history = entries.toMap
      val indexed = history.keys.toSeq.sorted.zipWithIndex.map {
        case (n, i) => (n, history(n) * mult, i * 7) }
      val flagged = overBudget(indexed, history, cps, 0.3, 1.0).toSet
      val byName = indexed.map(r => r._1 -> r._2).toMap
      flagged.forall(n => byName(n) > 2.0 * history(n))
    }

  property("no-history queries flag exactly on the first-measurement floor") =
    forAll(Gen.choose(0.1, 8.0), genCps(0.3, 1.0, 0.4, 6.0)) { (t, cps) =>
      val flagged = overBudget(Seq(("q_new", t, 10)), Map.empty, cps,
        0.3, 1.0)
      if (t > FloorSec) flagged == Seq("q_new") else flagged.isEmpty
    }

  property("raising a sentinel reading never shrinks any budget (factor monotone)") =
    forAll(genHist, genHist, Gen.choose(0, 80),
      genCps(1.0, 1.0, 0.4, 3.0), Gen.choose(1.0, 3.0)) {
      (hc, hm, i, cps, bump) =>
      val bumped = Checkpoints(cps.positions, cps.cheap.map(_ * bump),
        cps.mid)
      localFactor(bumped, i, hc, hm) >= localFactor(cps, i, hc, hm)
    }
}
