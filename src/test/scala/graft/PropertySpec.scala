package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ExtractLayout
import graft.streaming.Sessionize

/**
 * Property-based invariants (ScalaCheck without the scalatest bridge —
 * Prop + Test.check directly).
 */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(result.passed, result.status.toString)
  }

  private val gapUs = Sessionize.gapUs(30)

  private val evsGen: Gen[List[Sessionize.Ev]] = for {
    n <- Gen.choose(0, 40)
    ts <- Gen.listOfN(n, Gen.choose(0L, 10L * gapUs))
  } yield ts.map(t => Sessionize.Ev(1L, t, 1.0))

  test("sessionize fold conserves events and values") {
    check(Prop.forAll(evsGen) { evs =>
      val (closed, open) = Sessionize.fold(evs, gapUs, None)
      val all = closed ++ open
      all.map(_.n).sum == evs.length &&
        math.abs(all.map(_.total).sum - evs.map(_.value).sum) < 1e-9
    })
  }

  test("sessionize fold respects the gap on both sides") {
    check(Prop.forAll(evsGen) { evs =>
      val (closed, open) = Sessionize.fold(evs, gapUs, None)
      val all = closed ++ open
      val ordered = all.sortBy(_.startUs)
      val within = all.forall(s => s.endUs - s.startUs >= 0)
      val between = ordered.sliding(2).forall {
        case Seq(a, b) => b.startUs - a.endUs > gapUs
        case _ => true
      }
      within && between
    })
  }

  test("extract layout buckets contain their slot and never overlap") {
    val gen = for {
      slot <- Gen.choose(0L, 200_000_000L)
      per <- Gen.choose(1L, 100_000L)
    } yield (slot, per)
    check(Prop.forAll(gen) { case (slot, per) =>
      val d = ExtractLayout.dirFor(slot, per)
      val Array(lo, hi) = d.split("_").map(_.toLong)
      lo <= slot && slot <= hi && (hi - lo + 1) == per && lo % per == 0
    })
  }

  test("backoff schedule doubles and stays within the cap") {
    val gen = for {
      w <- Gen.choose(1, 30)
      m <- Gen.choose(30, 600)
    } yield (w, m)
    check(Prop.forAll(gen) { case (w, m) =>
      val s = ExtractLayout.backoffSchedule(w, m)
      s.nonEmpty && s.head == w && s.forall(_ <= m) &&
        s.sliding(2).forall { case Seq(a, b) => b == a * 2; case _ => true }
    })
  }

  test("extract slot walk covers [min,max] exactly once in either direction") {
    val gen = for {
      a <- Gen.choose(0L, 1_000_000L)
      b <- Gen.choose(0L, 1_000_000L)
    } yield (a, b)
    check(Prop.forAll(gen) { case (a, b) =>
      val walk = graft.etl.ExtractClient.slots(a, Some(b)).toList
      val lo = math.min(a, b)
      val hi = math.max(a, b)
      walk.length == (hi - lo + 1) &&
        walk.head == a && walk.last == b &&
        walk.toSet == (lo to hi).toSet
    })
  }

  test("ntile bucket arithmetic matches the rank definition for any N") {
    // the decile formula q_ntile_spread distributes: first (N mod k)
    // buckets get ceil(N/k) rows, the rest floor(N/k) — verified
    // against a direct per-rank simulation
    val gen = for {
      n <- Gen.choose(1L, 5000L)
      k <- Gen.choose(1, 20)
    } yield (n, k)
    check(Prop.forAll(gen) { case (n, k) =>
      val q = n / k
      val rem = n % k
      val bigCut = (q + 1) * rem
      def bucketOf(rnk: Long): Long =
        if (rnk <= bigCut) (rnk - 1) / (q + 1) + 1
        else rem + (rnk - 1 - bigCut) / q + 1
      val sizes = (1L to n).map(bucketOf).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val expected = (1 to k).map(b =>
        b.toLong -> (if (b <= rem) q + 1 else q)).filter(_._2 > 0).toMap
      sizes == expected &&
        (1L to n).map(bucketOf) == (1L to n).map(bucketOf).sorted
    })
  }
}
