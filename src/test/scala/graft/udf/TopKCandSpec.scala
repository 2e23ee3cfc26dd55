package graft.udf

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property suite for the bounded top-k aggregator every ANN ranking now
  * rides on: against random candidate multisets and random partition
  * splits, the buffer must agree exactly with the reference
  * sort-and-take under (cos desc, nId asc), and merge must be
  * split-insensitive — the partial-aggregation contract Spark assumes.
  * ScalaCheck is driven directly (the scalatestplus bridge is not in the
  * offline cache — the BatcherSpec pattern).
  */
class TopKCandSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val agg = new TopKCand(3)

  private def ref(xs: Seq[Cand]): Seq[Cand] =
    xs.sortBy(c => (-c.cos, c.nId)).take(3)

  // distinct ids: a candidate appears at most once per query group (the
  // documented precondition of every consumer); cos values repeat freely
  private val candsGen: Gen[List[Cand]] = for {
    n <- Gen.choose(0, 40)
    ids <- Gen.pick(n, 0L until 1000L)
    cs <- Gen.listOfN(n, Gen.choose(-10000, 10000).map(_ / 10000.0))
  } yield ids.zip(cs).map { case (i, c) => Cand(c, i) }.toList

  test("reduce over any input equals sort-and-take-3") {
    check(Prop.forAll(candsGen) { xs =>
      xs.foldLeft(agg.zero)(agg.reduce).toSeq == ref(xs)
    })
  }

  test("merge of any split equals the unsplit run (partial-agg contract)") {
    check(Prop.forAll(candsGen, Gen.choose(0, 40)) { (xs, cut0) =>
      val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce)).toSeq
      merged == ref(xs)
    })
  }

  test("ties on cos break by ascending id") {
    val xs = List(Cand(0.5, 7), Cand(0.5, 3), Cand(0.5, 9), Cand(0.5, 1))
    assert(xs.foldLeft(agg.zero)(agg.reduce).toSeq ==
      Seq(Cand(0.5, 1), Cand(0.5, 3), Cand(0.5, 7)))
  }

  test("buffer never exceeds k and stays best-first sorted") {
    check(Prop.forAll(candsGen) { xs =>
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      buf.length <= 3 && buf.toSeq == ref(xs).take(buf.length)
    })
  }
}
