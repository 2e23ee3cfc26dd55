package graft.udf

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries theorem under ARBITRARY partial/merge structure: for
  * any stream split into any segments reduced separately and merged in
  * any order, every item with true frequency > n/k is in the final
  * candidate set, and state never exceeds k−1 counters. This is the
  * property that makes q_text_heavy_hitters' exact verify pass correct
  * regardless of how Spark orders partial aggregation.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def sketch(k: Int, segments: List[List[String]],
      mergeSeed: Long): Map[String, Long] = {
    val mg = new MisraGries(k)
    val partials = segments.map(seg => seg.foldLeft(mg.zero)(mg.reduce))
    val rnd = new scala.util.Random(mergeSeed)
    // random-order left fold of a random shuffle = arbitrary merge tree edge
    rnd.shuffle(partials).foldLeft(mg.zero)(mg.merge)
  }

  test("every item with freq > n/k survives any segmentation and merge order") {
    // Zipf-ish universe: item i drawn with weight ~ 1/(i+1)
    val itemGen = Gen.frequency((1 to 12).map(i => (13 - i, Gen.const(s"t$i"))): _*)
    val p = Prop.forAll(
      Gen.chooseNum(2, 8),
      Gen.nonEmptyListOf(itemGen),
      Gen.chooseNum(1, 5),
      Gen.long) { (k, stream, nSeg, seed) =>
      val segs = stream.grouped(math.max(1, stream.length / nSeg)).toList
      val buf = sketch(k, segs, seed)
      val n = stream.length
      val freq = stream.groupBy(identity).view.mapValues(_.length.toLong)
      val heavy = freq.filter(_._2 > n.toLong / k).keys.toSet
      val stateBounded = buf.size <= k - 1
      val supersetHolds = heavy.subsetOf(buf.keySet)
      stateBounded && supersetHolds
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"MG guarantee violated: ${res.status}")
  }

  test("finish is sorted and deterministic for a fixed buffer") {
    val mg = new MisraGries(4)
    val buf = List("b", "a", "c", "a", "b", "a").foldLeft(mg.zero)(mg.reduce)
    assert(mg.finish(buf).toList == mg.finish(buf).toList)
    assert(mg.finish(buf).toList == mg.finish(buf).toList.sorted)
  }
}
