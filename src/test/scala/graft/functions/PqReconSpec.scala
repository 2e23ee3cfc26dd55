package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit contract of the native PQ encode/reconstruct expression
  * (graftnative.PqRecon): nearest codeword per subspace by 4dp-rounded
  * squared L2, first-minimal tie-break over the id-sorted codebook,
  * null on empty/short inputs.
  */
class PqReconSpec extends SparkSpec {
  import spark.implicits._

  private def recon(v: Seq[Double], cb: Seq[Seq[Double]], m: Int, sub: Int): Option[Seq[Double]] = {
    val df = Seq((v, cb)).toDF("v", "cb")
      .selectExpr(s"graft_pq_recon(v, cb, $m, $sub) AS r")
    val row = df.collect().head
    if (row.isNullAt(0)) None else Some(row.getSeq[Double](0))
  }

  test("picks the nearest codeword independently per subspace") {
    // 2 subspaces × 2 dims; codeword 0 matches the first half,
    // codeword 1 the second — the reconstruction mixes them
    val v = Seq(1.0, 2.0, 30.0, 40.0)
    val cb = Seq(
      Seq(1.0, 2.0, 9.0, 9.0),
      Seq(5.0, 5.0, 30.0, 40.0))
    assert(recon(v, cb, 2, 2).contains(Seq(1.0, 2.0, 30.0, 40.0)))
  }

  test("exact tie elects the earlier (smaller-id) codeword") {
    // both codewords are equidistant from v in subspace 0
    val v = Seq(0.0, 0.0)
    val cb = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0))
    assert(recon(v, cb, 1, 2).contains(Seq(1.0, 0.0)))
  }

  test("sub-4dp distance differences collapse into the rounded tie") {
    // distances 0.00001 vs 0.00002 both round to 0.0000 → earlier wins
    val v = Seq(0.0)
    val cb = Seq(Seq(math.sqrt(0.00002)), Seq(math.sqrt(0.00001)))
    assert(recon(v, cb, 1, 1).contains(Seq(math.sqrt(0.00002))))
  }

  test("empty codebook and short vectors yield null") {
    assert(recon(Seq(1.0, 2.0), Seq.empty, 1, 2).isEmpty)
    assert(recon(Seq(1.0), Seq(Seq(1.0, 2.0)), 1, 2).isEmpty)
  }

  test("matches the interpreted HOF argmin on a randomized batch") {
    val rnd = new scala.util.Random(7)
    val d = 8; val m = 4; val sub = 2
    val cb = Seq.fill(5)(Seq.fill(d)(rnd.nextDouble()))
    (1 to 20).foreach { _ =>
      val v = Seq.fill(d)(rnd.nextDouble())
      val expected = (0 until m).flatMap { mi =>
        val best = cb.zipWithIndex.minBy { case (cv, i) =>
          val s = (0 until sub).map { j =>
            val diff = v(mi * sub + j) - cv(mi * sub + j); diff * diff
          }.sum
          (BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, i)
        }._1
        (0 until sub).map(j => best(mi * sub + j))
      }
      assert(recon(v, cb, m, sub).contains(expected))
    }
  }
}
