package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.3 property tests for the reference's core batching + retry
  * semantics (PutRecordBatch limits). ScalaCheck is driven directly
  * (scalatestplus bridge is not in the offline cache).
  */
class BatcherSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // Records are (id, size) pairs; sizes cluster around realistic payloads
  // with occasional oversized outliers.
  private val recGen: Gen[(Long, Long)] = for {
    id <- Gen.choose(0L, 1000000L)
    sz <- Gen.frequency(
      8 -> Gen.choose(1L, 64 * 1024L),
      2 -> Gen.choose(64 * 1024L, 2048 * 1024L))
  } yield (id, sz)

  private val recsGen: Gen[List[(Long, Long)]] = Gen.listOf(recGen)

  test("plan: every batch respects the 500-record and 4 MiB limits") {
    check(Prop.forAll(recsGen) { recs =>
      val p = Batcher.plan(recs)(_._2)
      p.batches.forall { b =>
        b.size <= Batcher.MaxRecordsPerBatch &&
        b.map(_._2).sum <= Batcher.MaxBatchBytes
      }
    })
  }

  test("plan: concat(batches) ++ oversized is a permutation-free repartition of input") {
    check(Prop.forAll(recsGen) { recs =>
      val p = Batcher.plan(recs)(_._2)
      val (small, big) = recs.partition(_._2 <= Batcher.MaxRecordBytes)
      p.batches.flatten == small.toVector && p.oversized == big.toVector
    })
  }

  test("plan: oversized records are exactly those above 1000 KiB") {
    check(Prop.forAll(recsGen) { recs =>
      val p = Batcher.plan(recs)(_._2)
      p.oversized.forall(_._2 > Batcher.MaxRecordBytes) &&
      p.batches.flatten.forall(_._2 <= Batcher.MaxRecordBytes)
    })
  }

  test("deliver: delivered ∪ dead ≡ input, disjoint (retry invariant)") {
    check(Prop.forAll(recsGen, Gen.choose(1, 4)) { (recs, maxAttempts) =>
      // fail any record whose id is divisible by 3 on its first attempt,
      // and permanently if divisible by 9.
      val seen = scala.collection.mutable.Set.empty[Long]
      val out = Batcher.deliver(recs, maxAttempts)(_._2) { b =>
        b.map { case (id, _) =>
          if (id % 9 == 0) false
          else if (id % 3 == 0 && seen.add(id)) false
          else true
        }
      }
      val inIds = recs.map(_._1).sorted
      val outIds = (out.delivered ++ out.dead).map(_._1).sorted
      outIds == inIds
    })
  }

  test("deliver: transient failures are retried to success, permanent go to DLQ") {
    val recs = (1L to 2000L).map(id => (id, 100L))
    val seen = scala.collection.mutable.Set.empty[Long]
    val out = Batcher.deliver(recs, maxAttempts = 3)(_._2) { b =>
      b.map { case (id, _) =>
        if (id % 30 == 0) false
        else if (id % 3 == 0 && seen.add(id)) false
        else true
      }
    }
    assert(out.dead.map(_._1).toSet == recs.map(_._1).filter(_ % 30 == 0).toSet)
    assert(out.delivered.size + out.dead.size == recs.size)
    // batching amortization: 2000 records / 500 per call = 4 first-round
    // calls + retry rounds, far fewer than one call per record.
    assert(out.calls < 20)
  }
}
