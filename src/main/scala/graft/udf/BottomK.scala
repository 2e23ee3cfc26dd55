package graft.udf

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k distinct sketch over 64-bit hashes.
  *
  * Keeps the k smallest *distinct* values seen, as a sorted array — O(k)
  * state per group no matter how many rows the group has. This is the
  * classic bottom-k minwise sketch (Cohen & Kaplan, "Summarizing data using
  * bottom-k sketches", PODC 2007): for two sets A, B sketched as S_k(A),
  * S_k(B), the unbiased Jaccard estimate is
  *
  *   |S_k(A∪B) ∩ S_k(A) ∩ S_k(B)| / |S_k(A∪B)|
  *
  * where S_k(A∪B) = the k smallest of S_k(A) ∪ S_k(B). When |A∪B| <= k the
  * estimate is exact. Used by `q_dedup_near`'s verify stage so per-doc
  * aggregation state stays bounded (a 1 GB document costs the same 1 KB of
  * state as a tweet), unlike a collect_set of every shingle hash.
  *
  * Merge is associative/commutative, so Spark's partial aggregation
  * (map-side combine before the shuffle) applies as usual.
  */
final class BottomK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(buf: Array[Long], v: Long): Array[Long] = insert(buf, v)

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = b.foldLeft(a)(insert)

  def finish(buf: Array[Long]): Array[Long] = buf

  // Sorted-array insert with dedup and cap; O(log k) search + O(k) shift.
  // Once the buffer reaches capacity k (the steady state for any group
  // with > k distinct values) the insert shifts IN PLACE — zero
  // allocation per accepted row, vs a fresh O(k) copy each time (ADVICE
  // r3: 1 KB of garbage per accepted row at k = 128). Spark's typed
  // Aggregator owns its buffer object between reduce calls, so in-place
  // mutation is the intended usage. Growth below k still allocates
  // (bounded: at most k times per partial aggregate).
  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, v)
    if (i >= 0) buf // already present: distinct semantics
    else {
      val ins = -i - 1
      if (ins >= k) buf // larger than the current k-th smallest
      else if (buf.length == k) {
        // at capacity: drop the current max, shift the tail right in place
        System.arraycopy(buf, ins, buf, ins + 1, k - ins - 1)
        buf(ins) = v
        buf
      } else {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      }
    }
  }

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
