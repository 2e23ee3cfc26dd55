package graft.udf

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch over a string stream: at most k−1
  * counters of bounded state per partial aggregate, guaranteeing that
  * EVERY item with true frequency > n/k survives to the candidate set
  * (Misra & Gries 1982; mergeable form per Agarwal et al., "Mergeable
  * summaries", PODS 2012: summing counter maps and subtracting the k-th
  * largest count preserves the ≤ n/k undercount bound).
  *
  * The candidate SET depends on partial-aggregation merge order — Spark
  * does not promise one — so the sketch output itself is deliberately
  * NOT a declared query result. Its consumer (`q_text_heavy_hitters`)
  * re-counts candidates exactly and filters > n/k, which the superset
  * guarantee makes deterministic: the nondeterministic intermediate
  * collapses to an exact, oracle-checkable answer. That two-pass shape
  * is the standard way to get exact heavy hitters without carrying the
  * full vocabulary through a shuffle: the sketch pass moves ≤ k−1
  * counters per partition, the verify pass touches only ≤ k−1 terms.
  *
  * Merge is associative/commutative in the guarantee (any merge order
  * keeps all > n/k items), which is exactly what Spark's partial
  * aggregation requires of a correct Aggregator here.
  */
final class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k > 1, s"k must be > 1, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k - 1 => buf.updated(item, 1L)
      case None =>
        // decrement-all: drops one "vote" for k distinct items at once
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k - 1) summed
    else {
      // subtract the k-th largest count, drop non-positives: ≤ k−1 remain
      val d = summed.values.toArray.sortInPlaceWith(_ > _).apply(k - 1)
      summed.flatMap { case (t, c) => if (c > d) Some(t -> (c - d)) else None }
    }
  }

  def finish(buf: Map[String, Long]): Array[String] =
    buf.keysIterator.toArray.sorted

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[String]] = ExpressionEncoder()
}
