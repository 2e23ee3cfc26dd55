package graft.udf

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.12 typed-UDAF demonstration: element-wise centroid over
  * Array[Double] embedding vectors, registered via `functions.udaf`.
  *
  * The buffer is associatively mergeable, so Spark runs it as a proper
  * two-phase aggregation (map-side partial + reduce-side merge) — the shape
  * that survives a 1000-executor shuffle. Every t2 query deliberately uses
  * built-in expressions instead (they get whole-stage codegen); this exists
  * to pin the extension point.
  */
final case class CentroidBuf(sum: Array[Double], n: Long)

object VectorCentroid extends Aggregator[Array[Double], CentroidBuf, Array[Double]] {
  def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

  // Ragged inputs are legal: the accumulator grows to the longest vector
  // seen (missing trailing elements count as 0), so a stray short/long
  // embedding degrades gracefully instead of throwing AIOOBE mid-shuffle.
  private def addInto(acc: Array[Double], v: Array[Double]): Array[Double] = {
    val out = if (v.length > acc.length) java.util.Arrays.copyOf(acc, v.length) else acc
    var i = 0
    while (i < v.length) { out(i) += v(i); i += 1 }
    out
  }

  def reduce(b: CentroidBuf, v: Array[Double]): CentroidBuf =
    if (v == null) b
    else if (b.n == 0L) CentroidBuf(v.clone(), 1L)
    else CentroidBuf(addInto(b.sum, v), b.n + 1)

  def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else CentroidBuf(addInto(a.sum, b.sum), a.n + b.n)

  def finish(b: CentroidBuf): Array[Double] =
    if (b.n == 0L) Array.emptyDoubleArray else b.sum.map(_ / b.n)

  def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
