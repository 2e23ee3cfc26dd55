package graft.udf

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One ANN candidate: rounded cosine + neighbor id. Field order matters —
  * the udaf input struct binds positionally.
  */
final case class Cand(cos: Double, nId: Long)

/** Bounded top-k candidate aggregator under the shared ANN ranking order
  * (cos desc, n_id asc) — O(k) state per query group no matter how many
  * candidates the probe join emits.
  *
  * This replaces a `row_number() OVER (PARTITION BY q_id ORDER BY ...) ≤ 3`
  * window in the IVF search tail. Honest accounting of what it buys:
  * Spark 4's WindowGroupLimit optimization already bounded the window
  * spelling's SHUFFLE (a partial limit keeps ≤ k candidates per query per
  * map task ahead of the exchange — PLANS.md documents the
  * `WindowGroupLimit ... Partial` node on the LSH twin), so the exchange
  * volume is comparable either way. What the window spelling still pays
  * is the SORT: both the partial and final WindowGroupLimit sort their
  * whole candidate run by (q_id, cos desc, n_id) to apply the limit —
  * O(m log m) over every scored pair. The Aggregator replaces that with
  * one O(k) sorted-buffer insert per pair inside a hash aggregate (no
  * sort operator anywhere) — measured ~8% off the doc-ANN search tail at
  * sf0.1, and the asymptotic win grows with candidates-per-task at 100 TB.
  *
  * Merge is associative/commutative (same insert), so map-side combine
  * applies. The buffer is kept sorted best-first; inserts shift in place
  * at capacity (the [[BottomK]] zero-garbage discipline). Ties cannot
  * occur on equal (cos, nId) pairs — a candidate appears at most once per
  * query (each index row lives in exactly one cell) — but the comparator
  * is total anyway.
  */
final class TopKCand(k: Int) extends Aggregator[Cand, Array[Cand], Array[Cand]] {
  require(k > 0, s"k must be positive, got $k")

  def zero: Array[Cand] = Array.empty

  def reduce(buf: Array[Cand], v: Cand): Array[Cand] = insert(buf, v)

  def merge(a: Array[Cand], b: Array[Cand]): Array[Cand] = b.foldLeft(a)(insert)

  def finish(buf: Array[Cand]): Array[Cand] = buf

  // strict "ranks before" under (cos desc, nId asc)
  private def before(a: Cand, b: Cand): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.nId < b.nId)

  private def insert(buf: Array[Cand], v: Cand): Array[Cand] = {
    var ins = 0
    while (ins < buf.length && before(buf(ins), v)) ins += 1
    if (ins >= k) buf
    else if (buf.length == k) {
      System.arraycopy(buf, ins, buf, ins + 1, k - ins - 1)
      buf(ins) = v
      buf
    } else {
      val out = new Array[Cand](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    }
  }

  def bufferEncoder: Encoder[Array[Cand]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Cand]] = ExpressionEncoder()
}

/** [[TopKCand]] for candidate relations with DUPLICATE arrivals: an nId
  * already in the buffer is skipped instead of inserted twice, so a
  * multi-band/multi-probe bucket join can fold its raw match stream
  * straight into the aggregate WITHOUT a pair-level `distinct()` first —
  * at the sf1.0 rehearsal the probed-LSH search emitted ~10⁸ raw matches
  * whose distinct was the single largest shuffle in the suite, all of it
  * avoidable because only ≤ k survivors per query were ever wanted.
  *
  * CONTRACT: a given (group, nId) must always arrive with the SAME score
  * (true for any deterministic pair function — hamming, cosine); then
  * presence-dedup commutes with the top-k order and merging per-partition
  * buffers yields exactly the global top-k over the deduped relation. The
  * presence scan is O(k) per insert with k ≤ ~32 — cheaper than the
  * shuffle it replaces by orders of magnitude.
  */
final class TopKCandDistinct(k: Int) extends Aggregator[Cand, Array[Cand], Array[Cand]] {
  require(k > 0, s"k must be positive, got $k")

  def zero: Array[Cand] = Array.empty

  def reduce(buf: Array[Cand], v: Cand): Array[Cand] = insert(buf, v)

  def merge(a: Array[Cand], b: Array[Cand]): Array[Cand] = b.foldLeft(a)(insert)

  def finish(buf: Array[Cand]): Array[Cand] = buf

  private def before(a: Cand, b: Cand): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.nId < b.nId)

  private def insert(buf: Array[Cand], v: Cand): Array[Cand] = {
    var i = 0
    while (i < buf.length) { if (buf(i).nId == v.nId) return buf; i += 1 }
    var ins = 0
    while (ins < buf.length && before(buf(ins), v)) ins += 1
    if (ins >= k) buf
    else if (buf.length == k) {
      System.arraycopy(buf, ins, buf, ins + 1, k - ins - 1)
      buf(ins) = v
      buf
    } else {
      val out = new Array[Cand](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    }
  }

  def bufferEncoder: Encoder[Array[Cand]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Cand]] = ExpressionEncoder()
}
