package graft.streaming

/** Client-side PutRecordBatch planner — the reference's core batching
  * invariant (SURVEY §0.1 step 5, public AWS Firehose limits): at most 500
  * records and 4 MiB per call, at most 1000 KiB per record; input order
  * preserved. Pure function so the ScalaCheck properties (SURVEY §5.3) can
  * exercise it directly, and `FirehoseSink` applies it per executor
  * partition — never on the driver.
  */
object Batcher {
  val MaxRecordsPerBatch = 500
  val MaxBatchBytes: Long = 4L * 1024 * 1024
  val MaxRecordBytes: Long = 1000L * 1024

  /** Legal batches in input order plus records rejected as oversized
    * (> 1000 KiB — Firehose would refuse them regardless of batching).
    */
  final case class Plan[A](batches: Vector[Vector[A]], oversized: Vector[A])

  def plan[A](records: Iterable[A])(sizeOf: A => Long): Plan[A] = {
    val oversized = Vector.newBuilder[A]
    val batches = Vector.newBuilder[Vector[A]]
    var cur = Vector.newBuilder[A]
    var curN = 0
    var curBytes = 0L
    def flush(): Unit = if (curN > 0) {
      batches += cur.result()
      cur = Vector.newBuilder[A]; curN = 0; curBytes = 0L
    }
    records.foreach { r =>
      val sz = sizeOf(r)
      if (sz > MaxRecordBytes) oversized += r
      else {
        if (curN + 1 > MaxRecordsPerBatch || curBytes + sz > MaxBatchBytes) flush()
        cur += r; curN += 1; curBytes += sz
      }
    }
    flush()
    Plan(batches.result(), oversized.result())
  }

  /** Delivery outcome: every input record lands in exactly one of
    * `delivered` / `dead` (SURVEY §5.3 retry invariant).
    */
  final case class Outcome[A](delivered: Vector[A], dead: Vector[A], calls: Int)

  /** PutRecordBatch with partial-failure retry (SURVEY §0.1 step 6):
    * `put` simulates one API call, returning a per-record success flag
    * (the FailedPutCount / per-record error entries of the real response).
    * Failed records are re-planned into fresh batches and retried up to
    * `maxAttempts` total attempts, then dead-lettered. Oversized records
    * are dead on arrival.
    */
  def deliver[A](records: Iterable[A], maxAttempts: Int)(sizeOf: A => Long)(
      put: Vector[A] => Vector[Boolean]): Outcome[A] = {
    val p0 = plan(records)(sizeOf)
    val delivered = Vector.newBuilder[A]
    var dead = p0.oversized
    var pending = p0.batches
    var attempt = 0
    var calls = 0
    while (pending.nonEmpty && attempt < maxAttempts) {
      attempt += 1
      val failed = Vector.newBuilder[A]
      pending.foreach { batch =>
        calls += 1
        val acks = put(batch)
        require(acks.length == batch.length, "put must ack every record")
        batch.lazyZip(acks).foreach { (r, ok) =>
          if (ok) delivered += r else failed += r
        }
      }
      pending =
        if (attempt < maxAttempts) plan(failed.result())(sizeOf).batches
        else { dead ++= failed.result(); Vector.empty }
    }
    Outcome(delivered.result(), dead, calls)
  }
}
