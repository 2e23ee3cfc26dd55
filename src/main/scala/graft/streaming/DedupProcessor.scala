package graft.streaming

import graft.streaming.Pipeline.HashedDoc
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Corpus-lifetime seen-set for [[Pipeline.dedupPersistent]]: one
  * ValueState[Long] (the first-seen doc_id) per content hash,
  * `TTLConfig.NONE` because ingestion dedup must remember forever.
  * Within a micro-batch, rows for an unseen hash elect the min doc_id
  * (the batch incremental-dedup operator's rule); ACROSS micro-batches
  * the election is first-ARRIVAL — a later batch cannot unseat an
  * earlier representative even with a smaller doc_id, so stream and
  * batch ingestion elect identical docs only when arrival order is
  * doc_id order (or the corpus lands in one batch). That is the right
  * semantic for ingestion: the already-published doc wins.
  */
class DedupProcessor extends StatefulProcessor[String, HashedDoc, HashedDoc] {

  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      h: String, rows: Iterator[HashedDoc], timers: TimerValues): Iterator[HashedDoc] =
    if (seen.exists()) Iterator.empty
    else {
      val first = rows.minBy(_.doc_id)
      seen.update(first.doc_id)
      Iterator.single(first)
    }
}
