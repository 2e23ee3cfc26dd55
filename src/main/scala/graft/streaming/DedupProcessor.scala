package graft.streaming

import graft.streaming.Pipeline.HashedDoc
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Corpus-lifetime seen-set for [[Pipeline.dedupPersistent]]: one
  * ValueState[Long] (the first-seen doc_id) per content hash,
  * `TTLConfig.NONE` because ingestion dedup must remember forever. A
  * batch's rows for an unseen hash elect the min doc_id — the same
  * representative rule as the batch incremental-dedup operator, so a
  * corpus ingested as one batch or as a stream elects identical docs.
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
