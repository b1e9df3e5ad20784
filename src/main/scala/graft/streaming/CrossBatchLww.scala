package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** In-engine cross-batch LWW (the `flatMapGroupsWithState` alternative of
  * SURVEY.md ST2): per-key winning event held in Spark's state store
  * instead of the target table. Emits a row only when the key's winner
  * CHANGES (update-log semantics), so downstream sinks receive exactly
  * the accepted writes.
  *
  * Trade-off vs the target-table construction (ReplicationJob): state here
  * is unbounded in key-cardinality (like the reference's target table) and
  * lives in the checkpoint; correct under unbounded lateness because the
  * LWW fold never expires state (NoTimeout). Use when the sink cannot
  * express a conditional upsert; otherwise prefer sink-side state.
  */
object CrossBatchLww {

  final case class KeyedEvent(key: Long, ts_us: Long, event_id: Long, payload: String)
  final case class Winner(key: Long, ts_us: Long, event_id: Long, payload: String)

  def apply(events: Dataset[KeyedEvent]): Dataset[Winner] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Winner, Winner](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[Winner]) =>
          val incoming = rows.map(e => Winner(key, e.ts_us, e.event_id, e.payload))
          val best = (state.getOption.iterator ++ incoming)
            .maxBy(w => (w.ts_us, w.event_id))
          val changed = !state.getOption.contains(best)
          state.update(best)
          if (changed) Iterator.single(best) else Iterator.empty
      }
  }
}
