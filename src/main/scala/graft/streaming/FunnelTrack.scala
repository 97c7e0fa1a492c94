package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming funnel tracking with mapGroupsWithState — the online twin
  * of the batch funnel (graft.pipeline.Temporal.funnel): per user,
  * remember the first click and emit a conversion record the moment a
  * purchase at/after it arrives. The batch query answers "who
  * converted"; this answers it continuously, with O(1) state per user.
  *
  * Scale: state is two longs per user with clicks pending conversion;
  * ProcessingTimeTimeout evicts users whose funnel went cold, so state
  * is bounded by the active-user set, not the stream's history.
  */
object FunnelTrack {

  case class Ev(user_id: Long, event_time: Timestamp, event_type: String)

  /** firstClickMs = -1 until a click is seen; converted funnels remove
    * their state (a user can re-enter the funnel with a later click). */
  case class FunnelState(firstClickMs: Long)

  case class Conversion(
      user_id: Long,
      first_click: Timestamp,
      purchase_time: Timestamp)

  val IdleTimeoutMs: Long = 60 * 60 * 1000L

  /** Emits one Conversion per completed click→purchase funnel. Events
    * inside a micro-batch are processed in event-time order, so a
    * click and purchase arriving together still convert. Production
    * passes ProcessingTimeTimeout (idle funnels evicted); tests pass
    * NoTimeout so processAllAvailable settles. */
  def conversions(events: Dataset[Ev],
                  timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), timeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.event_time.getTime)
            var clickMs = state.getOption.map(_.firstClickMs).getOrElse(-1L)
            val out = Seq.newBuilder[Conversion]
            sorted.foreach { e =>
              e.event_type match {
                case "click" if clickMs < 0 =>
                  clickMs = e.event_time.getTime
                case "purchase" if clickMs >= 0 &&
                    e.event_time.getTime >= clickMs =>
                  out += Conversion(user, new Timestamp(clickMs), e.event_time)
                  clickMs = -1L // funnel completed; user may re-enter
                case _ => ()
              }
            }
            if (clickMs >= 0) {
              state.update(FunnelState(clickMs))
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
                state.setTimeoutDuration(IdleTimeoutMs)
            } else if (state.exists) state.remove()
            out.result().iterator
          }
      }
  }
}
