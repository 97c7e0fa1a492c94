package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import java.sql.Timestamp

import Sessionize.{GapMs, SessionOut, SessionState, Txn}

/** [[Sessionize]] re-expressed on Spark 4's transformWithState — the
  * successor API to flatMapGroupsWithState. Same gap-based sessions,
  * same output rows, but the state surface is the new typed handle
  * model: named `ValueState` slots fetched in `init` (instead of one
  * opaque GroupState), explicit per-key timers (`registerTimer` /
  * `handleExpiredTimer` instead of a single timeout mode baked into
  * the operator), and a declared `TimeMode` that makes processing- vs
  * event-time eviction a call-site choice. At scale this is the shape
  * to prefer: TWS supports multiple independent state variables per
  * key, state TTL, and evolves under the operator metadata the
  * RocksDB provider checkpoints.
  *
  * Timer policy mirrors Sessionize's timeout flexibility: under
  * TimeMode.None (tests — `processAllAvailable` settles) no timers
  * fire and sessions close only by gap; under ProcessingTime the
  * processor arms a GapMs timer per event and emits the idle session
  * when it expires.
  */
object SessionizeTws {

  class SessionProcessor extends StatefulProcessor[String, Txn, SessionOut] {
    @transient private var state: ValueState[SessionState] = _
    // the currently-armed timer's expiry, in PROCESSING time — kept in
    // its own state slot (the multi-variable capability TWS adds over
    // GroupState). Timer bookkeeping must never compare against the
    // session's EVENT-time lastMs: during a backlog replay event time
    // lags wall clock by hours, and any event-vs-processing comparison
    // would close live sessions (or never close idle ones when event
    // time leads).
    @transient private var armed: ValueState[Long] = _
    @transient private var useTimers: Boolean = false

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
      useTimers = timeMode == TimeMode.ProcessingTime()
    }

    private def closed(account: String, s: SessionState): SessionOut =
      SessionOut(account, s.count, s.total,
        new Timestamp(s.startMs), new Timestamp(s.lastMs), closed = true)

    override def handleInputRows(account: String, rows: Iterator[Txn],
        timers: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(_.event_time.getTime)
      var cur = if (state.exists()) Some(state.get()) else None
      val out = Seq.newBuilder[SessionOut]
      sorted.foreach { t =>
        val ms = t.event_time.getTime
        cur match {
          case Some(s) if ms - s.lastMs > GapMs =>
            out += closed(account, s)
            cur = Some(SessionState(1, t.amount, ms, ms))
          case Some(s) =>
            cur = Some(SessionState(s.count + 1, s.total + t.amount, s.startMs, ms))
          case None =>
            cur = Some(SessionState(1, t.amount, ms, ms))
        }
      }
      cur.foreach { s =>
        state.update(s)
        if (useTimers) {
          // one live timer per key: replace the old one so only the
          // LATEST arm can close the session
          if (armed.exists()) getHandle.deleteTimer(armed.get())
          val expiry = timers.getCurrentProcessingTimeInMs() + GapMs
          getHandle.registerTimer(expiry)
          armed.update(expiry)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(account: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] =
      // only the currently-armed timer closes the session; anything
      // else is a stale arm from before a newer event re-armed
      if (state.exists() && armed.exists() &&
          armed.get() == info.getExpiryTimeInMs()) {
        val s = state.get()
        state.clear()
        armed.clear()
        Iterator(closed(account, s))
      } else Iterator.empty
  }

  def sessions(txns: Dataset[Txn],
               timeMode: TimeMode = TimeMode.ProcessingTime()): Dataset[SessionOut] = {
    import txns.sparkSession.implicits._
    txns
      .groupByKey(_.account_id)
      .transformWithState(new SessionProcessor,
        timeMode, OutputMode.Append(), implicitly[org.apache.spark.sql.Encoder[SessionOut]])
  }
}
