package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom stateful processing with flatMapGroupsWithState — per-account
  * session tracking (gap-based sessionization of the transaction
  * stream). The reference has no stateful operator beyond windowed
  * aggregation; this covers the "custom state" capability a production
  * deployment of its pipeline needs (e.g. fraud heuristics over a
  * per-account rolling session).
  *
  * Scale: state is per-account (bounded by active accounts within the
  * timeout), keyed shuffle once; ProcessingTimeTimeout evicts idle
  * accounts so state can't grow unboundedly.
  */
object Sessionize {

  case class Txn(account_id: String, event_time: Timestamp, amount: Double)

  case class SessionState(
      count: Long, total: Double,
      startMs: Long, lastMs: Long)

  case class SessionOut(
      account_id: String,
      n_txns: Long,
      total_amount: Double,
      session_start: Timestamp,
      session_end: Timestamp,
      closed: Boolean)

  val GapMs: Long = 30 * 60 * 1000L

  /** Gap-based sessionization: a session closes when a transaction
    * arrives more than GapMs after the previous one (emitting the
    * closed session and opening a new one), or when the state times
    * out. Works identically over MemoryStream (tests) and Kafka.
    *
    * Production passes ProcessingTimeTimeout so idle accounts are
    * evicted; tests pass NoTimeout — with a timeout the engine keeps
    * scheduling timeout-check batches and `processAllAvailable` never
    * settles. */
  def sessions(txns: Dataset[Txn],
               timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[SessionOut] = {
    import txns.sparkSession.implicits._
    txns
      .groupByKey(_.account_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeout) {
        (account: String, rows: Iterator[Txn], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(account, s.count, s.total,
              new Timestamp(s.startMs), new Timestamp(s.lastMs), closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(_.event_time.getTime)
            var cur = state.getOption
            val closedSessions = Seq.newBuilder[SessionOut]
            sorted.foreach { t =>
              val ms = t.event_time.getTime
              cur match {
                case Some(s) if ms - s.lastMs > GapMs =>
                  closedSessions += SessionOut(account, s.count, s.total,
                    new Timestamp(s.startMs), new Timestamp(s.lastMs), closed = true)
                  cur = Some(SessionState(1, t.amount, ms, ms))
                case Some(s) =>
                  cur = Some(SessionState(s.count + 1, s.total + t.amount, s.startMs, ms))
                case None =>
                  cur = Some(SessionState(1, t.amount, ms, ms))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
                state.setTimeoutDuration(GapMs)
            }
            closedSessions.result().iterator
          }
      }
  }
}
