package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.model.BrowserEvent

/** Flink-style gap sessionization with *event-time timers* on Spark 4's
  * `transformWithState` — the direct analog of the reference's keyed-state
  * + timer pattern, beyond what `session_window` exposes (emission happens
  * when the watermark passes lastEvent + gap, exactly like Flink's
  * session-window trigger).
  *
  * State: one [[SessionizeTws.SessionAgg]] per user; on input, events
  * merge into the open session (emitting any session closed by an
  * in-batch gap), and the per-key timer is re-armed to lastTs + gap;
  * when the watermark passes the timer, the session is emitted and
  * cleared. Requires `TimeMode.EventTime` (watermarked input) and the
  * RocksDB state store provider.
  */
object SessionizeTws {

  final case class SessionAgg(startMs: Long, lastMs: Long, n: Long)
  final case class UserSession(user: String, startMs: Long, endMs: Long, n: Long)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, BrowserEvent, UserSession] {

    @transient private var sess: ValueState[SessionAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessionAgg](
        "sess", Encoders.product[SessionAgg], TTLConfig.NONE)

    private def rearmTimer(expiry: Long): Unit = {
      val timers = getHandle.listTimers()
      while (timers.hasNext) getHandle.deleteTimer(timers.next().asInstanceOf[Long])
      getHandle.registerTimer(expiry)
    }

    override def handleInputRows(
        user: String,
        rows: Iterator[BrowserEvent],
        timerValues: TimerValues): Iterator[UserSession] = {
      val out = Seq.newBuilder[UserSession]
      var cur = if (sess.exists()) Some(sess.get()) else None
      rows.toSeq.sortBy(_.timestamp).foreach { e =>
        cur match {
          case Some(s) if e.timestamp - s.lastMs < gapMs =>
            cur = Some(SessionAgg(s.startMs, e.timestamp, s.n + 1))
          case Some(s) => // in-batch gap: close the old session immediately
            out += UserSession(user, s.startMs, s.lastMs, s.n)
            cur = Some(SessionAgg(e.timestamp, e.timestamp, 1))
          case None =>
            cur = Some(SessionAgg(e.timestamp, e.timestamp, 1))
        }
      }
      cur.foreach { s =>
        sess.update(s)
        rearmTimer(s.lastMs + gapMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        user: String,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[UserSession] = {
      if (sess.exists()) {
        val s = sess.get()
        sess.clear()
        Iterator.single(UserSession(user, s.startMs, s.lastMs, s.n))
      } else Iterator.empty
    }
  }

  /** Input must carry a watermark on an event-time column derived from
    * `timestamp` (see the spec for the wiring).
    */
  def sessionize(events: Dataset[BrowserEvent], gapMs: Long): Dataset[UserSession] = {
    implicit val outEnc = Encoders.product[UserSession]
    implicit val stringEnc = Encoders.STRING
    events
      .groupByKey((e: BrowserEvent) => e.user)
      .transformWithState(
        new SessionProcessor(gapMs),
        TimeMode.EventTime(),
        OutputMode.Append)
  }
}
