package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for gap sessionization: money carried as integer cents so
  * streaming accumulation is exact and order-independent (the batch
  * operator gets the same guarantee from decimal sums).
  */
final case class GapEvent(user_id: Long, us: Long, cents: Long)

/** Open-session accumulator kept in the state store (O(1) per user). */
final case class GapState(startUs: Long, lastUs: Long, n: Long, cents: Long)

/** A closed session: [start_us, end_us] span, event count, exact total. */
final case class GapSession(
    user_id: Long, start_us: Long, end_us: Long, n_events: Long, total_cents: Long)

/** Streaming twin of the batch gap sessionizer
  * ([[graft.operators.GapSessionize]], q8): sessions split on > `gapUs`
  * inactivity, maintained per user in `flatMapGroupsWithState`, closed
  * either by the next event after a gap or by event-time timeout once the
  * watermark passes last-event + gap (the streaming replacement for the
  * batch end-of-group flush).
  *
  * Within a micro-batch events are sorted here; cross-batch stragglers
  * older than the open session's last event are dropped (bounded by the
  * upstream watermark — same drop-don't-fail posture as the batch
  * parsers). State is one fixed-size record per active user, so the
  * operator scales with concurrent users, not history.
  */
object StreamingGapSessionize {

  def sessionizeGroup(gapUs: Long)(
      uid: Long,
      events: Iterator[GapEvent],
      state: GroupState[GapState]): Iterator[GapSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(GapSession(uid, s.startUs, s.lastUs, s.n, s.cents))
    } else {
      var s = state.getOption.orNull
      val out = Seq.newBuilder[GapSession]
      events.toArray.sortBy(_.us).foreach { e =>
        if (s == null) s = GapState(e.us, e.us, 1, e.cents)
        else if (e.us - s.lastUs > gapUs) {
          out += GapSession(uid, s.startUs, s.lastUs, s.n, s.cents)
          s = GapState(e.us, e.us, 1, e.cents)
        } else if (e.us >= s.lastUs) {
          s = s.copy(lastUs = e.us, n = s.n + 1, cents = s.cents + e.cents)
        } // else: straggler behind the open session head — drop
      }
      if (s != null) {
        state.update(s)
        // ceil to ms: truncating would fire the timeout up to ~1 ms BEFORE
        // lastUs + gapUs, flushing a session that a boundary event (diff
        // == gap, which batch semantics keep together) should extend
        state.setTimeoutTimestamp((s.lastUs + gapUs + 999) / 1000)
      }
      out.result().iterator
    }
  }

  /** Event stream → closed-session stream (append mode). */
  def sessions(spark: SparkSession, events: Dataset[GapEvent],
               gapUs: Long, watermarkDelay: String = "30 minutes"): Dataset[GapSession] = {
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_micros(col("us")))
      .withWatermark("eventTime", watermarkDelay)
      .as[GapEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionizeGroup(gapUs))
  }
}
