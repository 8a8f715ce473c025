package graft.streaming

import graft.operators.{TaxiFsm, TaxiPosition, TaxiTrip}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variant of the trip-reconstruction sessionizer
  * (SURVEY.md §7.1 item 7): the SAME pure FSM ([[TaxiFsm.step]]) driven by
  * `flatMapGroupsWithState` instead of a sorted batch iterator.
  *
  * Contract: positions arrive per taxi, possibly split across micro-batches;
  * within a batch the group iterator is sorted here by the reference's key
  * order. Cross-batch disorder is bounded by the upstream watermark — late
  * positions older than the last accepted one would violate FSM order and
  * are dropped (counted by no one: same drop-don't-fail posture as the
  * batch filters). The open-trip flush happens on event-time timeout
  * (idle taxi) instead of end-of-group.
  */
object StreamingSessionize {

  /** Timeout after which an idle taxi's open trip is flushed. */
  val IdleFlushMs: Long = 30 * 60 * 1000L

  def sessionizeGroup(
      taxi: Int,
      positions: Iterator[TaxiPosition],
      state: GroupState[TaxiFsm.State]): Iterator[TaxiTrip] = {
    if (state.hasTimedOut) {
      val out = TaxiFsm.flush(state.get)
      state.remove()
      out.iterator
    } else {
      var s = state.getOption.getOrElse(TaxiFsm.initialState)
      val sorted = positions.toArray.sortBy(p => (p.tsS, p.latS, p.longS, p.status))
      val emitted = Seq.newBuilder[TaxiTrip]
      sorted.foreach { p =>
        // Guard FSM monotonicity across batches: drop stragglers that
        // arrive behind the last accepted point.
        if (s.prev == null ||
            Ordering[(String, String, String, String)].gteq(ordKey(p), ordKey(s.prev))) {
          val (s2, out) = TaxiFsm.step(s, p)
          s = s2
          out.foreach(emitted += _)
        }
      }
      state.update(s)
      if (s.prev != null) {
        val lastMs = (s.prev.ts * 1000).toLong
        state.setTimeoutTimestamp(lastMs + IdleFlushMs)
      }
      emitted.result().iterator
    }
  }

  private def ordKey(p: TaxiPosition): (String, String, String, String) =
    (p.tsS, p.latS, p.longS, p.status)

  /** Positions stream → emitted airport trips stream (append mode). */
  def trips(spark: SparkSession, positions: Dataset[TaxiPosition]): Dataset[TaxiTrip] = {
    import spark.implicits._
    positions
      .withColumn("eventTime", org.apache.spark.sql.functions.expr("timestamp_seconds(ts)"))
      .withWatermark("eventTime", "10 minutes")
      .as[TaxiPosition]
      .groupByKey(_.taxi)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionizeGroup)
  }
}
