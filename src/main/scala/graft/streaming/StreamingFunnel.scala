package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One funnel event (q50's sparse slice of the event stream). */
final case class FunnelEvent(user_id: Long, us: Long, event_id: Long, event_type: String)

/** Per-user funnel progress kept in the state store: the first-reach
  * time of each stage, -1 while unreached. O(1) per user — the operator
  * scales with concurrent users, never with history.
  */
final case class FunnelProgress(v: Long, c: Long, p: Long)

/** A stage completion, emitted exactly once when a user first reaches
  * view / click / purchase (in that strict order).
  */
final case class FunnelStep(user_id: Long, stage: String, us: Long)

/** Streaming twin of the batch funnel (q50,
  * [[graft.queries.Relational.q50Funnel]]): the three chained prefix-min
  * windows become a three-field per-user state machine in
  * `flatMapGroupsWithState`. Chronological replay makes the FSM pick
  * exactly the batch windows' values — the first view, the first click
  * strictly after it, the first purchase strictly after that — and each
  * stage emits a changelog record the moment it completes, which is the
  * form a live conversion dashboard actually consumes (batch q50 can
  * only restate the totals).
  */
object StreamingFunnel {

  def stepGroup(
      uid: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelProgress]): Iterator[FunnelStep] = {
    var s = state.getOption.getOrElse(FunnelProgress(-1L, -1L, -1L))
    val out = Seq.newBuilder[FunnelStep]
    // within a micro-batch, replay in the batch windows' sort order
    events.toArray.sortBy(e => (e.us, e.event_id)).foreach { e =>
      if (e.event_type == "view" && s.v < 0) {
        s = s.copy(v = e.us); out += FunnelStep(uid, "view", e.us)
      } else if (e.event_type == "click" && s.v >= 0 && e.us > s.v && s.c < 0) {
        s = s.copy(c = e.us); out += FunnelStep(uid, "click", e.us)
      } else if (e.event_type == "purchase" && s.c >= 0 && e.us > s.c && s.p < 0) {
        s = s.copy(p = e.us); out += FunnelStep(uid, "purchase", e.us)
      }
    }
    state.update(s)
    out.result().iterator
  }

  /** Event stream → stage-completion stream (append mode). No watermark:
    * state is one fixed-size record per user by construction.
    */
  def steps(spark: SparkSession, events: Dataset[FunnelEvent]): Dataset[FunnelStep] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(stepGroup)
  }
}
