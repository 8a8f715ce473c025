package graft.operators

import graft.functions.GeoMath

/** One accepted GPS position of one taxi.
  *
  * `latS`/`longS` keep the *original* input strings so output formatting can
  * round-trip byte-exactly (the reference emits the raw parsed doubles via
  * string concat — /root/reference/src/AirportTripsRevenue.java:351-356);
  * `tsS` keeps the original timestamp string, whose first 10 chars are the
  * trip date key (:355) and whose full value is the secondary-sort key
  * (:181,:254-262).
  */
final case class TaxiPosition(
    taxi: Int,
    ts: Double, // UTC epoch seconds
    tsS: String, // 'yyyy-MM-dd HH:mm:ss'
    latS: String,
    longS: String,
    status: String // "M" or "E" (already normalized)
) {
  def lat: Double = latS.toDouble
  def long: Double = longS.toDouble
}

/** A reconstructed trip (the reference's TaxiTrip POJO,
  * /root/reference/src/AirportTripsRevenue.java:41-53).
  */
final case class TaxiTrip(
    taxi: Int,
    startTime: Double,
    startLat: String,
    startLong: String,
    stopTime: Double,
    stopLat: String,
    stopLong: String,
    isAirport: Boolean,
    distanceKm: Double,
    revenue: Double,
    date: String // yyyy-MM-dd of the trip start
)

/** The trip-reconstruction finite-state machine — the one genuinely custom
  * operator in the engine. Pure Scala (no Spark); the batch adapter lives in
  * [[graft.queries.TaxiQueries]], the Structured Streaming adapter in
  * [[StreamingSessionize]] — both drive the same [[TaxiFsm.step]].
  *
  * Semantics follow the reference reducer
  * (/root/reference/src/AirportTripsRevenue.java:275-407) exactly:
  *
  *  - E->M: open a trip at the current point; airport flag seeded from the
  *    start point (:304-315).
  *  - M->M, same taxi, gap <= 210 s: speed check dist/(dt/3600) > 180 km/h
  *    skips the point ENTIRELY — including the previous-state update, so an
  *    outlier point is invisible to the next transition too (:319-334).
  *    Otherwise accumulate leg distance, extend the stop point, OR-in
  *    airport proximity of the current point.
  *  - M->M, gap > 210 s (or taxi change in the multi-taxi wrapper): close
  *    the trip at the PREVIOUS point; emit iff distance >= 0.1 km AND
  *    airport-flagged; open a new trip at the current point (:340-372).
  *  - M->E: close at the previous point, same emit rule (:376-397).
  *  - Revenue on close = 3.50 + 1.71 * cumulatedDistance (:347,:383).
  *  - The closing E point is never tested for airport proximity.
  *
  * Semantic delta vs. the reference (SURVEY.md §2.2 delta 1): in MR, one
  * reducer instance leaks FSM state across taxi keys, so a taxi's trailing
  * open trip is *sometimes* closed by the next taxi's first record. Here
  * groups are isolated, and we instead ALWAYS flush a pending M-state trip
  * at end-of-group through the same close-at-previous-point path — the
  * strictly-more-complete behavior; totals are verified against the oracle.
  */
object TaxiFsm {

  /** Resumable FSM state: the open-trip accumulator (the reference's
    * TaxiTrip instance fields, :279-285) + the previous ACCEPTED point.
    * Immutable so it can live in Structured Streaming `GroupState`.
    */
  final case class State(
      prev: TaxiPosition, // last accepted point (null until first point)
      open: Boolean,
      startTime: Double, startLat: String, startLong: String,
      stopTime: Double, stopLat: String, stopLong: String,
      isAirport: Boolean, cumDist: Double, date: String)

  val initialState: State =
    State(null, open = false, 0.0, null, null, 0.0, null, null, isAirport = false, 0.0, null)

  private def opened(s: State, p: TaxiPosition): State =
    s.copy(prev = p, open = true,
      startTime = p.ts, startLat = p.latS, startLong = p.longS,
      stopTime = p.ts, stopLat = p.latS, stopLong = p.longS,
      isAirport = GeoMath.isNearSfo(p.lat, p.long), cumDist = 0.0,
      date = p.tsS.substring(0, 10))

  /** Close at the previous point; Some(trip) iff emitted (distance >= 0.1 km
    * and airport-flagged).
    */
  private def closed(s: State): Option[TaxiTrip] =
    if (s.cumDist >= GeoMath.MinTripKm && s.isAirport)
      Some(TaxiTrip(s.prev.taxi, s.startTime, s.startLat, s.startLong,
        s.stopTime, s.stopLat, s.stopLong, isAirport = true,
        s.cumDist, GeoMath.fare(s.cumDist), s.date))
    else None

  /** One FSM transition. Positions must arrive in the reference's key order
    * (tsS, latS, longS, status) within the taxi.
    */
  def step(s: State, cur: TaxiPosition): (State, Option[TaxiTrip]) =
    if (!s.open) {
      if (cur.status == "M") (opened(s, cur), None)
      else (s.copy(prev = cur), None)
    } else if (cur.status == "M") {
      if (cur.ts - s.prev.ts <= GeoMath.MaxGapSeconds) {
        // M->M normal: speed-check, accumulate.
        val d = GeoMath.sphericalEarthDistance(s.prev.lat, s.prev.long, cur.lat, cur.long)
        val speed = d / ((cur.ts - s.prev.ts) / 3600.0)
        if (speed > GeoMath.MaxSpeedKmh) {
          // Skip the point entirely — prev intentionally NOT updated
          // (reference early-return at :333).
          (s, None)
        } else {
          (s.copy(prev = cur,
            cumDist = s.cumDist + d,
            stopTime = cur.ts, stopLat = cur.latS, stopLong = cur.longS,
            isAirport = s.isAirport || GeoMath.isNearSfo(cur.lat, cur.long)), None)
        }
      } else {
        // M->M exception (gap split): close at prev, reopen at cur.
        (opened(s, cur), closed(s))
      }
    } else {
      // M->E: close at prev.
      (s.copy(prev = cur, open = false), closed(s))
    }

  /** End-of-group flush (see scaladoc delta note). */
  def flush(s: State): Option[TaxiTrip] = if (s.open) closed(s) else None

  /** Run the FSM over ONE taxi's positions, pre-sorted by
    * (tsS, latS, longS, status) — the reference's full-string key order.
    * Streams: O(1) state, emits as it goes, flushes at end.
    */
  def sessionize(points: Iterator[TaxiPosition]): Iterator[TaxiTrip] = {
    var state = initialState
    val closedTrips = points.flatMap { p =>
      val (s2, out) = step(state, p)
      state = s2
      out
    }
    closedTrips ++ new Iterator[TaxiTrip] {
      private var flushed = false
      override def hasNext: Boolean = !flushed && flush(state).isDefined
      override def next(): TaxiTrip = {
        val t = flush(state).get; flushed = true; t
      }
    }
  }

  /** Multi-taxi wrapper for the scalable `mapPartitions` path: the input
    * iterator spans many taxis, sorted by (taxi, tsS, latS, longS, status);
    * a taxi change flushes the previous taxi's FSM. Streams — never
    * materializes a whole group.
    *
    * Exact-duplicate records are collapsed inline (they are adjacent in the
    * sort order), reproducing the reference's combiner/reduce dedup
    * (AirportTripsRevenue.java:199-225) WITHOUT the extra `distinct`
    * exchange — the whole reconstruction costs exactly one shuffle, like
    * the reference's one MR round.
    */
  def sessionizePartition(points: Iterator[TaxiPosition]): Iterator[TaxiTrip] = {
    val deduped = dedupSorted(points)
    val buf = deduped.buffered
    new Iterator[Iterator[TaxiTrip]] {
      override def hasNext: Boolean = buf.hasNext
      override def next(): Iterator[TaxiTrip] = {
        val taxi = buf.head.taxi
        val group = new Iterator[TaxiPosition] {
          override def hasNext: Boolean = buf.hasNext && buf.head.taxi == taxi
          override def next(): TaxiPosition = buf.next()
        }
        sessionize(group)
      }
    }.flatten
  }

  /** Collapse adjacent equal records of a sorted stream (streaming, O(1)). */
  def dedupSorted(points: Iterator[TaxiPosition]): Iterator[TaxiPosition] =
    new Iterator[TaxiPosition] {
      private val buf = points.buffered
      private var last: TaxiPosition = _
      private def skip(): Unit =
        while (buf.hasNext && buf.head == last) buf.next()
      override def hasNext: Boolean = { skip(); buf.hasNext }
      override def next(): TaxiPosition = {
        skip()
        last = buf.next()
        last
      }
    }
}
