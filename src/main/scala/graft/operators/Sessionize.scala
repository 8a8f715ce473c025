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
  * operator in the engine. Pure Scala (no Spark), exhaustively unit-tested;
  * the Spark adapter lives in [[graft.queries.TaxiQueries]].
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

  /** Run the FSM over ONE taxi's positions, pre-sorted by
    * (tsS, latS, longS, status) — the reference's full-string key order.
    */
  def sessionize(points: Iterator[TaxiPosition]): Iterator[TaxiTrip] =
    new Iterator[TaxiTrip] {
      private var prev: TaxiPosition = _ // last ACCEPTED point
      private var open = false
      private var startTime = 0.0
      private var startLat: String = _
      private var startLong: String = _
      private var stopTime = 0.0
      private var stopLat: String = _
      private var stopLong: String = _
      private var isAirport = false
      private var cumDist = 0.0
      private var date: String = _
      private var pending: TaxiTrip = _
      private var done = false

      private def openTrip(p: TaxiPosition): Unit = {
        open = true
        startTime = p.ts; startLat = p.latS; startLong = p.longS
        stopTime = p.ts; stopLat = p.latS; stopLong = p.longS
        isAirport = GeoMath.isNearSfo(p.lat, p.long)
        cumDist = 0.0
        date = p.tsS.substring(0, 10)
      }

      /** Close at the previous point; return the trip iff it must be emitted
        * (distance >= 0.1 km and airport-flagged).
        */
      private def closeTrip(): TaxiTrip = {
        open = false
        if (cumDist >= GeoMath.MinTripKm && isAirport)
          TaxiTrip(prev.taxi, startTime, startLat, startLong,
            stopTime, stopLat, stopLong, isAirport = true,
            cumDist, GeoMath.fare(cumDist), date)
        else null
      }

      /** Advance through input until a trip is emitted or input ends. */
      private def step(): Unit = {
        while (pending == null && points.hasNext) {
          val cur = points.next()
          if (!open) {
            // No trip in progress: only an M point does anything (E->M open).
            if (cur.status == "M") openTrip(cur)
            prev = cur
          } else if (cur.status == "M") {
            if (cur.ts - prev.ts <= GeoMath.MaxGapSeconds) {
              // M->M normal: speed-check, accumulate.
              val d = GeoMath.sphericalEarthDistance(prev.lat, prev.long, cur.lat, cur.long)
              val speed = d / ((cur.ts - prev.ts) / 3600.0)
              if (speed > GeoMath.MaxSpeedKmh) {
                // Skip the point entirely — prev intentionally NOT updated
                // (reference early-return at :333).
              } else {
                cumDist += d
                stopTime = cur.ts; stopLat = cur.latS; stopLong = cur.longS
                isAirport = isAirport || GeoMath.isNearSfo(cur.lat, cur.long)
                prev = cur
              }
            } else {
              // M->M exception (gap split): close at prev, reopen at cur.
              pending = closeTrip()
              openTrip(cur)
              prev = cur
            }
          } else {
            // M->E: close at prev.
            pending = closeTrip()
            prev = cur
          }
        }
        if (pending == null && !points.hasNext && open && !done) {
          // End-of-group flush (see scaladoc delta note).
          pending = closeTrip()
          done = true
        }
      }

      override def hasNext: Boolean = {
        if (pending == null) step()
        pending != null
      }

      override def next(): TaxiTrip = {
        if (!hasNext) throw new NoSuchElementException("empty FSM iterator")
        val t = pending; pending = null; t
      }
    }

  /** Multi-taxi wrapper for the scalable `mapPartitions` path: the input
    * iterator spans many taxis, sorted by (taxi, tsS, latS, longS, status);
    * a taxi change flushes the previous taxi's FSM. Streams — never
    * materializes a whole group.
    */
  def sessionizePartition(points: Iterator[TaxiPosition]): Iterator[TaxiTrip] = {
    val buf = points.buffered
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
}
