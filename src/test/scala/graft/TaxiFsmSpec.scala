package graft

import graft.operators.{TaxiFsm, TaxiPosition}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-Scala FSM transition tests — every branch of the reference reducer
  * (/root/reference/src/AirportTripsRevenue.java:275-407) without Spark.
  */
class TaxiFsmSpec extends AnyFunSuite {

  private val Sfo = (37.62131, -122.37896)
  private val Town = (37.70000, -122.40000)

  private var tsCounter = 0
  private def pos(taxi: Int, t: Int, lat: Double, long: Double, status: String): TaxiPosition = {
    val tsS = f"2008-05-25 ${t / 3600}%02d:${(t % 3600) / 60}%02d:${t % 60}%02d"
    TaxiPosition(taxi, 1211673600.0 + t, tsS, f"$lat%.5f", f"$long%.5f", status)
  }

  private def run(ps: TaxiPosition*) = TaxiFsm.sessionize(ps.iterator).toList

  test("E->M->M->E near SFO emits one trip with correct fare") {
    val trips = run(
      pos(1, 1000, Town._1, Town._2, "E"),
      pos(1, 1060, Sfo._1, Sfo._2, "M"),
      pos(1, 1120, Sfo._1 + 0.01, Sfo._2, "M"),
      pos(1, 1180, Sfo._1 + 0.02, Sfo._2, "M"),
      pos(1, 1240, Sfo._1 + 0.03, Sfo._2, "E"))
    assert(trips.size == 1)
    val t = trips.head
    assert(t.taxi == 1)
    assert(t.isAirport)
    // stop point is the LAST ACCEPTED M point, not the closing E point
    assert(t.stopLat == f"${Sfo._1 + 0.02}%.5f")
    assert(t.startTime == 1211673600.0 + 1060)
    assert(t.stopTime == 1211673600.0 + 1180)
    assert(math.abs(t.revenue - (3.5 + 1.71 * t.distanceKm)) < 1e-9)
    assert(t.date == "2008-05-25")
  }

  test("trip never near SFO is not emitted") {
    val trips = run(
      pos(1, 1000, Town._1, Town._2, "E"),
      pos(1, 1060, Town._1 + 0.01, Town._2, "M"),
      pos(1, 1120, Town._1 + 0.02, Town._2, "M"),
      pos(1, 1180, Town._1 + 0.03, Town._2, "E"))
    assert(trips.isEmpty)
  }

  test("trip shorter than 0.1 km is not emitted even if at SFO") {
    val trips = run(
      pos(1, 1000, Sfo._1, Sfo._2, "M"),
      pos(1, 1060, Sfo._1 + 0.0001, Sfo._2, "M"),
      pos(1, 1120, Sfo._1, Sfo._2, "E"))
    assert(trips.isEmpty)
  }

  test("gap > 210 s splits into two trips (M->M exception)") {
    val trips = run(
      pos(1, 1000, Sfo._1, Sfo._2, "M"),
      pos(1, 1100, Sfo._1 + 0.01, Sfo._2, "M"),
      pos(1, 1100 + 211, Sfo._1 + 0.005, Sfo._2, "M"), // gap 211s -> split; still near SFO
      pos(1, 1100 + 271, Sfo._1 + 0.015, Sfo._2, "M"),
      pos(1, 1100 + 331, Sfo._1 + 0.025, Sfo._2, "E"))
    assert(trips.size == 2)
    // first trip closed at the PREVIOUS point (ts 1100)
    assert(trips.head.stopTime == 1211673600.0 + 1100)
    // second opened at the gap point
    assert(trips(1).startTime == 1211673600.0 + 1311)
  }

  test("gap of exactly 210 s does NOT split") {
    val trips = run(
      pos(1, 1000, Sfo._1, Sfo._2, "M"),
      pos(1, 1210, Sfo._1 + 0.01, Sfo._2, "M"),
      pos(1, 1270, Sfo._1 + 0.02, Sfo._2, "E"))
    assert(trips.size == 1)
  }

  test("speed outlier point is skipped entirely, including its state update") {
    // Points A(t=0), X(t=60, 1.5 deg away ~167km -> >180km/h), B(t=120, near A).
    // X is skipped; B's leg must be computed against A, not X.
    val a = pos(1, 1000, Sfo._1, Sfo._2, "M")
    val x = pos(1, 1060, Sfo._1 + 1.5, Sfo._2, "M")
    val b = pos(1, 1120, Sfo._1 + 0.01, Sfo._2, "M")
    val e = pos(1, 1180, Sfo._1 + 0.01, Sfo._2, "E")
    val trips = run(a, x, b, e)
    assert(trips.size == 1)
    val d = graft.functions.GeoMath.sphericalEarthDistance(
      Sfo._1, Sfo._2, Sfo._1 + 0.01, Sfo._2)
    assert(math.abs(trips.head.distanceKm - d) < 1e-9,
      s"distance ${trips.head.distanceKm} should be the direct A->B leg $d")
  }

  test("airport flag comes only from accepted M points, not the closing E point") {
    val trips = run(
      pos(1, 1000, Town._1, Town._2, "M"),
      pos(1, 1060, Town._1 + 0.01, Town._2, "M"),
      pos(1, 1120, Sfo._1, Sfo._2, "E")) // E point AT SFO must not flag
    assert(trips.isEmpty)
  }

  test("open trip at end of input is flushed (per-group close, SURVEY §2.2 delta 1)") {
    val trips = run(
      pos(1, 1000, Sfo._1, Sfo._2, "M"),
      pos(1, 1060, Sfo._1 + 0.01, Sfo._2, "M"))
    assert(trips.size == 1)
    assert(trips.head.stopTime == 1211673600.0 + 1060)
  }

  test("multi-taxi partition iterator isolates state per taxi") {
    val ps = Seq(
      pos(1, 1000, Sfo._1, Sfo._2, "M"),
      pos(1, 1060, Sfo._1 + 0.01, Sfo._2, "M"),
      pos(2, 500, Town._1, Town._2, "M"), // earlier ts, different taxi
      pos(2, 560, Town._1 + 0.01, Town._2, "E"))
    val trips = TaxiFsm.sessionizePartition(ps.iterator).toList
    assert(trips.size == 1) // taxi 1 flushes; taxi 2 never near SFO
    assert(trips.head.taxi == 1)
  }

  test("consecutive M-E M-E cycles produce independent trips") {
    val trips = run(
      pos(1, 1000, Sfo._1, Sfo._2, "M"),
      pos(1, 1060, Sfo._1 + 0.02, Sfo._2, "M"),
      pos(1, 1120, Sfo._1 + 0.02, Sfo._2 + 0.01, "E"),
      pos(1, 1180, Sfo._1, Sfo._2, "M"),
      pos(1, 1240, Sfo._1 - 0.02, Sfo._2, "M"),
      pos(1, 1300, Sfo._1 - 0.02, Sfo._2 - 0.01, "E"))
    assert(trips.size == 2)
    assert(trips.map(_.startTime) == List(1211673600.0 + 1000, 1211673600.0 + 1180))
  }
}
