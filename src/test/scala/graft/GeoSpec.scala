package graft

import graft.functions.GeoMath
import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {

  test("distance matches the reference's documented example (46.497 km, bin 46)") {
    // /root/reference/src/SparkTripLength.java:29-34
    val d = GeoMath.sphericalEarthDistance(37.61373, -122.39722, 37.34666, -121.99176)
    assert(math.abs(d - 46.497) < 0.0005, s"got $d")
    assert(math.floor(d / 2) * 2 == 46.0)
  }

  test("distance is zero for identical points and symmetric") {
    assert(GeoMath.sphericalEarthDistance(37.6, -122.4, 37.6, -122.4) == 0.0)
    val a = GeoMath.sphericalEarthDistance(37.6, -122.4, 37.7, -122.3)
    val b = GeoMath.sphericalEarthDistance(37.7, -122.3, 37.6, -122.4)
    assert(math.abs(a - b) < 1e-12)
  }

  test("validity predicate: bbox and coastline boundaries") {
    assert(GeoMath.isValidPosition(37.7, -122.4)) // SF
    assert(!GeoMath.isValidPosition(35.0, -122.4)) // south of bbox
    assert(!GeoMath.isValidPosition(39.81, -122.4)) // north of bbox
    assert(!GeoMath.isValidPosition(37.0, -123.9)) // west of bbox
    assert(!GeoMath.isValidPosition(37.0, -119.0)) // east of bbox
    assert(!GeoMath.isValidPosition(37.5, -123.5)) // ocean (coastline half-plane)
    // exact boundary: lat == a*long + b is valid (>=)
    val long = -122.5
    val lat = GeoMath.CoastA * long + GeoMath.CoastB
    assert(GeoMath.isValidPosition(lat, long))
    assert(!GeoMath.isValidPosition(lat - 1e-9, long))
  }

  test("airport proximity: 1 km radius around SFO") {
    assert(GeoMath.isNearSfo(GeoMath.SfoLat, GeoMath.SfoLong))
    assert(GeoMath.isNearSfo(37.62131, -122.38896)) // ~0.88 km west
    assert(!GeoMath.isNearSfo(37.7, -122.4)) // downtown SF
  }

  test("fare model") {
    assert(GeoMath.fare(0.0) == 3.5)
    assert(math.abs(GeoMath.fare(10.0) - 20.6) < 1e-9)
  }
}
