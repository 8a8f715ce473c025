package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Taxi-domain constants and pure-Scala math, shared by the column
  * functions below and the sessionization FSM (graft.operators.Sessionize).
  *
  * Semantics derived from the reference implementation:
  *  - distance fn: /root/reference/src/SparkTripLength.java:15-27
  *  - constants:   /root/reference/src/AirportTripsRevenue.java:23-38
  *  - GPS validity: /root/reference/src/AirportTripsRevenue.java:90-104
  */
object GeoMath {
  /** Mean Earth radius, km (SparkTripLength.java:16). */
  val EarthRadiusKm = 6371.009

  // SFO location + airport proximity radius (AirportTripsRevenue.java:25-27)
  val SfoLat = 37.62131
  val SfoLong = -122.37896
  val AirportRadiusKm = 1.0

  // Valid GPS bounding box (AirportTripsRevenue.java:28-31)
  val MinLat = 36.50
  val MaxLat = 39.80
  val MinLong = -123.80
  val MaxLong = -119.10

  // Coastline half-plane: keep iff lat >= a*long + b (AirportTripsRevenue.java:32-33)
  val CoastA = -1.3388206045302447
  val CoastB = -126.75838718367324

  // Fare model (AirportTripsRevenue.java:34-35)
  val FareBase = 3.50
  val FarePerKm = 1.71

  // Sessionization thresholds (AirportTripsRevenue.java:36-38)
  val MaxSpeedKmh = 180.0
  val MaxGapSeconds = 210.0
  val MinTripKm = 0.100

  /** Equirectangular ("spherical earth projected to a plane") distance, km.
    * R * sqrt(dLat^2 + (cos(meanLat)*dLong)^2), angles in radians.
    */
  def sphericalEarthDistance(lat1: Double, long1: Double,
                             lat2: Double, long2: Double): Double = {
    val dLat = math.toRadians(lat1 - lat2)
    val dLong = math.toRadians(long1 - long2)
    val meanLat = math.toRadians((lat1 + lat2) / 2.0)
    EarthRadiusKm * math.sqrt(dLat * dLat + math.pow(math.cos(meanLat) * dLong, 2))
  }

  /** Inside the bbox AND east of the coastline half-plane. */
  def isValidPosition(lat: Double, long: Double): Boolean =
    lat >= CoastA * long + CoastB &&
      lat >= MinLat && lat <= MaxLat && long >= MinLong && long <= MaxLong

  /** Within 1 km of SFO. */
  def isNearSfo(lat: Double, long: Double): Boolean =
    sphericalEarthDistance(lat, long, SfoLat, SfoLong) <= AirportRadiusKm

  def fare(distanceKm: Double): Double = FareBase + FarePerKm * distanceKm
}

/** Column-expression versions of the geo functions — native Catalyst
  * expressions (no UDFs), so they stay inside whole-stage codegen and
  * constant-fold the literals.
  */
object Geo {
  import GeoMath._

  /** Equirectangular distance in km between two (lat, long) points. */
  def sphericalEarthDistance(lat1: Column, long1: Column,
                             lat2: Column, long2: Column): Column = {
    val dLat = radians(lat1 - lat2)
    val dLong = radians(long1 - long2)
    val meanLat = radians((lat1 + lat2) / lit(2.0))
    lit(EarthRadiusKm) * sqrt(dLat * dLat + pow(cos(meanLat) * dLong, lit(2.0)))
  }

  def isValidPosition(lat: Column, long: Column): Column =
    lat >= lit(CoastA) * long + lit(CoastB) &&
      lat >= lit(MinLat) && lat <= lit(MaxLat) &&
      long >= lit(MinLong) && long <= lit(MaxLong)

  def isNearSfo(lat: Column, long: Column): Column =
    sphericalEarthDistance(lat, long, lit(SfoLat), lit(SfoLong)) <= lit(AirportRadiusKm)

  /** Histogram bin label for a trip distance: 2-km bins formatted "%02d"
    * by lower edge; >= 80 km collapses into ">=80"
    * (SparkTripLength.java:51-61).
    */
  def tripBin(distKm: Column): Column =
    when(distKm >= lit(80.0), lit(">=80"))
      .otherwise(format_string("%02d", (floor(distKm / 2.0) * 2).cast("int")))

  /** 'yyyy-MM-dd HH:mm:ss' string -> UTC epoch seconds as double;
    * "NULL" or malformed -> null (callers drop NULL-timestamp halves; the
    * reference's 0.0 sentinel at AirportTripsRevenue.java:116-126 is never
    * observed because those rows are filtered before use). `try_` form:
    * under Spark 4's default ANSI mode a plain unix_timestamp would ABORT
    * the job on one malformed row, violating the drop-don't-fail contract.
    */
  def tsToEpoch(ts: Column): Column =
    unix_timestamp(try_to_timestamp(ts, lit("yyyy-MM-dd HH:mm:ss"))).cast("double")
}
