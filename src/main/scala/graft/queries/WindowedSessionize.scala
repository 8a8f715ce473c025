package graft.queries

import graft.functions.{Geo, GeoMath}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The trip-reconstruction semantics re-expressed as pure windowed SQL
  * (SURVEY.md §2.2 J1-11 option (b)) — lag() legs → boundary flags →
  * running-sum session ids → per-session aggregation.
  *
  * This form is fully declarative (whole-stage codegen end to end, no typed
  * FSM), but it CANNOT reproduce one reference behavior: the speed-check
  * skip also skips the previous-state update, making a later leg depend on
  * whether an earlier point was dropped — inherently sequential state. On
  * inputs without speed outliers the two implementations agree exactly
  * (property-tested); the FSM operator stays the semantics-bearing
  * implementation and this is its optimizer-friendly cross-check.
  */
object WindowedSessionize {

  /** positions (taxi, ts, tsS, latS, longS, status) -> emitted airport
    * trips with the same columns as the FSM's output.
    */
  def trips(positions: DataFrame): DataFrame = {
    val w = Window.partitionBy("taxi").orderBy("tsS", "latS", "longS", "status")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val legs = positions
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("prev_lat", lag(col("latS"), 1).over(w).cast("double"))
      .withColumn("prev_long", lag(col("longS"), 1).over(w).cast("double"))
      .withColumn("prev_status", lag(col("status"), 1).over(w))
      // a new trip opens at an M point whose predecessor is absent, E, or
      // beyond the 210 s gap
      .withColumn("opens",
        (col("status") === "M" &&
          (col("prev_status").isNull || col("prev_status") === "E" ||
            col("ts") - col("prev_ts") > GeoMath.MaxGapSeconds)).cast("long"))
      .withColumn("session_id", sum(col("opens")).over(run))
      .filter(col("status") === "M") // E rows only delimit; they carry no leg
      .withColumn("leg_km",
        when(col("opens") === 1, lit(0.0)).otherwise(
          Geo.sphericalEarthDistance(col("prev_lat"), col("prev_long"),
            col("latS").cast("double"), col("longS").cast("double"))))
      .withColumn("near_sfo", Geo.isNearSfo(col("latS").cast("double"), col("longS").cast("double")))

    legs
      .groupBy(col("taxi"), col("session_id"))
      .agg(
        min(struct(col("tsS"), col("latS"), col("longS"))).as("start"),
        max(struct(col("tsS"), col("latS"), col("longS"))).as("stop"),
        min(col("ts")).as("startTime"),
        max(col("ts")).as("stopTime"),
        sum(col("leg_km")).as("distanceKm"),
        max(col("near_sfo")).as("isAirport"),
        min(col("tsS")).as("start_tsS"))
      .filter(col("isAirport") && col("distanceKm") >= GeoMath.MinTripKm)
      .select(col("taxi"),
        col("startTime"),
        col("start.latS").as("startLat"), col("start.longS").as("startLong"),
        col("stopTime"),
        col("stop.latS").as("stopLat"), col("stop.longS").as("stopLong"),
        col("isAirport"),
        col("distanceKm"),
        (lit(GeoMath.FareBase) + lit(GeoMath.FarePerKm) * col("distanceKm")).as("revenue"),
        substring(col("start_tsS"), 1, 10).as("date"))
  }
}
