package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the reference's two text formats (FIXTURES.md §A):
  *
  *  - `segments`: CSV, 9 fields, single quotes around timestamps/status
  *    (/root/reference/src/AirportTripsRevenue.java:129-134,153).
  *  - `trips`: space-separated, 11 fields
  *    (/root/reference/src/SparkTripLength.java:31,44-49).
  *
  * Both readers are schema-on-read over `spark.read.text` — dirty rows are
  * dropped by downstream filters, never errors, matching the reference's
  * drop-don't-fail contract. `.gz` inputs decompress transparently but are
  * single-partition (same physics as the reference; prefer uncompressed or
  * parquet at scale).
  */
object TaxiText {

  /** Raw segment lines split into a 9-element string array column `f`.
    * Arity != 9 rows are dropped here (AirportTripsRevenue.java:155-157);
    * all other cleaning happens in the trip-reconstruction pipeline.
    */
  def readSegments(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(regexp_replace(col("value"), "'", ""), ",", -1).as("f"))
      .filter(size(col("f")) === 9)

  /** Trips file parsed to typed columns. Only the four coordinate fields are
    * projected by Q1 (SparkTripLength.java:44-49), but the full schema is
    * exposed for reuse; Catalyst prunes unused columns.
    */
  def readTrips(spark: SparkSession, path: String): DataFrame = {
    val f = split(col("value"), "\\s+", -1)
    spark.read.text(path)
      .select(
        element_at(f, 1).cast("int").as("taxi"),
        element_at(f, 2).cast("double").as("start_time"),
        element_at(f, 3).cast("double").as("start_lat"),
        element_at(f, 4).cast("double").as("start_long"),
        element_at(f, 5).cast("double").as("stop_time"),
        element_at(f, 6).cast("double").as("stop_lat"),
        element_at(f, 7).cast("double").as("stop_long"),
        element_at(f, 8).cast("boolean").as("is_airport"),
        element_at(f, 9).cast("double").as("dist_km"),
        element_at(f, 10).cast("double").as("revenue"),
        element_at(f, 11).as("date"))
  }
}
