package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * One parquet file per table under `\$dir/<name>.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") loadEvents(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.ts` loader, tolerant of the fixture's timestamp encoding
    * (see TESTDATA.md "events.ts encoding contract"). The generator has
    * shipped two encodings over time; both store the same epoch-UTC
    * instants at microsecond precision, and this loader normalizes both
    * to a session-UTC `TIMESTAMP` column losslessly:
    *
    *  - parquet TIMESTAMP(NANOS) (historical): Spark rejects nanos
    *    outright ([PARQUET_TYPE_ILLEGAL]) unless read as raw longs via
    *    `nanosAsLong`; the values are whole microseconds (ts % 1000 == 0)
    *    so `timestamp_micros(ts div 1000)` is exact.
    *  - parquet timestamp[us] with isAdjustedToUTC=false (current):
    *    Spark infers TIMESTAMP_NTZ by default. The stored int64 IS epoch
    *    micros, so we re-read with `inferTimestampNTZ.enabled=false`,
    *    which maps the column straight to TIMESTAMP (epoch-UTC instant)
    *    with no wall-clock reinterpretation. This is deliberately NOT a
    *    `cast(ntz as timestamp)`, which would shift values under a
    *    non-UTC `spark.sql.session.timeZone`.
    */
  private def loadEvents(spark: SparkSession, path: String): DataFrame = {
    // Harmless for non-nanos files; required to even resolve the schema
    // of a nanos file without throwing.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long branch (historical fixture)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integer div: `/` would round through double
      case _: TimestampNTZType => // timestamp[us] branch (current fixture)
        val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "false")
        val reread =
          try spark.read.parquet(path) // schema resolves eagerly here, under the conf
          finally prev match {
            case Some(v) => spark.conf.set(key, v)
            case None    => spark.conf.unset(key)
          }
        if (reread.schema("ts").dataType.isInstanceOf[TimestampNTZType]) {
          // SPARK-written file (e.g. a GenScaleTree tree): the embedded
          // Spark schema pins TIMESTAMP_NTZ regardless of the inference
          // conf, so the re-read trick cannot demote it. The wall-clock
          // IS the UTC instant; the cast below is lossless exactly when
          // the session timezone is UTC — which every graft session pins
          // (BenchHarness/Verify) — enforced here so a non-UTC session
          // fails fast instead of silently shifting instants.
          require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
            "events.ts NTZ→TIMESTAMP normalization requires a UTC session timezone")
          reread.withColumn("ts", col("ts").cast("timestamp"))
        } else reread
      case _ => raw // already TIMESTAMP: trust it
    }
  }

  /** Register every table as a temp view so `spark.sql` can see them. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
