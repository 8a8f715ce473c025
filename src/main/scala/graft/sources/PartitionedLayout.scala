package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned layout + dynamic partition pruning (DPP): the
  * scan-level answer to time-scoped queries over an append-heavy fact
  * table. Writing events partitioned by event date turns "which days?"
  * into directory selection; when the day set is only known at RUNTIME
  * (it comes out of a join against a derived/filtered dimension), Spark's
  * dynamic partition pruning evaluates the build side first and prunes
  * the fact scan to the matching directories — at 100 TB this is the
  * difference between scanning the full table and scanning five
  * partitions. Complements [[Bucketed]] (q27): bucketing pre-pays the
  * JOIN shuffle, date partitioning pre-pays the time-scoped SCAN.
  *
  * Reference analog: the reference scans its full input per job
  * (`AirportTripsRevenue.java` has no partition concept); this is the
  * layout feature a 100-TB deployment of the same pipeline would lean on
  * first.
  */
object PartitionedLayout {

  /** Idempotently materialize `$dir/events.parquet` date-partitioned by
    * `d = to_date(ts)` (~30 directories on the fixture's 30-day span).
    * One file per day: `repartition(col("d"))` shuffles each day to one
    * task before `partitionBy` splits directories. Reused across
    * invocations AND across JVMs (`_SUCCESS` check) — the one-time-layout
    * amortization story, same as q27's bucketed tables.
    *
    * `d` is derived by pure UTC epoch arithmetic, NOT `to_date` — every
    * shipped session pins UTC anyway (Verify/Bench/tests), but a
    * session-timezone-dependent derivation inside a persistent cross-JVM
    * cache would let one non-UTC caller silently poison the layout for
    * every later reader. This also matches DuckDB's timezone-free
    * `CAST(ts AS DATE)` on the naive source timestamps by construction.
    */
  def partitionedEventsPath(spark: SparkSession, dir: String): String = {
    // DirTag keys on the source file's (mtime, size) too, so a
    // regenerated events.parquet invalidates this cross-JVM cache;
    // LayoutCache writes to a temp sibling + atomic rename (no partially
    // visible or mid-overwrite directories) and sweeps stale tags.
    val tag = "events_bydate_" + DirTag(dir, "events")
    LayoutCache.materialize("graft_partitioned", "events_bydate_" + DirTag.dirScope(dir) + "_", tag) { tmp =>
      Tables.load(spark, dir, "events")
        // FLOOR division in integer arithmetic: `/` is double division (a
        // last-microsecond-of-day event sits ~1e-11 below the next
        // integer — too close to floating rounding for a layout
        // decision), and bare `div` truncates toward zero, which would
        // bucket a pre-1970 timestamp to the wrong day vs the oracle's
        // calendar CAST(ts AS DATE)
        .withColumn("d", date_from_unix_date(expr(
          "(unix_micros(ts) div 86400000000) - " +
            "(case when unix_micros(ts) % 86400000000 < 0 then 1 else 0 end)").cast("int")))
        .repartition(col("d"))
        .write.mode("overwrite").partitionBy("d")
        .parquet(tmp)
    }.toString
  }

  /** Catalog registration of the date-partitioned layout: resolve the
    * ~30-directory listing + parquet footer schema ONCE per (JVM, tag)
    * and serve every later call from catalog metadata. Before this,
    * q28 re-ran `spark.read.parquet(path)` per invocation — a fresh
    * directory listing and schema read each time, which is exactly the
    * per-call layout cost the r6 driver bench paid (q28 0.417 → 1.954 s:
    * the timed min-of-2 landed on the cold resolution, same fingerprint
    * as r5's q27). Mirrors [[Bucketed.materializedBucketedTable]]: sweep
    * older same-dir tags, register over the published files
    * (metadata-only), emit the `[layout]` breadcrumb on every non-hit so
    * a recurrence is attributable from the driver log alone.
    */
  def partitionedEventsTable(spark: SparkSession, dir: String): String = {
    val tag = "events_bydate_" + DirTag(dir, "events")
    if (!spark.catalog.tableExists(tag)) {
      val t0 = System.nanoTime()
      spark.sessionState.catalog
        .listTables("default", s"events_bydate_${DirTag.dirScope(dir)}_*")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `${t.table}`"))
      val tSweep = System.nanoTime()
      val path = partitionedEventsPath(spark, dir)
      val tMat = System.nanoTime()
      // schema (incl. the discovered `d` DATE partition column) from the
      // published files — the one footer read this JVM will do for q28
      val schemaDdl = spark.read.parquet(path).schema.toDDL
      val tSchema = System.nanoTime()
      spark.sql(
        s"""CREATE TABLE `$tag` ($schemaDdl) USING parquet
           |PARTITIONED BY (`d`) LOCATION '$path'""".stripMargin)
      // populate catalog partition metadata from the directory names;
      // later scans prune through the catalog, never re-listing the root
      spark.sql(s"MSCK REPAIR TABLE `$tag`")
      val tEnd = System.nanoTime()
      def ms(a: Long, b: Long): Long = (b - a) / 1000000L
      System.err.println(s"[layout] register $tag (partitioned):" +
        s" sweep=${ms(t0, tSweep)}ms materialize=${ms(tSweep, tMat)}ms" +
        s" schema=${ms(tMat, tSchema)}ms create+repair=${ms(tSchema, tEnd)}ms")
    }
    tag
  }

  /** Q28: per-type event counts and value totals restricted to the top 5
    * days by purchase value — the day set is computed at runtime from the
    * same table, so the fact-side scan can only be pruned DYNAMICALLY.
    * The broadcast of the 5-row day dimension doubles as the DPP filter
    * (reuseBroadcastOnly mode, Spark's default): the plan's fact scan
    * carries `PartitionFilters: [dynamicpruning#...]` and reads 5 of ~30
    * directories. LayoutSpec pins that plan shape on this exact path.
    *
    * Decimal(18,2) sums both for the day ranking (deterministic ordering
    * — double summation order could flip near-ties) and the output
    * totals; `d` breaks exact ties. Oracle: the same query in DuckDB over
    * the ORIGINAL single-file events.parquet — layout must never change
    * answers.
    */
  def q28DppJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.table(partitionedEventsTable(spark, dir))
    val topDays = ev.filter(col("event_type") === "purchase")
      .groupBy(col("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("pv"))
      .orderBy(desc("pv"), asc("d"))
      .limit(5)
      .select(col("d"))
    ev.join(broadcast(topDays), "d")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("event_type")
  }
}
