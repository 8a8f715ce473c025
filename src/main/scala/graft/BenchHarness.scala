package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared session/consumption plumbing for the timing mains ([[Bench]],
  * [[Profile]]) — one place for the config, so profile numbers stay
  * comparable to bench numbers by construction.
  */
object BenchHarness {

  def session(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Trigger JIT + parquet-footer caches once so per-query numbers measure
    * the plan, not first-touch JVM warmup.
    */
  def warmup(spark: SparkSession): Unit =
    SparkEntry.entry(spark).count()

  /** Evaluate EVERY value of the result: hash all columns per row, fold
    * the hashes. A bare `count()` lets column pruning delete expensive
    * computed columns from the plan entirely — a fingerprinting query
    * "benched" by count runs at scan speed with its fingerprints never
    * computed. One xxhash64 per row is noise next to any real operator.
    *
    * Two DELIBERATE limits of this consumer, so nobody reads more into
    * the timings than they say:
    *  - a query's terminal `orderBy` is NOT timed: wrapping in an
    *    Aggregate lets Catalyst's EliminateSorts drop the (semantically
    *    unobservable) final sort. Every non-terminal sort — windows,
    *    sort-merge joins, sortWithinPartitions — is still paid.
    *  - the folded value is a consumption device, not a faithful digest:
    *    bit_xor cancels duplicate rows pairwise. The rows are still
    *    COMPUTED (that is all timing needs); correctness lives in the
    *    driver's oracle compare, which hashes actual values.
    */
  def consume(df: DataFrame): Unit = {
    // bit_xor, not sum: summing 64-bit hashes overflows long within a few
    // thousand rows and ANSI mode turns that into a runtime abort
    df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("_h"))
      .agg(expr("bit_xor(_h)")).head()
    ()
  }
}
