package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table sink/source: the storage-level answer to repeated
  * large-to-large joins and aggregations on one key. Writing both fact
  * tables bucketed (and sorted) by the join key pre-shuffles the data
  * ONCE at write time; every later join/aggregation on that key plans
  * with zero Exchange (and zero per-query sort, when `sortBy` matches) —
  * at 100 TB this converts the recurring dominant cost of a pipeline
  * into a one-time layout decision. LayoutSpec pins the no-Exchange plan;
  * [[q27BucketedJoin]] puts it in the driver's correctness ledger.
  */
object Bucketed {

  /** Write `df` as a bucketed table, bucketed AND sorted by `key` into
    * `numBuckets` buckets. `numBuckets` should match across tables meant
    * to co-join, and approximate (table size / healthy partition size) at
    * the target scale. `path` makes the table external (data at `path`,
    * only metadata in the session catalog); without it the data lands in
    * the session's warehouse directory.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int,
                    path: Option[String] = None): Unit = {
    // Pre-shuffle into numBuckets partitions on the bucket key: Spark's
    // bucket placement uses the SAME Murmur3 hash as repartition, so each
    // write task then holds exactly one bucket and emits exactly one file
    // per bucket — the condition under which the scan trusts the sortBy
    // ordering and downstream merge joins skip the per-query Sort too.
    // (With multiple files per bucket only the Exchange is eliminated.)
    val w = df.repartition(numBuckets, col(key)).write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Bucket count for the q27 layout. Locally sized to the fixture scale;
    * at the 100-TB target this is (table bytes / ~256 MB) and MUST be the
    * same number on every table sharing the join key.
    */
  private val Q27Buckets = 8

  /** Idempotently materialize `$dir/<src>.parquet` as an external bucketed
    * table (once per session+dir: later invocations — e.g. warm bench
    * runs — reuse the layout, which is exactly the amortization story).
    */
  private def bucketedTable(spark: SparkSession, dir: String, src: String, key: String): String = {
    val tag = src + "_bkt_" + DirTag(dir, src)
    if (!spark.catalog.tableExists(tag)) {
      val path = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_bucketed", tag).toString
      writeBucketed(Tables.load(spark, dir, src), tag, key, Q27Buckets, Some(path))
    }
    tag
  }

  /** Q27: the q22 orders⋈lineitem aggregation run against the BUCKETED
    * layout — same result, same oracle, different physical plan: both scans
    * read the bucket layout, the merge join needs no Exchange and no
    * per-query Sort, and only the final tiny per-priority aggregate
    * shuffles. The `merge` hint keeps the demonstration deterministic
    * (without it the planner may broadcast the small side at fixture scale,
    * which is also exchange-free for lineitem but bypasses the layout).
    */
  def q27BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    // Spark 4 ignores bucket sortBy metadata by default (SPARK-33459 made
    // it opt-in after the pre-3.1 report was unsound for multi-file
    // buckets). Opting back in is sound here BECAUSE writeBucketed
    // guarantees one file per bucket — and the conf keeps its own guard:
    // a scan over multi-file buckets still sorts per query (verified
    // empirically on 4.1), so this cannot corrupt foreign bucketed tables.
    // The set is deliberately NOT save/restored: the returned DataFrame is
    // lazy and the conf is read at physical-planning time (i.e. at the
    // caller's action), so restoring before returning would undo it. It
    // persists for the session — safe (the guard above makes it a
    // correctness no-op elsewhere), but plans of OTHER single-file-bucket
    // scans in the same session may also drop their per-query sort after
    // q27 runs, which is the conf working as designed.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val li = bucketedTable(spark, dir, "lineitem", "l_orderkey")
    val o = bucketedTable(spark, dir, "orders", "o_orderkey")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    spark.table(li)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .hint("merge")
      .join(spark.table(o).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }
}
