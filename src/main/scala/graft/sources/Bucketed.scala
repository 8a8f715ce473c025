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
    *
    * The data directory is produced through [[LayoutCache]] (temp sibling
    * + atomic rename, stale-tag sweep), so a SECOND JVM with the same
    * fixture reuses the files instead of re-shuffling them — registration
    * over pre-existing files is a metadata-only CREATE TABLE carrying the
    * same bucket spec. Catalog entries of older tags of the same source
    * (a long-lived session that regenerated its fixture) are dropped
    * before the new one registers, so neither the catalog nor tmpdir
    * accumulates orphans.
    */
  private def bucketedTable(spark: SparkSession, dir: String, src: String, key: String): String =
    materializedBucketedTable(spark, s"${src}_bkt_${DirTag.dirScope(dir)}_",
      src + "_bkt_" + DirTag(dir, src),
      key, Q27Buckets)(Tables.load(spark, dir, src))

  /** Idempotent, tag-keyed, cross-JVM bucketed materialization of ANY
    * derived DataFrame (`df` must be a pure function of the tag): files
    * land once via [[LayoutCache]] (temp sibling + atomic rename,
    * stale-tag sweep), then a metadata-only CREATE TABLE registers them
    * with the bucket spec — a second JVM re-registers without
    * re-shuffling. Catalog entries of older tags with the same prefix are
    * dropped first (external tables: drop is metadata-only; the sweep
    * owns the on-disk lifecycle). Shared by q27's fixture tables and the
    * incremental-dedup band/fingerprint stores.
    */
  private[graft] def materializedBucketedTable(spark: SparkSession, tagPrefix: String,
                                               tag: String, key: String, numBuckets: Int)
                                              (df: => DataFrame): String = {
    if (!spark.catalog.tableExists(tag)) {
      // Stderr breadcrumb for every NON-hit: registration is supposed to
      // happen once per (session, tag) — if a bench log shows this line
      // per call, the warm path is broken and the timings are measuring
      // registration, not the query (the r5 q27 regression question).
      val t0 = System.nanoTime()
      spark.sessionState.catalog.listTables("default", s"$tagPrefix*")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `${t.table}`"))
      val tSweep = System.nanoTime()
      var built = false
      val path = LayoutCache.materialize("graft_bucketed", tagPrefix, tag) { tmp =>
        // write under a throwaway catalog name into the temp dir; the
        // drop is metadata-only (external path), leaving the files for
        // the atomic publish
        built = true
        val writerTable = tag + "_writer"
        writeBucketed(df, writerTable, key, numBuckets, Some(tmp))
        spark.sql(s"DROP TABLE IF EXISTS `$writerTable`")
      }
      val tMat = System.nanoTime()
      // schema from the published files (footer-only read): evaluating
      // `df` here instead would burn a full compute job on the warm path
      val schemaDdl = spark.read.parquet(path.toString).schema.toDDL
      val tSchema = System.nanoTime()
      spark.sql(
        s"""CREATE TABLE `$tag` ($schemaDdl) USING parquet
           |CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $numBuckets BUCKETS
           |LOCATION '${path.toString}'""".stripMargin)
      val tEnd = System.nanoTime()
      def ms(a: Long, b: Long): Long = (b - a) / 1000000L
      System.err.println(s"[layout] register $tag (${if (built) "BUILD" else "reuse-files"}):" +
        s" sweep=${ms(t0, tSweep)}ms materialize=${ms(tSweep, tMat)}ms" +
        s" schema=${ms(tMat, tSchema)}ms create=${ms(tSchema, tEnd)}ms")
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
    // SCOPED, not session-global: physical planning is forced eagerly
    // (executedPlan) while the conf is set, then the previous value is
    // restored — the planned Dataset keeps its sort-free executed plan,
    // and no conf drift leaks into other queries of the session
    // (LayoutSpec asserts both the plan shape and the restore).
    val confKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "true")
    try {
      val li = bucketedTable(spark, dir, "lineitem", "l_orderkey")
      val o = bucketedTable(spark, dir, "orders", "o_orderkey")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
      val df = spark.table(li)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .hint("merge")
        .join(spark.table(o).select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
      df.queryExecution.executedPlan // plan now, under the conf
      df
    } finally prev.fold(spark.conf.unset(confKey))(v => spark.conf.set(confKey, v))
  }
}
