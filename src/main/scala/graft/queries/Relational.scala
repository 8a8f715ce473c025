package graft.queries

import graft.{CkptOps, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The general-relational query surface (SURVEY.md §2.5 Q3-Q9 + JSON):
  * filter/project, multi-way joins (broadcast + shuffle), grouped
  * aggregation with having/top-k, window functions, set operations, gap
  * sessionization, tumbling time windows, JSON extraction.
  *
  * Numeric discipline for oracle parity: money-like doubles are cast to
  * decimal(18,2) BEFORE arithmetic/aggregation (the cast exactly recovers
  * the 2-decimal source values, decimal math is exact and
  * order-independent), and only the final result is cast back to double.
  * Timestamps cross the engine boundary as unix microseconds (bigint).
  */
object Relational {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Q3: TPC-H Q6 shape — selective scan with arithmetic aggregate.
    * Filters and the 4-column projection push down to the parquet scan.
    */
  def q3FilterAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.07) && col("l_quantity") < 25)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))

  /** Q4: TPC-H Q5 shape — dimension joins broadcast, fact-fact join
    * shuffles on the key; revenue per nation.
    */
  def q4JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q5: grouped agg + HAVING + ORDER BY + LIMIT (top customers by spend). */
  def q5TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("total_spent"),
        count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 3)
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(10)

  /** Q6: window functions — row_number / rank / lag over per-customer
    * order history.
    */
  def q6Window(spark: SparkSession, dir: String): DataFrame = {
    val wTime = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val wPrice = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(wTime).as("order_seq"),
        rank().over(wPrice).as("price_rank"),
        (unix_micros(col("o_orderdate").cast("timestamp")) -
          lag(unix_micros(col("o_orderdate").cast("timestamp")), 1).over(wTime))
          .as("gap_us"))
      .orderBy("o_custkey", "order_seq")
  }

  /** Q7: set operations — distinct union / intersect / except of customer
    * vs supplier nation keys, tagged and stacked into one result.
    */
  def q7SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("k"))
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("k"))
    val u = c.union(s).distinct().select(lit("union").as("op"), col("k"))
    val i = c.intersect(s).select(lit("intersect").as("op"), col("k"))
    val e = c.except(s).select(lit("except").as("op"), col("k"))
    u.union(i).union(e).orderBy("op", "k")
  }

  /** Q8: gap sessionization of the event stream — 30-minute inactivity
    * splits sessions (the taxi FSM generalized to its pure-SQL windowed
    * form: lag → boundary flag → running sum = session id).
    */
  def q8Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events").withColumn("us", unix_micros(col("ts")))
    graft.operators.GapSessionize
      .assign(events, col("user_id"), col("us"), 1800L * 1000000L, col("event_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** Q9: tumbling 1-hour time windows per event type. */
  def q9TimeWindows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(unix_micros(col("w.start")).as("hour_us"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("hour_us", "event_type")

  /** Q10: JSON extraction from the event props payload + rollup.
    * try_cast, not cast: a props payload whose `$.k` is non-numeric must
    * fall into the null group (drop-don't-fail), not abort under ANSI.
    */
  def q10Json(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(expr("try_cast(get_json_object(props, '$.k') AS bigint)").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("k_mod")

  /** Q11: ROLLUP grouping sets — per (returnflag, linestatus), per
    * returnflag, and grand total in one pass.
    */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame = {
    // Pre-aggregate to the FINEST grouping first, then roll the tiny
    // result up: Spark's grouping-sets Expand replicates every input row
    // once per set (3x the 600k-row scan here, Nx at 100 TB) BEFORE the
    // aggregate; sums of sums are the same values, but the expand runs
    // over |groups| rows instead of |lineitem|. The data-null vs
    // subtotal-null output ambiguity is identical in both forms.
    val base = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).as("_sq"), count(lit(1)).as("_n"))
    base.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("_sq")).cast("double").as("sum_qty"),
        sum(col("_n")).as("n_items"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Q12: left outer join + null-skipping count — orders per customer
    * including zero-order customers.
    */
  def q12OuterJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_spent")) // null for orderless
      .orderBy("c_custkey")

  /** Q13: anti join — parts never shipped (NOT EXISTS against lineitem). */
  def q13AntiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .join(t(spark, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy("p_partkey")

  /** Q15: string-function surface — case mapping, trim, edit distance,
    * substring search (the §2.4 functions the reference never had).
    */
  def q15StringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        upper(substring(col("text"), 1, 12)).as("head_upper"),
        levenshtein(substring(col("text"), 1, 15), lit("the quick brown")).as("lev"),
        length(trim(col("text"))).as("trimmed_len"),
        instr(col("text"), "spark").cast("bigint").as("spark_pos"),
        size(split(col("text"), "spark", -1)).cast("bigint").minus(1).as("spark_hits"))
      .orderBy("doc_id")

  /** Q16: date/time extraction surface — calendar rollup of orders. */
  def q16DateFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"), quarter(col("o_orderdate")).as("q"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(month(col("o_orderdate"))).as("n_months"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy("y", "q")

  /** Q17: as-of join — each event matched to the user's most recent order
    * at or before the event time ([[graft.operators.AsOf]], the operator
    * Spark lacks natively).
    */
  def q17AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
    val orders = t(spark, dir, "orders")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    // sort-based variant: |events| + |orders| intermediate instead of
    // one row per (event, earlier order) — the form that survives
    // heavily-versioned right sides (equivalence with AsOf.join is
    // pinned in QueriesSpec)
    graft.operators.AsOf.joinSorted(events, orders,
        leftKey = col("user_id"), rightKey = col("o_custkey"),
        leftTime = col("ts"), rightTime = col("o_orderdate"),
        tieBreak = col("o_orderkey"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("o_orderkey"),
        unix_micros(col("o_orderdate")).as("order_us"),
        col("o_totalprice"))
      .orderBy("event_id")
  }

  /** Q18: range join — events rolled up into 3-day campaign windows
    * (every 7th calendar day starts one). Pure inequality join, executed
    * as a binned equi-join ([[graft.operators.RangeJoin]]) instead of the
    * nested-loop plan Spark would otherwise pick.
    */
  def q18RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ev = t(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
    val windows = t(spark, dir, "events")
      .select(date_trunc("day", col("ts")).as("d")).distinct()
      .filter(dayofmonth(col("d")) % 7 === 1)
      .select(unix_micros(col("d")).as("lo_us"))
      .withColumn("hi_us", col("lo_us") + lit(3L * dayUs))
    graft.operators.RangeJoin
      .pointInInterval(ev, col("ts_us"), windows, col("lo_us"), col("hi_us"), dayUs)
      .groupBy(col("lo_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("lo_us")
  }

  /** Q19: semi join — customers with at least one order in a half-year
    * window; the probe side never duplicates build-side matches.
    */
  def q19SemiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy("c_custkey")

  /** Q20: CUBE grouping sets — all four aggregation granularities of
    * (returnflag, linestatus) in one pass.
    */
  def q20Cube(spark: SparkSession, dir: String): DataFrame = {
    // same pre-aggregate-then-expand shape as q11 — the cube's 4x row
    // replication runs over |groups| pre-aggregated rows, not the scan
    val base = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).as("_sq"), count(lit(1)).as("_n"))
    base.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("_sq")).cast("double").as("sum_qty"),
        sum(col("_n")).as("n_items"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Q21: pivot — event counts per day with one column per event type
    * (explicit value list keeps the output schema static, which also
    * skips Spark's extra distinct-values job).
    */
  def q21Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .groupBy("day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0)
      .orderBy("day")

  /** Q22: the salted skew join ([[graft.operators.Skew]]) over the
    * lineitem->orders fact join; result must equal the plain equi-join
    * (which is exactly what the oracle runs).
    */
  def q22SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_extendedprice"), col("l_discount"))
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    // 4 salt buckets: enough to spread a hot key 4-ways while keeping the
    // replicated build side small; raise with the observed skew factor.
    graft.operators.Skew.saltedEquiJoin(li, o, "okey", buckets = 4)
      .groupBy(col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** Q23: multiset set operations — INTERSECT ALL / EXCEPT ALL keep
    * multiplicities (min / difference), collapsed to per-key counts.
    */
  def q23SetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("k"))
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("k"))
    val ia = c.intersectAll(s).select(lit("intersect_all").as("op"), col("k"))
    val ea = c.exceptAll(s).select(lit("except_all").as("op"), col("k"))
    ia.union(ea).groupBy(col("op"), col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy("op", "k")
  }

  /** Q24: Spark's native session_window aggregation — same 30-minute-gap
    * semantics as the composed q8 sessionizer, through the built-in
    * operator (merging session windows inside the aggregate instead of a
    * lag/cumsum prepass). Boundary semantics: a gap of exactly the window
    * size starts a NEW session (session end is exclusive).
    */
  def q24SessionWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "start_us")

  /** Q25's SQL — ONE definition shared by the engine (spark.sql) and the
    * DuckDB oracle (SparkEntry.oracleSql), so the two sides cannot drift
    * apart while keeping identical aliases.
    */
  val Q25Sql: String =
    """SELECT l_returnflag,
      |       CAST(sum(CAST(l_extendedprice AS decimal(18,2))) AS double) AS small_qty_revenue,
      |       count(*) AS n_items
      |FROM lineitem l
      |WHERE l_quantity < (SELECT 0.4 * avg(l2.l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Q25: correlated scalar subquery (TPC-H Q17 shape) through the SQL
    * surface — parts whose order quantity sits below 40% of that part's
    * own average. Exercises Catalyst's subquery decorrelation: the
    * correlated `avg` rewrites to an aggregate + join, NOT a per-row
    * re-scan (LayoutSpec pins the no-nested-loop plan).
    */
  def q25CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(Q25Sql)
  }

  /** Q26: sliding window frames — per-customer running total and 3-order
    * sliding sum over order history (ROWS frames; q6 covers the rank/lag
    * surface, this pins aggregates-over-frames). Frame sums stay decimal
    * (exact, order-independent) until the final double cast.
    */
  def q26WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        dec(col("o_totalprice")).as("p"))
      .withColumn("run_total", sum(col("p")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("sum3", sum(col("p")).over(w.rowsBetween(-2, 0)))
      .select(col("o_custkey"), col("o_orderkey"),
        col("run_total").cast("double").as("run_total"),
        col("sum3").cast("double").as("sum3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q32: window DISTRIBUTION functions — ntile quartiles, percent_rank,
    * cume_dist of each customer's total spend WITHIN their nation. The
    * window partitions by nation (a global spend ranking would funnel
    * every row through one sort partition — the anti-pattern this query
    * deliberately avoids at 100 TB); ties break on c_custkey so every
    * function is deterministic. percent_rank/cume_dist ship UNROUNDED:
    * they are exact small-integer divisions, so both engines produce the
    * same IEEE double and the compare is bit-exact — rounding them
    * DIVERGES on exact decimal ties (sf0.1 hits cd = 333/640 =
    * .5203125, where Spark's HALF_UP on the shortest decimal repr says
    * .520313 and DuckDB says .520312).
    */
  def q32WindowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("spend").desc, col("c_custkey"))
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("spend_dec"))
      .withColumn("spend", col("spend_dec").cast("double"))
      .withColumn("quartile", ntile(4).over(w))
      // pr/cd ship UNROUNDED: both engines compute the same exact IEEE
      // double for these small-integer divisions, while round-to-6 DIVERGES
      // on exact decimal ties (sf0.1 has cd = 333/640 = .5203125 — Spark
      // HALF_UP says .520313, DuckDB .520312)
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select(col("c_nationkey"), col("c_custkey"), col("spend"),
        col("quartile"), col("pr"), col("cd"))
      .orderBy("c_nationkey", "c_custkey")
  }

  /** Q29: runtime bloom-filter semi-join reduction. A selective dimension
    * filter (urgent orders, ~1/5) joins the fact table; Spark's
    * InjectRuntimeFilter builds a bloom filter over the filtered orders'
    * keys and applies `might_contain(xxhash64(l_orderkey))` on the
    * lineitem side BEFORE its shuffle — the fact rows that cannot match
    * never leave the scan stage. At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling the ~20 % that survives
    * the filter; locally the fixture is far below the injection
    * thresholds, so they are scoped to 0/-1 around EAGER physical
    * planning (the q27 pattern: the planned Dataset keeps its
    * bloom-filtered plan, no conf drift leaks — LayoutSpec asserts
    * both the `might_contain` subquery and the restore). Broadcast is
    * disabled in the same scope: a broadcast join already avoids the fact
    * shuffle, which would make the demonstration vacuous; sort-merge is
    * the 100-TB shape where both sides exceed driver memory.
    */
  private def withQ29Confs[T](spark: SparkSession)(body: => T): T = {
    val scoped = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = scoped.map { case (k, _) => k -> spark.conf.getOption(k) }
    scoped.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(x => spark.conf.set(k, x))
    }
  }

  private def q29Frame(spark: SparkSession, dir: String): DataFrame = {
    val urgent = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
  }

  /** Execute q29 fully under the scoped confs and return (rows, optimized
    * logical plan, FINAL adaptive physical plan). AQE re-optimizes lazily
    * with the LIVE session conf, so only a plan captured after an
    * under-scope execution can prove the runtime join stayed sort-merge +
    * bloom instead of broadcast-converting — LayoutSpec asserts on this.
    */
  private[graft] def q29ExecutedUnderScope(
      spark: SparkSession, dir: String): (Array[org.apache.spark.sql.Row], String, String) =
    withQ29Confs(spark) {
      val df = q29Frame(spark, dir)
      val optimized = df.queryExecution.optimizedPlan.toString
      val rows = df.collect()
      (rows, optimized, df.queryExecution.executedPlan.toString)
    }

  def q29BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    // Per-phase stderr breadcrumb (the `[layout]` convention): the r7
    // driver bench clocked this query at 3.7 s where every local probe
    // holds 0.9-1.0 s steady, and nothing in the scoped execution logged,
    // so the driver log could not attribute WHICH phase re-entered. One
    // line per call makes a recurrence attributable from the log alone.
    val t0 = System.nanoTime()
    withQ29Confs(spark) {
      val tScope = System.nanoTime()
      // EXECUTE (not just plan) inside the scope: AQE re-optimizes with
      // the live conf at execution time, so a lazily-returned frame would
      // broadcast-convert once the threshold is restored and the "fact
      // shuffle pruned by the bloom filter" demonstration would be
      // vacuous at runtime. graft.ckpt materializes the (3-row)
      // result off the bloom-SMJ execution; later consumers scan that.
      val df = q29Frame(spark, dir)
      df.queryExecution.executedPlan // force analysis+optimize+physical planning
      val tPlan = System.nanoTime()
      val out = df.ckpt()
      val tExec = System.nanoTime()
      def ms(a: Long, b: Long): Long = (b - a) / 1000000L
      System.err.println(s"[q29] scope=${ms(t0, tScope)}ms plan=${ms(tScope, tPlan)}ms" +
        s" exec+ckpt=${ms(tPlan, tExec)}ms")
      out
    }
  }

  /** Q30: CDC MERGE / upsert — apply the events changelog to the customer
    * snapshot with last-writer-wins semantics, the warehouse ingest
    * primitive (MERGE INTO target USING changelog):
    *
    *  - per key, the changelog's LAST operation wins — last = max by
    *    (event time, event_id), a deterministic total order;
    *  - `error` is the delete tombstone: the key leaves the snapshot;
    *  - any other last event upserts the key with its value — `update`
    *    when the key existed, `insert` when it did not;
    *  - untouched snapshot rows pass through as `keep`.
    *
    * The snapshot is the fixture's customers minus the ≡2 (mod 3) residue
    * class — a deterministic stand-in for "keys created after the
    * snapshot was taken", so all four outcomes occur at every SF (the
    * fixture's user_ids are a prefix of c_custkey, which would otherwise
    * never exercise the insert branch).
    *
    * Scale shape: ONE shuffle of the (small) changelog for its per-key
    * window, one key-join against the snapshot. At 100 TB the snapshot is
    * the big side and arrives bucketed by key (q27's layout), making the
    * merge exchange-free on it — the changelog-sized window and join are
    * the only moving parts, which is what lets a daily CDC apply run at
    * snapshot scale.
    */
  def q30MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
    val last = t(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"), col("value").as("last_value"))
    cdcMergeWithSnapshot(spark, dir, last)
  }

  /** The MERGE step of [[q30MergeUpsert]] against the residue-class
    * snapshot — ONE definition shared with the streaming CDC apply
    * (x61, [[graft.queries.StreamingQueries.streamingCdcUpsert]]), so
    * batch and streaming ingests cannot drift on merge semantics.
    * `last`: one row per changed key — (user_id, last_type, last_value).
    */
  private[queries] def cdcMergeWithSnapshot(spark: SparkSession, dir: String,
                                            last: DataFrame): DataFrame = {
    val snapshot = t(spark, dir, "customer")
      .filter(col("c_custkey") % 3 =!= 2)
      .select(col("c_custkey"), col("c_acctbal"))
    snapshot.join(last, col("c_custkey") === col("user_id"), "full")
      .filter(col("last_type").isNull || col("last_type") =!= "error") // tombstones delete
      .select(
        coalesce(col("c_custkey"), col("user_id")).as("key"),
        round(when(col("user_id").isNull, col("c_acctbal")).otherwise(col("last_value")), 2)
          .as("acctbal"),
        when(col("user_id").isNull, lit("keep"))
          .when(col("c_custkey").isNull, lit("insert"))
          .otherwise(lit("update")).as("op"))
      .orderBy("key")
  }

  /** Q31: SCD2 history build — the other half of the CDC pair ([[q30MergeUpsert]]
    * keeps only the latest state; this keeps EVERY state with its validity
    * interval, the slowly-changing-dimension type-2 shape):
    *
    *  - each non-tombstone changelog event opens a version row carrying
    *    its value and `valid_from_us`;
    *  - `valid_to_us` = the next event's time for the same key (exclusive
    *    bound via `lead` over (time, event_id) — a deterministic total
    *    order), NULL while the version is still open;
    *  - an `error` tombstone emits no version but still CLOSES the
    *    previous one (lead is computed before the tombstone filter), so a
    *    deleted key's history ends with a closed interval and no
    *    `is_current` row — the SCD2 delete;
    *  - `event_id` rides along as version lineage, which also makes the
    *    output ordering total.
    *
    * Scale shape: ONE shuffle of the changelog by key for the window; no
    * join at all — history construction is embarrassingly key-parallel,
    * which is why SCD2 backfills scale to full-history replays.
    */
  def q31Scd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"), round(col("value"), 2).as("value"),
        col("us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy("user_id", "valid_from_us", "event_id")
  }

  /** Q33: explicit GROUPING SETS + grouping() — the arbitrary-combination
    * surface ROLLUP (q11) and CUBE (q20) don't pin. The set list is
    * deliberately NOT a rollup or cube prefix family:
    * ((returnflag, linestatus), (linestatus), ()) — it includes the empty
    * (grand-total) set and a single-column set that skips the leading
    * column, the reporting shape a real user writes weekly. `grouping()`
    * flags disambiguate subtotal-NULL from data-NULL (the ambiguity q11
    * documents), shipped as bigint on both sides.
    *
    * Same scale posture as q11/q20: pre-aggregate to the FINEST grouping
    * first, then expand — Spark's Expand replicates each input row once
    * per set (3× here) BEFORE the aggregate, so the replication runs over
    * |groups| pre-aggregated rows instead of the 100-TB scan.
    */
  def q33GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).as("_sq"), count(lit(1)).as("_n"))
    base.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")),
          Seq.empty[org.apache.spark.sql.Column]),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("bigint").as("g_flag"),
        grouping(col("l_linestatus")).cast("bigint").as("g_status"),
        sum(col("_sq")).cast("double").as("sum_qty"),
        sum(col("_n")).as("n_items"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("g_flag"), col("g_status"), col("sum_qty"), col("n_items"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Q34: RANGE-frame window aggregate — per-customer trailing-30-day
    * spend over order history, the time-based sliding shape q26's ROWS
    * frames cannot express. Ordering is by epoch-micros (a numeric RANGE
    * frame — identical semantics in every engine, no interval-type
    * dependence); customers place multiple orders on the same date, so
    * same-date orders are frame PEERS: they all see the same trailing sum
    * including each other — exactly where RANGE ≠ ROWS (pinned in
    * QueriesSpec). Peer-tied values make the result deterministic without
    * a tie-break in the frame ordering; the OUTPUT ordering still
    * tie-breaks on o_orderkey. Frame sums stay decimal until the final
    * double cast (q26's discipline).
    *
    * Scale shape: one shuffle on o_custkey, per-partition sort — the same
    * single-exchange plan as q26; the frame is evaluated with a sliding
    * accumulator over the sorted run, never materializing per-row frames.
    */
  def q34RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_us"))
      .rangeBetween(-30L * dayUs, 0L)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("day_us"),
        dec(col("o_totalprice")).as("p"))
      .withColumn("sum_30d", sum(col("p")).over(w).cast("double"))
      .withColumn("n_30d", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("day_us"),
        col("sum_30d"), col("n_30d"))
      .orderBy("o_custkey", "day_us", "o_orderkey")
  }

  /** Q35's SQL — one definition for the engine (spark.sql over registered
    * views, the q25 pattern); the DuckDB oracle differs only in the
    * child-expansion idiom (`unnest` vs `explode`).
    */
  val Q35Sql: String =
    """WITH RECURSIVE sub AS (
      |  SELECT c_custkey AS root, c_custkey AS node,
      |         CAST(c_acctbal AS decimal(18,2)) AS bal, 0 AS depth
      |  FROM customer WHERE c_custkey BETWEEN 1 AND 50
      |  UNION ALL
      |  SELECT f.root, c.c_custkey, CAST(c.c_acctbal AS decimal(18,2)), f.depth + 1
      |  FROM (SELECT root, depth, explode(array(node * 2, node * 2 + 1)) AS child
      |        FROM sub) f
      |  JOIN customer c ON c.c_custkey = f.child
      |)
      |SELECT root, count(*) AS n_nodes, max(depth) AS max_depth,
      |       CAST(sum(bal) AS double) AS total_bal
      |FROM sub GROUP BY root ORDER BY root""".stripMargin

  /** Q35: RECURSIVE CTE — iterative fixpoint traversal through the SQL
    * surface (Spark 4's `UnionLoop`), the operator class x18/x56 could
    * only ORACLE with recursive SQL while the engine ran hand-rolled
    * pointer-doubling loops. The query walks the implicit binary tree
    * over custkeys (children of k are 2k and 2k+1 — deterministic,
    * present at every SF, terminating because keys are bounded) from
    * roots 1-50 (custkey 0 is excluded: its children are {0, 1}, a
    * self-loop that would recurse forever; for k >= 1 children are
    * strictly greater than k, so the walk must exhaust) and aggregates
    * each subtree: node count, max depth,
    * decimal-exact balance total. Each recursion step is a bounded
    * frontier JOIN against customer — the real recursive-join shape
    * (frontier grows then empties; ~log2(|customer|) iterations, far
    * under the 100-level default limit). The child expansion is an
    * explode to keep the step an EQUI-join — an `IN (2k, 2k+1)` predicate
    * would plan a nested loop.
    */
  def q35RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(Q35Sql)
  }

  /** Q36: LATERAL correlated subquery — top-2 orders per customer through
    * the decorrelated lateral-join surface (each customer's subquery has
    * its own ORDER BY ... LIMIT). Catalyst rewrites the per-row subquery into
    * a window-ranked join, NOT a per-customer re-scan; the shape every
    * reporting layer writes for "best N per key" when it doesn't want to
    * hand-write the window.
    */
  val Q36Sql: String =
    """SELECT c_custkey, t.o_orderkey, t.price, t.o_us
      |FROM customer,
      |LATERAL (
      |  SELECT o_orderkey, CAST(o_totalprice AS double) AS price,
      |         unix_micros(CAST(o_orderdate AS timestamp)) AS o_us
      |  FROM orders WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
      |) t
      |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin

  def q36LateralTopN(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(Q36Sql)
  }

  /** Q37: IGNORE NULLS window navigation — last-observation-carried-
    * forward (LOCF) gap filling, the canonical time-series repair: per
    * user, each event carries the most recent non-null sensor reading at
    * or before it. The reading is the q10 JSON extraction (`try_cast` of
    * the payload key); the fixture's props ALWAYS carries a numeric `k`,
    * so missing observations are simulated by a deterministic dropout —
    * event_id ≡ 0 (mod 4) reads as absent — the q30 residue-class
    * pattern for making every branch occur at every SF. `last(col, ignore
    * Nulls = true)` over ROWS UNBOUNDED PRECEDING..CURRENT is the one
    * window-navigation semantics q6 (rank/lag) and q26/q34 (frame
    * aggregates) don't pin; `locf_age_us` (time since that observation)
    * rides along via the same trick on the timestamp. Deterministic:
    * ordering tie-breaks on event_id. Same single-exchange shape as every
    * per-key window here.
    */
  def q37LocfWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        when(col("event_id") % 4 =!= 0,
          expr("try_cast(get_json_object(props, '$.k') AS bigint)")).as("k"))
      .withColumn("k_filled", last(col("k"), ignoreNulls = true).over(w))
      .withColumn("k_obs_us",
        last(when(col("k").isNotNull, col("us")), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("us"), col("k"), col("k_filled"),
        (col("us") - col("k_obs_us")).as("locf_age_us"))
      .orderBy("user_id", "us", "event_id")
  }

  /** Q38: UNPIVOT/melt — the wide→long reshape (the exact inverse of
    * q21's pivot, which only went long→wide). A per-nation metrics block
    * (four typed aggregate columns) melts into (n_name, metric, value)
    * rows via the native `Dataset.unpivot` (an Expand node — one
    * projection per value column, NO shuffle or join: the reshape itself
    * is free at any scale; the only exchange is the upstream aggregate's).
    * Metrics share a common double type (unpivot requires it); sums ride
    * decimal until the final cast so the melted values are order-exact.
    */
  def q38Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("c_acctbal"))).cast("double").as("sum_bal"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        count(lit(1)).cast("double").as("n_customers"))
    base.unpivot(
        Array(col("n_name")),
        Array(col("sum_bal"), col("min_bal"), col("max_bal"), col("n_customers")),
        "metric", "value")
      .orderBy("n_name", "metric")
  }

  /** Q39: nested JSON round-trip — each order's lines serialized as ONE
    * JSON payload (`to_json` of a struct holding an array<struct>), then
    * parsed back with `from_json` and re-aggregated from the PARSED side
    * only. q10 pins scalar `get_json_object`; this pins nested
    * array-of-struct construction AND schema-directed parsing — the
    * API-payload ingest/export shape. Determinism: the line array is
    * sorted (`array_sort`; l_linenumber is unique per order so struct
    * order == line order), and the 2-decimal money doubles round-trip
    * exactly through JSON's shortest-round-trip float repr. The oracle
    * replays the SAME round-trip in DuckDB's own JSON type (build →
    * serialize → cast back to struct[] → unnest), so a parse divergence
    * on either side cannot cancel out. Scale shape: one shuffle for the
    * per-order array build, then per-row JSON work inside codegen, then
    * the explode folds back to the same per-order partitioning.
    */
  def q39JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val payload = t(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        struct(col("l_linenumber").as("ln"), col("l_quantity").as("qty"),
          col("l_extendedprice").as("price"), col("l_returnflag").as("rf")).as("line"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("line"))).as("lines"))
      .select(to_json(struct(col("l_orderkey").as("ok"), col("lines"))).as("js"))
    payload
      .select(from_json(col("js"),
        "ok BIGINT, lines ARRAY<STRUCT<ln: INT, qty: DOUBLE, price: DOUBLE, rf: STRING>>",
        Map.empty[String, String]).as("p"))
      .select(col("p.ok").as("l_orderkey"), explode(col("p.lines")).as("l"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l.qty"))).cast("double").as("sum_qty"),
        max(col("l.price")).as("max_price"),
        min(col("l.rf")).as("min_rf"),
        sum(col("l.ln").cast("bigint")).as("ln_sum"))
      .orderBy("l_orderkey")
  }

  /** Q40: exact grouped percentiles — `percentile_disc` WITHIN GROUP, the
    * inverse-CDF surface x15's approx quantiles and x27's sketches don't
    * pin (those carry tolerance booleans; this is value-exact). DISC, not
    * CONT: the result is always an actual data value, so there is no
    * interpolation arithmetic to diverge between engines — the oracle
    * pins the definition itself (smallest value with cume_dist >= q) via
    * integer-exact rank comparisons. Scale: one hash-partial + sort-based
    * final aggregate per group, no global sort.
    */
  def q40Percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("q25_qty"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("med_qty"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("q75_qty"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95_price"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")

  /** Q41: VARIANT ingestion — Spark 4's semi-structured type: `props`
    * parsed ONCE with `parse_json` into a variant value, fields extracted
    * with `try_variant_get` (typed, null on missing/mistyped — the
    * schema-on-read contract), plus `is_variant_null` / `schema_of_variant`
    * checks riding as grouped counts. This is the modern replacement for
    * q10's per-field `get_json_object` string re-parsing: one parse, many
    * typed reads — at scale the parse cost is paid once per row, not once
    * per extracted field.
    */
  def q41Variant(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("try_variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("m"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        count(col("k")).as("n_k"),
        count(col("m")).as("n_missing_hits"))
      .orderBy("event_type")

  /** Q42: NULL-equality semantics — the `<=>` (null-safe equal) join and
    * IS DISTINCT FROM filtering, over genuinely nullable derived keys
    * (q30's residue-class pattern: event_id % 4 == 0 nulls the key). A
    * plain `=` join silently drops every null-keyed row from both sides;
    * the null-safe join matches null to null — the semantics that decide
    * whether a changelog's "unknown" keys correlate or vanish. The
    * aggregate pins both: matches per key INCLUDING the null key, and the
    * count a plain equi-join would have produced next to it.
    */
  def q42NullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_id"),
        expr("try_cast(get_json_object(props, '$.k') AS bigint)").as("k"))
    // probe side: a SMALL even-id slice (a changelog sample being
    // correlated against the firehose — the bounded-side shape that keeps
    // the many-to-many key match from exploding); nulls on %4
    val a = e.filter(col("event_id") % 2 === 0 && col("event_id") < 400)
      .select(when(col("event_id") % 4 =!= 0, col("k")).as("ka"), col("event_id").as("ea"))
    // build side: odd ids, nulls on %3 — DIFFERENT residue class, so both
    // sides genuinely carry nulls (a %4-null on odd ids would be empty)
    val b = e.filter(col("event_id") % 2 === 1)
      .select(when(col("event_id") % 3 =!= 0, col("k")).as("kb"), col("event_id").as("eb"))
    a.join(b, col("ka") <=> col("kb"))
      .groupBy(col("ka"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("ka").isNotNull, 1L).otherwise(0L)).as("n_equi_pairs"),
        min(col("eb")).as("min_eb"), max(col("eb")).as("max_eb"))
      .orderBy(col("ka").asc_nulls_first)
  }

  /** Q43: ordered-set and argmax aggregates — the reporting surface
    * q5/q14 don't pin: `listagg(DISTINCT …) WITHIN GROUP (ORDER BY …)`
    * (Spark 4's ordered string aggregation), deterministic `mode(…,
    * true)` (lowest value on frequency ties — the ONLY mode form an
    * oracle can gate; the default is explicitly nondeterministic), and
    * `max_by`/`min_by` with a STRUCT ordering key so price ties break on
    * orderkey instead of leaving the winner engine-dependent. All are
    * hash aggregates with map-side partials; listagg's state is bounded
    * here by DISTINCT over the 5-value priority domain (an unbounded
    * listagg over row-unique strings would concentrate a group's full
    * payload in one aggregation buffer — the same reason x22 caps its
    * collect with a bounded heap). The customer join shuffles on custkey
    * and is left to AQE: both sides scale with the corpus, so neither is
    * broadcast-safe by construction.
    */
  def q43OrderedAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("best_order"),
        expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("worst_order"),
        expr("mode(o_orderpriority, true)").as("mode_prio"),
        expr("listagg(DISTINCT o_orderpriority, ',') WITHIN GROUP (ORDER BY o_orderpriority)")
          .as("prio_csv"))
      .orderBy("c_mktsegment")

  /** Q44: MAP-typed columns end-to-end — build (`map_from_entries` over a
    * sorted entry array, so map order is deterministic), read
    * (`try_element_at` — the null-on-missing form; plain `element_at`
    * THROWS under ANSI), and transform with the map higher-order
    * functions (`map_filter`, `transform_values`, `aggregate` over
    * `map_values`). Maps leave the query as `to_json` STRINGS of sorted
    * entry arrays: map column equality is order-sensitive in parquet
    * while map semantics are not, so entries-sorted-by-key is the only
    * engine-independent contract — and the driver's canonicalizer can
    * only sort/hash atomic columns, so the sorted arrays must cross the
    * wire serialized (the q39 JSON convention; both Spark and DuckDB
    * emit the same compact `[{"key":…,"value":…}]`, `[]` when empty).
    * Two exchanges by construction
    * (custkey×priority partial counts, then per-custkey map assembly),
    * both map-side combined; per-map state is bounded by the 5-value
    * priority domain.
    */
  def q44MapFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("o_custkey"))
      .agg(map_from_entries(array_sort(collect_list(struct(
        col("o_orderpriority").as("key"), col("c").as("value"))))).as("m"))
      .select(col("o_custkey"),
        size(col("m")).as("n_prios"),
        expr("try_element_at(m, '1-URGENT')").as("n_urgent"),
        expr("to_json(map_entries(map_filter(m, (k, v) -> v >= 2)))").as("repeat_entries"),
        expr("to_json(map_entries(transform_values(m, (k, v) -> v * 10 + length(k))))")
          .as("scored_entries"),
        expr("aggregate(map_values(m), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("n_orders"))
      .orderBy("o_custkey")

  /** Q45: conditional aggregation — the `FILTER (WHERE …)` clause on
    * count/sum/max, `count_if`, and the boolean aggregates
    * `every`/`any` — the surface that replaces the
    * `sum(CASE WHEN … THEN 1 END)` idiom. One hash aggregate, all
    * partials map-side combinable (a FILTER clause never becomes a
    * second scan or a join; it's a per-row predicate on the aggregate
    * input). Timestamps leave as unix micros (the engine-boundary
    * convention); the filtered decimal sum rides exact and casts to
    * double once.
    */
  def q45FilteredAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        expr("count(*) FILTER (WHERE l_quantity > 25)").as("n_heavy"),
        expr("count_if(l_discount > 0.05)").as("n_discounted"),
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) " +
          "FILTER (WHERE l_linestatus = 'F') AS DOUBLE)").as("finished_revenue"),
        expr("every(l_quantity <= 50)").as("qty_bounded"),
        expr("any(l_tax = 0)").as("has_zero_tax"),
        // l_shipdate loads as TIMESTAMP_NTZ; the session runs UTC, so the
        // cast pins the same instant the oracle's epoch_us reads
        expr("unix_micros(CAST(max(l_shipdate) FILTER (WHERE l_discount = 0) AS TIMESTAMP))")
          .as("last_full_price_ship_us"))
      .orderBy("l_returnflag")

  /** Q46: regression/correlation statistics the REPRODUCIBLE way: the
    * five sufficient statistics (Σx, Σx², Σy, Σy², Σxy) accumulate as
    * EXACT decimals (the inputs are 2-decimal money and integer-valued
    * quantities, so every partial is exact and order-independent), and
    * slope/intercept/r are derived afterwards in ONE fixed double
    * expression tree. Spark's own `corr`/`regr_slope` stream doubles
    * through Welford-style updates whose result depends on partition
    * boundaries — on a 1000-executor cluster the same query gives a
    * different last bit every run, which can never hash-match an oracle
    * and (worse) makes regression metrics unreproducible run-to-run.
    * QueriesSpec pins the built-ins to ≈ these exact values at fixture
    * scale; the ledger gates the exact form. Decimal partials make the
    * aggregate fully map-side combinable — reproducibility here is
    * FREE at scale, not a tradeoff.
    */
  def q46RegressionStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec(col("l_quantity"))).as("sx"),
        sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("sxx"),
        sum(dec(col("l_extendedprice"))).as("sy"),
        sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice"))).as("syy"),
        sum(dec(col("l_quantity")) * dec(col("l_extendedprice"))).as("sxy"))
      .select(col("l_returnflag"), col("n_items"),
        // the SAME double expression tree as the oracle, evaluated over
        // identical exact inputs -> bit-identical IEEE results
        expr("""(CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n_items AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))""").as("slope"),
        expr("""(CAST(sy AS DOUBLE) - (CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n_items AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * CAST(sx AS DOUBLE)) / CAST(n_items AS DOUBLE)""").as("intercept"),
        expr("""(CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n_items AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * sqrt(CAST(n_items AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))""").as("corr_xy"))
      .orderBy("l_returnflag")

  /** Q47: timezone + calendar arithmetic — `convert_timezone` into two
    * zones (New York crosses the date line backwards at these midnight-
    * UTC timestamps, Tokyo forwards), ISO weekday/week numbering,
    * month-end (`last_day`) — the reporting-calendar surface q16's
    * year/quarter grouping doesn't touch. Engine-parity traps pinned on
    * purpose: Spark `weekday` is 0=Monday where DuckDB `isodow` is
    * 1=Monday (normalized to ISO 1..7 here), both engines' `weekofyear`
    * are ISO, and the 1995-2001 US DST rules must agree between the
    * JVM's tzdata and DuckDB's ICU. One hash aggregate on the derived
    * local date; the calendar columns are functions of the GROUP key.
    */
  def q47TimezoneCalendar(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      // o_orderdate loads as TIMESTAMP_NTZ; its wall time IS the UTC
      // instant (the fixture contract), so source zone is pinned to UTC
      .select(col("o_orderkey"),
        expr("convert_timezone('UTC', 'America/New_York', o_orderdate)").as("ny"),
        expr("convert_timezone('UTC', 'Asia/Tokyo', o_orderdate)").as("tokyo"))
      .groupBy(to_date(col("ny")).as("ny_date"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(to_date(col("tokyo"))).as("n_tokyo_dates"),
        min(hour(col("ny"))).as("min_ny_hour"))
      .select(col("ny_date"),
        expr("weekday(ny_date) + 1").as("dow_iso"),
        weekofyear(col("ny_date")).as("iso_week"),
        last_day(col("ny_date")).as("month_end"),
        col("n_orders"), col("n_tokyo_dates"), col("min_ny_hour"))
      .orderBy("ny_date")

  /** Q48: the `try_*` arithmetic surface — ANSI mode's dirty-data escape
    * hatches. Spark 4 runs ANSI ON, so plain division by zero, numeric
    * overflow and malformed casts ABORT the job; `try_divide` /
    * `try_multiply` / `try_cast` / `try_to_timestamp` return NULL
    * instead — the row-level drop-don't-fail posture the taxi parsers
    * implement by hand (DirtyInputSpec), here as the declarative
    * arithmetic contract. Divisors/overflows/garbage are DERIVED from
    * row keys so every code path provably fires at any scale; the
    * aggregate counts each null-production channel separately, and the
    * successful-division sum rides a 3-decimal cast (halving a 2-decimal
    * price is exact) so it stays order-independent. The oracle replays
    * the SEMANTICS with CASE guards — DuckDB's own double division would
    * give inf on zero, its integer overflow would error — which is the
    * point: the query pins Spark's null-on-failure contract, not shared
    * syntax.
    *
    * COST lesson, measured: every try_* FAILURE is an internal Java
    * exception (overflow = Math.multiplyExact's ArithmeticException,
    * casts/parses = their own throw+catch, ~10-25 µs each). A first cut
    * overflowed on ~every row and failed 20-50% of the cast/parse
    * channels — 13-16 s at sf0.1, pure exception cost. Dirty data is
    * RARE dirt (per-mille, not per-half); every failure channel here
    * fires at 0.1-0.2% (still provably non-zero at every fixture
    * scale), and the row runs at scan speed. try_divide's zero path is
    * the one exception-free channel (null arithmetic) and stays dense.
    */
  def q48TryArithmetic(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("try_divide(l_extendedprice, CAST(l_quantity AS INT) % 3)").as("div"),
        expr("try_multiply(l_orderkey, CASE WHEN l_orderkey % 777 = 0 " +
          "THEN 9223372036854775807 ELSE 2 END)").as("mul"),
        expr("try_cast(CASE WHEN l_orderkey % 500 = 0 THEN 'x' " +
          "ELSE CAST(l_quantity AS STRING) END AS DOUBLE)").as("cst"),
        expr("try_to_timestamp(CASE WHEN l_orderkey % 1000 = 0 THEN 'not-a-time' " +
          "ELSE '2024-01-01 00:00:00' END)").as("ts"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("div").isNull, 1L).otherwise(0L)).as("n_div_null"),
        sum(col("div").cast("decimal(18,3)")).cast("double").as("sum_div"),
        sum(when(col("mul").isNull, 1L).otherwise(0L)).as("n_overflow"),
        sum(when(col("cst").isNull, 1L).otherwise(0L)).as("n_bad_cast"),
        sum(when(col("ts").isNull, 1L).otherwise(0L)).as("n_bad_ts"))
      .orderBy("l_returnflag")

  /** Q49: `NOT IN` three-valued-logic trap — the most common silent-
    * wrong-answer in SQL: a NULL anywhere in the subquery makes
    * `x NOT IN (…)` UNKNOWN for every non-matching x, so the query
    * returns ZERO rows instead of the complement. Pinned side by side
    * with the two correct forms (NULL-filtered NOT IN, and NOT EXISTS —
    * which ignores NULLs by construction): one row proving the trap
    * yields 0 while both fixes agree. Spark plans the trap as a
    * null-aware anti join (a broadcast of the key set — the reason
    * NOT IN is also a SCALE hazard next to NOT EXISTS's ordinary anti
    * join). NULL keys derive from order keys so the set genuinely
    * contains them at any scale.
    */
  def q49NotInNulls(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(Q49Sql)
  }

  private[graft] val Q49Sql: String =
    """WITH k AS (
      |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS k
      |  FROM orders WHERE o_custkey < 500 AND o_custkey % 3 = 0)
      |SELECT
      |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN (SELECT k FROM k))
      |    AS n_not_in_with_nulls,
      |  (SELECT count(*) FROM customer
      |   WHERE c_custkey NOT IN (SELECT k FROM k WHERE k IS NOT NULL))
      |    AS n_not_in_filtered,
      |  (SELECT count(*) FROM customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM k WHERE k.k = c.c_custkey))
      |    AS n_not_exists""".stripMargin

  /** Q50: FUNNEL analysis — ordered event-sequence conversion
    * (view → click → purchase, each step strictly after the previous):
    * per-step reached-user counts, conversion rates and mean step
    * latencies. The product-analytics query MATCH_RECOGNIZE engines
    * special-case, expressed with running-window state instead: one
    * shuffle on user_id, then three chained prefix-min windows over the
    * SAME sort (each step's "first valid time so far" conditions on the
    * previous step's running value — no self-joins, no per-stage
    * re-scan), then an ordinary aggregate. Latencies are exact micro
    * differences of exact ints; rates are exact int/int divisions —
    * everything unrounded under the q32 discipline.
    */
  def q50Funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val staged = t(spark, dir, "events")
      // sparse slice: with the full stream every user completes every
      // step (rates pin 1.0 and discriminate nothing); 1-in-8 leaves
      // users stranded at each stage so the rates genuinely measure
      .filter(col("event_id") % 8 === 0)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("v_run",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("c_run",
        min(when(col("event_type") === "click" && col("us") > col("v_run"), col("us"))).over(w))
      .withColumn("p_run",
        min(when(col("event_type") === "purchase" && col("us") > col("c_run"), col("us"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(min(col("v_run")).as("v"), min(col("c_run")).as("c"), min(col("p_run")).as("p"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("v")).as("n_view"),
        count(col("c")).as("n_click"),
        count(col("p")).as("n_purchase"),
        (sum(when(col("c").isNotNull, col("c") - col("v"))).cast("double") /
          count(col("c"))).as("avg_v2c_us"),
        (sum(when(col("p").isNotNull, col("p") - col("c"))).cast("double") /
          count(col("p"))).as("avg_c2p_us"),
        (count(col("c")).cast("double") / count(col("v"))).as("v2c_rate"),
        (count(col("p")).cast("double") / count(col("c"))).as("c2p_rate"))
  }

  /** Q51: COHORT RETENTION — the user-lifecycle matrix every analytics
    * stack computes: users grouped by first-active week, and for each
    * cohort the count still active k weeks later, with the retention
    * rate against the cohort's own size. Week arithmetic is exact
    * integer work (both week starts are Mondays, so the day difference
    * is always a multiple of 7 and the DIV is lossless); the rate is
    * one int/int IEEE division (the q32/x55 tie class). The 1-in-13
    * event slice is q50's sparseness rationale: on the full stream
    * every user first-touches in week 1 and the matrix degenerates to a
    * single cohort.
    *
    * Scale shape: distinct (user, week) is one map-side-combined
    * aggregate; first-touch is a second aggregate on the same
    * user-partitioned exchange; the matrix is ≤ weeks² rows, and the
    * cohort-size window runs over that tiny relation — nothing after
    * the two aggregates scales with the event count.
    */
  def q51CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val wk = t(spark, dir, "events")
      .filter(col("event_id") % 13 === 0)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    val first = wk.groupBy(col("user_id")).agg(min(col("w")).as("cohort_week"))
    val m = wk.join(first, "user_id")
      .select(col("cohort_week"),
        expr("cast(datediff(w, cohort_week) div 7 as int)").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val wc = Window.partitionBy(col("cohort_week"))
    m.withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_users"))).over(wc))
      .select(col("cohort_week"), col("week_offset"), col("n_users"), col("cohort_size"),
        (col("n_users").cast("double") / col("cohort_size")).as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Q14: distinct aggregates — distinct parts/suppliers per return flag. */
  def q14DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
}
