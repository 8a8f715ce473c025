package graft.queries

import graft.Tables
import graft.streaming.{GapEvent, StreamingGapSessionize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicInteger

/** Driver-visible Structured Streaming query: runs the streaming gap
  * sessionizer ([[StreamingGapSessionize]]) end to end inside the batch
  * driver contract and reshapes its closed sessions to q8's exact schema,
  * so the SAME DuckDB oracle that checks the batch operator hash-checks
  * the streaming twin — the stream-equals-batch guarantee moves from a
  * ScalaTest assertion into the driver's hard signal.
  *
  * The MemoryStream feed collects the event table to the driver; that is
  * the nature of the test-harness SOURCE (production would read Kafka/
  * files), not of the operator — the sessionizer itself holds O(1) state
  * per user and never involves the driver.
  */
object StreamingQueries {

  // memory-sink tables are session-global; unique name per invocation so
  // bench/verify reruns never read a stale sink
  private val runSeq = new AtomicInteger(0)

  def gapSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.load(spark, dir, "events")
      // cents via the SAME rounding the batch operator applies —
      // cast(value AS decimal(18,2)) is BigDecimal HALF_UP, which differs
      // from math.round(v*100) on >2-decimal or negative values (e.g.
      // 2.675 -> 268 vs 267; -0.125 -> -13 vs -12), and a divergence here
      // breaks the advertised bit-for-bit stream==batch guarantee
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => GapEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.us)
    val name = s"graft_stream_gap_${runSeq.incrementAndGet()}"
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[GapEvent]
    // The streaming stage runs EAGERLY here (processAllAvailable below), so
    // scoping the shuffle-partition count to it is safe — the returned
    // DataFrame only reads the materialized sink. Fewer partitions = fewer
    // state-store instances to open/commit per micro-batch; per-batch
    // fixed cost dominates this operator locally (state per key is O(1)
    // either way, and a real deployment sizes this to its key cardinality).
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val sessions =
      try {
        val q = StreamingGapSessionize.sessions(spark, ms.toDS(), 1800L * 1000000L)
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          if (events.nonEmpty) {
            // two chronological micro-batches exercise cross-batch state,
            // then a far-future sentinel (user -1) pushes the watermark
            // past every open session's timeout so idle sessions flush
            val (b1, b2) = events.splitAt(events.length / 2)
            ms.addData(b1.toIndexedSeq); q.processAllAvailable()
            ms.addData(b2.toIndexedSeq); q.processAllAvailable()
            ms.addData(Seq(GapEvent(-1L, events.last.us + 1000L * 3600 * 1000000, 0)))
            q.processAllAvailable()
          }
          // materialize off the memory sink, then drop its temp view —
          // repeated bench/verify invocations must not pin one full result
          // copy per run in driver memory for the session lifetime
          spark.table(name).localCheckpoint()
        } finally q.stop()
      } finally {
        spark.catalog.dropTempView(name)
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("start_us"))
    sessions.filter(col("user_id") >= 0)
      .withColumn("session_id", row_number().over(w).cast("bigint"))
      .select(col("user_id"), col("session_id"),
        col("n_events"), col("start_us"),
        (col("end_us") - col("start_us")).as("duration_us"),
        // integer cents -> double via one correctly-rounded division:
        // equals the batch decimal-sum-cast-double cents-exactly
        (col("total_cents").cast("double") / 100).as("total_value"))
      .orderBy("user_id", "session_id")
  }
}
