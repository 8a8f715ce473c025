package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout amortization study: puts NUMBERS on the q27/q28 claim that a
  * one-time physical-layout write pays for repeated queries (results in
  * BASELINE.md).
  *
  * For each layout, at 1× and 10× the sf0.1 fixture (key-shifted replicas
  * — join/group cardinality per key is preserved, so 10× data means 10×
  * the work, not denser keys):
  *
  *  - `plain_write`: cost of writing the data unlaid-out (every pipeline
  *    pays this anyway — the honest baseline for "layout write cost");
  *  - `layout_write`: cost of writing bucketed-by-join-key (q27) or
  *    date-partitioned (q28);
  *  - `q_plain` / `q_layout`: steady-state per-query cost of the q27-shape
  *    join-agg (resp. q28-shape DPP join) against each layout;
  *  - breakeven N = (layout_write − plain_write) / (q_plain − q_layout):
  *    the number of queries after which the layout is net-positive.
  *
  * Run: sbt 'runMain graft.LayoutStudy'   (env: SPARK_GRAFT_SF_DIR)
  */
object LayoutStudy {

  private def timeMin(reps: Int)(f: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  /** k key-shifted replicas (replica 0 = original): join keys stay
    * consistent across tables because both sides shift identically.
    */
  private def replicate(df: DataFrame, k: Int, keys: Seq[String]): DataFrame =
    (0 until k).map { r =>
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) * k + lit(r)))
    }.reduce(_ unionByName _)
      // single-file fixtures scan as ONE partition; without this the
      // "plain" baseline would serialize on one task at 1x and the study
      // would measure parallelism artifacts instead of layout savings
      .repartition(32)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session("graft-layout-study")
    val base = java.nio.file.Files.createTempDirectory("graft_layout_study")
    val confKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(confKey, "true")

    def q27Shape(li: DataFrame, o: DataFrame): DataFrame = {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
      li.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .hint("merge")
        .join(o.select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }

    def q28Shape(ev: DataFrame): DataFrame = {
      val topDays = ev.filter(col("event_type") === "purchase")
        .groupBy(col("d"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("pv"))
        .orderBy(desc("pv"), asc("d")).limit(5).select(col("d"))
      ev.join(broadcast(topDays), "d")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("event_type")
    }

    for (k <- Seq(1, 10)) {
      val dir = s"$base/x$k"
      // ---- bucketed (q27 shape) -----------------------------------------
      val li = replicate(Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"), k, Seq("l_orderkey"))
        .localCheckpoint()
      val o = replicate(Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_orderpriority"), k, Seq("o_orderkey"))
        .localCheckpoint()
      val plainWriteB = timeMin(2) {
        li.write.mode("overwrite").parquet(s"$dir/li_plain")
        o.write.mode("overwrite").parquet(s"$dir/o_plain")
      }
      // buckets sized to the data (the 100-TB rule: bytes / healthy
      // partition size), not held constant while the data grows 10x
      val buckets = 8 * k
      val layoutWriteB = timeMin(2) {
        graft.sources.Bucketed.writeBucketed(li, s"study_li_$k", "l_orderkey", buckets,
          Some(s"$dir/li_bkt"))
        graft.sources.Bucketed.writeBucketed(o, s"study_o_$k", "o_orderkey", buckets,
          Some(s"$dir/o_bkt"))
      }
      val liP = spark.read.parquet(s"$dir/li_plain")
      val oP = spark.read.parquet(s"$dir/o_plain")
      BenchHarness.consume(q27Shape(liP, oP)) // warm
      val qPlainB = timeMin(5)(BenchHarness.consume(q27Shape(liP, oP)))
      val liB = spark.table(s"study_li_$k")
      val oB = spark.table(s"study_o_$k")
      BenchHarness.consume(q27Shape(liB, oB))
      val qLayoutB = timeMin(5)(BenchHarness.consume(q27Shape(liB, oB)))
      println(f"""{"layout":"bucketed","scale":$k,"plain_write":$plainWriteB%.2f,"layout_write":$layoutWriteB%.2f,"q_plain":$qPlainB%.3f,"q_layout":$qLayoutB%.3f,"breakeven":${(layoutWriteB - plainWriteB) / math.max(qPlainB - qLayoutB, 1e-9)}%.1f}""")

      // ---- date-partitioned (q28 shape) ---------------------------------
      val ev = replicate(Tables.load(spark, sfDir, "events")
        .select("event_id", "user_id", "event_type", "value", "ts"), k, Seq("event_id", "user_id"))
        .withColumn("d", date_from_unix_date(expr(
          "(unix_micros(ts) div 86400000000) - " +
            "(case when unix_micros(ts) % 86400000000 < 0 then 1 else 0 end)").cast("int")))
        .localCheckpoint()
      val plainWriteP = timeMin(2)(ev.write.mode("overwrite").parquet(s"$dir/ev_plain"))
      val layoutWriteP = timeMin(2) {
        ev.repartition(col("d")).write.mode("overwrite").partitionBy("d").parquet(s"$dir/ev_part")
      }
      val evP = spark.read.parquet(s"$dir/ev_plain")
      BenchHarness.consume(q28Shape(evP))
      val qPlainP = timeMin(5)(BenchHarness.consume(q28Shape(evP)))
      val evL = spark.read.parquet(s"$dir/ev_part")
      BenchHarness.consume(q28Shape(evL))
      val qLayoutP = timeMin(5)(BenchHarness.consume(q28Shape(evL)))
      println(f"""{"layout":"partitioned","scale":$k,"plain_write":$plainWriteP%.2f,"layout_write":$layoutWriteP%.2f,"q_plain":$qPlainP%.3f,"q_layout":$qLayoutP%.3f,"breakeven":${(layoutWriteP - plainWriteP) / math.max(qPlainP - qLayoutP, 1e-9)}%.1f}""")
    }

    spark.conf.unset(confKey)
    // sweep the study's temp output
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
    }
    rm(base.toFile)
    spark.stop()
  }
}
