package graft.operators

import graft.CkptOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank with NO single-partition window anywhere —
  * the two-phase offset pattern, extracted (r19 review) as the ONE
  * definition behind the SNM sort-based blocking rank
  * ([[Dedup]] x94/x104) and the DSIR selection rank
  * ([[TextAnalysis.dsirSelect]] x90, inherited by x100):
  *
  *  1. range-repartition by the caller's total order, so partition p
  *     holds ranks strictly before partition p+1;
  *  2. `row_number` WITHIN each partition (a partitioned window — the
  *     window re-sorts per partition, so no pre-sort is materialized);
  *  3. add per-partition prefix offsets, computed as a driver-side
  *     prefix sum over the per-partition counts — a CONFIG-bounded
  *     relation (≤ spark.sql.shuffle.partitions rows, data-INdependent:
  *     the documented sizing-probe family), which keeps even the offset
  *     step free of unpartitioned windows.
  *
  * The repartitioned relation is ckpt'd: the pid→count pairing must
  * come from ONE materialization (recomputing it could re-sample
  * different range boundaries), and `spark_partition_id` is only
  * deterministic against frozen blocks. The prefix sum's total comes
  * back for free, saving callers a second full evaluation of their
  * input for a count.
  */
private[graft] object GlobalRank {

  /** Rank `df` by the total order `order` (include a unique tie-break
    * column). Returns (`df` + 1-based global `rn`, total row count).
    *
    * EAGER AT CONSTRUCTION (r19 ADVICE, documented trade): the ckpt of
    * the repartitioned input and the per-partition-count collect are
    * Spark jobs that run when this method is CALLED, not at the first
    * action on the returned frame — merely building an x90/x100 plan
    * (explain, a plan-shape probe, a dry `SparkEntry.queries` listing)
    * executes the whole upstream pipeline. That is the repo's standard
    * eager-ckpt convention (the pid→count pairing is only sound against
    * frozen blocks, see object doc), so it stays; callers needing a
    * construction-time-cheap path must rank lazily themselves and give
    * up the determinism guarantee.
    */
  def withRank(df: DataFrame, order: Column*): (DataFrame, Long) = {
    val parts = df.repartitionByRange(order: _*)
      .withColumn("pid", spark_partition_id())
      .ckpt()
    val cnts = parts.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = cnts.map { case (pid, n) => val o = acc; acc += n; (pid, o) }
    val ss = df.sparkSession
    import ss.implicits._
    val offs = offRows.toSeq.toDF("pid", "off")
    val wIn = Window.partitionBy(col("pid")).orderBy(order: _*)
    val ranked = parts.join(broadcast(offs), "pid")
      .withColumn("rn", col("off") + row_number().over(wIn))
      .drop("pid", "off")
    (ranked, acc)
  }
}
