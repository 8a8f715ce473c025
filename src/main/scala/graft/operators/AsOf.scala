package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row with
  * matching key and right.time <= left.time. Spark has no native ASOF
  * operator; this composes it from an equi+range join and a per-left-row
  * top-1 window, which Catalyst plans as one shuffle on the key (the
  * window partition reuses the join's hash distribution).
  *
  * Scale note: the intermediate is |matches per left row| before the
  * window prunes to 1; for heavily-versioned right sides, pre-aggregate
  * the right table per (key, time-bucket) first.
  */
object AsOf {

  /** `leftId` must uniquely identify left rows (window partition key).
    * Right columns keep their names; ties on right.time break by
    * `tieBreak` descending. LEFT semantics: a left row with no qualifying
    * right row is preserved with null right columns (it forms a singleton
    * window partition, so its row_number is 1). `tolerance` (same units
    * as the time columns) bounds how stale the match may be: matches
    * older than leftTime − tolerance are treated as absent, like pandas
    * `merge_asof(tolerance=...)` — without it, a years-stale version
    * silently joins as "current".
    */
  def join(left: DataFrame, right: DataFrame,
           leftId: String, leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column, tieBreak: Column,
           tolerance: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(col(leftId)).orderBy(rightTime.desc, tieBreak.desc)
    val cond = leftKey === rightKey && rightTime <= leftTime &&
      tolerance.map(t => rightTime >= leftTime - t).getOrElse(lit(true))
    left.join(right, cond, "left")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Sort-based as-of — identical semantics to [[join]], built for the
    * heavily-versioned case [[join]]'s scaladoc warns about: instead of
    * materializing every (left, earlier-right) match and pruning to one,
    * both sides union into one stream per key, ordered by (time, rights
    * before lefts at the same instant, tie-break); a running
    * `last(right_struct, ignoreNulls)` then carries the most recent right
    * row onto each left row. One shuffle on the key, one sort, ZERO
    * multiplicative blow-up — intermediate size is |left| + |right|
    * regardless of how many right versions precede a left row.
    */
  def joinSorted(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column,
                 leftTime: Column, rightTime: Column, tieBreak: Column,
                 tolerance: Option[Column] = None): DataFrame = {
    val rightCols = right.columns
    // a null-time right row can never satisfy rightTime <= leftTime in the
    // predicate form, but unfiltered it would sort FIRST (nulls-first) and
    // get picked up by last() — drop it to keep the semantics identical
    val r = right.filter(rightTime.isNotNull).select(
      rightKey.as("_k"), rightTime.as("_t"), lit(1).as("_isR"), tieBreak.as("_tb"),
      struct(rightCols.toIndexedSeq.map(right(_)): _*).as("_rs"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("_ls"))
    val l = left.select(
      leftKey.as("_k"), leftTime.as("_t"), lit(0).as("_isR"),
      lit(null).cast(r.schema("_tb").dataType).as("_tb"),
      lit(null).cast(r.schema("_rs").dataType).as("_rs"),
      struct(left.columns.toIndexedSeq.map(left(_)): _*).as("_ls"))
    // At one instant: right rows sort BEFORE left rows (a version effective
    // at t is visible to a left row at t — the <= contract), and later
    // tie-breaks win because last() takes the final qualifying row.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_isR").desc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftFields = left.columns.map(c => col(s"_ls.$c").as(c))
    val rightFields = rightCols.map(c => col(s"_asof.$c").as(c))
    val base = r.unionByName(l)
      .withColumn("_asof", last(col("_rs"), ignoreNulls = true).over(w))
    // Tolerance gate: the running last() can carry a match arbitrarily
    // far forward, so the matched right TIME rides along in a second
    // running column and a too-stale match nulls back out (the struct
    // nulls as a whole → all right fields null, same as no match). The
    // extra window column shares the same window frame — no extra
    // shuffle or sort — and is skipped entirely when no tolerance is set,
    // keeping the default plan byte-identical to before.
    val gated = tolerance match {
      case None => base
      case Some(tol) => base
        .withColumn("_asofT",
          last(when(col("_isR") === 1, col("_t")), ignoreNulls = true).over(w))
        .withColumn("_asof",
          when(col("_asofT") >= col("_t") - tol, col("_asof")))
    }
    gated.filter(col("_isR") === 0)
      .select((leftFields ++ rightFields).toIndexedSeq: _*)
  }
}
