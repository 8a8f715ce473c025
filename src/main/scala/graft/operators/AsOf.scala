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
    * window partition, so its row_number is 1).
    */
  def join(left: DataFrame, right: DataFrame,
           leftId: String, leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(col(leftId)).orderBy(rightTime.desc, tieBreak.desc)
    left.join(right, leftKey === rightKey && rightTime <= leftTime, "left")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
