package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic inactivity-gap sessionization (the taxi FSM's J1-11 machinery in
  * its declarative form, reusable over any keyed event stream): lag →
  * boundary flag → running sum = session id. One shuffle on the key; both
  * window frames share it.
  */
object GapSessionize {

  /** Adds a `session_id` column (1-based per key) to `df`.
    *
    * @param keyCol   partition key (e.g. user_id)
    * @param timeUs   event time in microseconds (bigint column)
    * @param gapUs    inactivity gap that opens a new session
    * @param tieBreak deterministic secondary ordering within equal times
    */
  def assign(df: DataFrame, keyCol: Column, timeUs: Column, gapUs: Long,
             tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(timeUs, tieBreak)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prev_us", lag(timeUs, 1).over(w))
      .withColumn("_boundary",
        when(col("_prev_us").isNull || timeUs - col("_prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_boundary")).over(run))
      .drop("_prev_us", "_boundary")
  }
}
