package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the scale path for inequality joins.
  *
  * Spark plans a bare `l.ts BETWEEN r.lo AND r.hi` join as a (broadcast)
  * nested loop: O(|L|·|R|) comparisons, which dies long before 100 TB.
  * This operator turns it into an equi-join: both sides are keyed into
  * fixed-width time bins, interval rows are exploded into every bin they
  * overlap, the bin key equi-joins (hash shuffle or broadcast — Catalyst
  * and AQE choose), and the exact range predicate post-filters the bin
  * collisions. Shuffle volume is |L| + Σ(interval width / binWidth):
  * linear, partitionable, and skew-handled by AQE like any other
  * equi-join.
  *
  * Pick `binUs` close to the typical interval width: each interval then
  * explodes into ~2 bins, and each point probes exactly one bin.
  */
object RangeJoin {

  /** Join each left "point" row (at `pointUs` microseconds) to every right
    * interval row [`loUs`, `hiUs`) that contains it. Inner semantics —
    * points in no interval and empty intervals drop. Column names of the
    * two inputs must be disjoint.
    */
  /** Exact floor division in LONG arithmetic. `floor(x / b)` would round
    * the dividend through double first — above 2^53 (e.g. nanosecond
    * epochs) that loses low bits and silently mis-bins boundary points,
    * which an equi-join can never recover. `x - pmod(x, b)` is the exact
    * floor multiple (pmod is non-negative), so the integral `div` is
    * exact.
    */
  private def floorDiv(x: Column, b: Long): Column =
    call_function("div", x - pmod(x, lit(b)), lit(b))

  def pointInInterval(left: DataFrame, pointUs: Column,
                      right: DataFrame, loUs: Column, hiUs: Column,
                      binUs: Long): DataFrame = {
    require(binUs > 0, "binUs must be positive")
    val lb = left.withColumn("_bin", floorDiv(pointUs, binUs))
    // [lo, hi) half-open: the last occupied bin is the one holding hi-1.
    val rb = right.withColumn("_bin",
      explode(sequence(floorDiv(loUs, binUs), floorDiv(hiUs - 1, binUs))))
    lb.join(rb, "_bin")
      .filter(pointUs >= loUs && pointUs < hiUs)
      .drop("_bin")
  }
}
