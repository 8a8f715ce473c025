package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Sketch aggregates (HyperLogLog++ distinct counting, GK-sketch
  * approximate percentiles) alongside their exact counterparts, in the
  * same oracle-the-invariants form as the compression profile: the sketch
  * VALUES are engine-internal (another engine's HLL gives different
  * estimates), but the exact columns hash-check against DuckDB and the
  * tolerance booleans pin the sketches' accuracy contract — a sketch
  * drifting outside its error bound fails the driver gate.
  *
  * Scale rationale: both sketches are the 100-TB path for their exact
  * twins — countDistinct expands to a two-phase shuffle of every distinct
  * value, and exact percentile collects per-group value arrays; HLL++ is
  * a fixed few-KB buffer per group and the quantile summary is bounded by
  * 1/accuracy, both merged map-side.
  */
object Sketch {

  /** |approx − exact| ≤ max(relTol·|exact|, absTol): the absolute floor
    * matters at SMALL cardinalities, where an HLL estimate a handful off
    * a two-digit count blows a purely relative gate (observed: a 25-value
    * group estimated outside ±10% at sf0.001) without the sketch being
    * out of contract.
    */
  private def within(approx: Column, exact: Column, relTol: Double, absTol: Double): Column =
    abs(approx.cast("double") - exact.cast("double")) <=
      greatest(lit(relTol) * abs(exact.cast("double")), lit(absTol))

  /** Per-source distinct-length and median-length stats: exact values
    * (oracled) + sketch-within-tolerance booleans. rsd 2% HLL++ against a
    * 10%-or-±8 gate; percentile_approx at accuracy 10000 against a
    * 10%-or-±8 gate.
    *
    * The exact twins are computed from a pre-reduced LENGTH HISTOGRAM
    * (`groupBy(source, n_chars)` → counts), not per-group value arrays:
    * `count(*)` over the histogram IS the exact distinct count, and the
    * frequency-weighted `percentile(n_chars, 0.5, cnt)` IS the exact
    * interpolated median — same results, but aggregate state bounded by
    * distinct lengths per source (map-side-combined) instead of one entry
    * per ROW per group. The sketches still run over the raw rows: they are
    * the honest streaming path whose accuracy the booleans pin.
    *
    * NULL semantics match the single-groupBy form and SQL: a NULL n_chars
    * row counts toward n_docs but NOT toward nd_exact (count(n_chars)
    * over the histogram skips the NULL group, like count(DISTINCT ...));
    * percentile already ignores NULL inputs; and the exact/approx halves
    * rejoin on NULL-SAFE source equality so a NULL source group survives
    * the join exactly as it survives one groupBy.
    */
  def sketchStats(docs: DataFrame): DataFrame = {
    val base = docs.select(col("source"), col("n_chars"))
    val exact = base.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_docs"),
        count(col("n_chars")).as("nd_exact"),
        round(expr("percentile(n_chars, 0.5, cnt)"), 6).as("p50_exact"))
    val approx = base.groupBy(col("source"))
      .agg(
        approx_count_distinct(col("n_chars"), 0.02).as("_nd_approx"),
        expr("percentile_approx(n_chars, 0.5, 10000)").as("_p50_approx"))
      .withColumnRenamed("source", "_source_a")
    exact.join(approx, col("source") <=> col("_source_a")).drop("_source_a")
      .select(col("source"), col("n_docs"), col("nd_exact"),
        within(col("_nd_approx"), col("nd_exact"), 0.10, 8.0).as("nd_sketch_ok"),
        col("p50_exact"),
        within(col("_p50_approx"), col("p50_exact"), 0.10, 8.0).as("p50_sketch_ok"))
      .orderBy("source")
  }
}
