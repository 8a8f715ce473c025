package graft.operators

import graft.CkptOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** x93/x97: EXACT per-group quantiles by two-pass histogram refinement —
  * the scale path for x15's `percentile`, whose aggregation buffer holds
  * every value of the group (Spark's exact Percentile materializes the
  * group in memory: fine at 10⁵ docs per language, an OOM at 10¹⁰).
  *
  * A tiny min/max/count prepass fixes the bin geometry (checkpointed so
  * it scans once); pass 1 builds a bounded per-group histogram over
  * `buckets` equi-width integer bins; a window over the
  * (group × buckets)-row histogram locates, for each requested rank
  * ⌈q·n⌉, the single bin containing it and the residual offset inside
  * that bin. Pass 2 re-scans, keeps ONLY the rows of the located bins
  * (≈ n/buckets of the data per quantile), and a row_number window over
  * those few rows reads off the exact order statistic. Memory is
  * O(buckets) per group in pass 1 and O(n/buckets) per group in pass 2
  * — `buckets` is the knob that trades the two, and nothing ever holds
  * a whole group. (The classic iterative-refinement formulation — e.g.
  * Munro–Paterson-style multi-pass selection — with the iteration count
  * fixed at two, which suffices when n/buckets rows fit a partition.)
  *
  * Determinism: bin assignment is pure integer arithmetic
  * ((v−mn)·buckets DIV (mx−mn)); ranks are ⌈q·n⌉ with one IEEE product
  * each — identical in any engine; the value AT a rank is a property of
  * the sorted multiset, so tie order inside the row_number cannot
  * change the answer. The oracle doesn't mirror the algorithm at all —
  * it states the rank definition directly over a full sort, which is
  * exactly what "exact" must match.
  */
object Quantiles {

  /** The shared two-pass core: per-language exact order statistics at
    * the given `qs` — (one row per (lang, q, v), the ckpt'd L-row
    * min/max/count stats relation so callers never re-scan for counts).
    */
  private[operators] def discreteAt(docs: DataFrame, qs: Seq[Double],
                                    buckets: Int): (DataFrame, DataFrame) = {
    val v = docs.select(col("lang"), col("n_chars").cast("bigint").as("v"))
    // the range/count prepass equi-width binning requires; ckpt'd (L rows)
    // so its scan runs ONCE — column pruning otherwise diverges the three
    // consumers into three full re-scans (the ReuseExchange trap)
    val stats = v.groupBy(col("lang"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"), count(lit(1)).as("n"))
      .ckpt()
    // pass 1: bounded histogram — integer bin index, degenerate groups
    // (mx = mn) collapse to bin 0
    def binned = v.join(broadcast(stats), "lang")
      .withColumn("b", when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(expr(s"(v - mn) * $buckets div (mx - mn)"),
          lit(buckets - 1L))))
      .select(col("lang"), col("v"), col("b"))
    val wc = Window.partitionBy(col("lang")).orderBy(col("b"))
    val cum = binned.groupBy(col("lang"), col("b")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", sum(col("cnt")).over(wc) - col("cnt"))
    // rank targets and their containing bins — (groups × qs) rows, tiny
    val located = stats
      .select(col("lang"), col("n"), explode(array(qs.map(lit): _*)).as("q"))
      .withColumn("rank", ceil(col("q") * col("n")).cast("bigint"))
      .join(cum, Seq("lang"))
      .filter(col("cum_before") < col("rank") &&
        col("rank") <= col("cum_before") + col("cnt"))
      .select(col("lang"), col("q"), col("b"),
        (col("rank") - col("cum_before")).as("off"))
    // pass 2: refine only inside the located bins
    val wr = Window.partitionBy(col("lang"), col("q")).orderBy(col("v"))
    val picked = binned.join(broadcast(located), Seq("lang", "b"))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === col("off"))
      .select(col("lang"), col("q"), col("v"))
    (picked, stats)
  }

  /** x93: per-language discrete q50/q90/q99 of document length — the
    * value at rank ⌈q·n⌉ (1-based, ascending). Output
    * (lang, q50, q90, q99, n).
    */
  def twoPassDiscrete(docs: DataFrame, buckets: Int = 1024): DataFrame = {
    val qs = Seq(0.5, 0.9, 0.99)
    val (picked, stats) = discreteAt(docs, qs, buckets)
    picked.groupBy(col("lang"))
      .agg(max(when(col("q") === qs(0), col("v"))).as("q50"),
        max(when(col("q") === qs(1), col("v"))).as("q90"),
        max(when(col("q") === qs(2), col("v"))).as("q99"))
      .join(broadcast(stats.select(col("lang"), col("n"))), "lang")
      .orderBy(col("lang"))
  }

  /** x97: per-language length-outlier gate by Tukey fences — the
    * standard robust curation filter (Tukey 1977's 1.5·IQR rule): keep a
    * document iff q25 − ⌊3·IQR/2⌋ ≤ length ≤ q75 + ⌊3·IQR/2⌋ of its own
    * language's distribution. Robust where a mean±k·σ gate is not: the
    * quartiles themselves are insensitive to the very outliers being
    * removed, so the fence doesn't move when the junk gets worse — and
    * the whole gate is self-calibrating per group, no hand-tuned
    * thresholds. The fence arithmetic is pure integers (⌊·⌋ via DIV), so
    * the decision — and therefore every count — replays exactly.
    *
    * Built on the same two-pass machinery as x93 (quartiles never
    * materialize a group) plus ONE more scan for the gate itself: three
    * linear scans total, O(buckets) state, at any corpus size. Output
    * per language: totals, kept, dropped low/high, the quartiles and
    * fences — the audit record a curation pipeline logs before
    * discarding data.
    */
  /** The per-language Tukey fences (lang, q25, q75, lo, hi) — shared by
    * the x97 audit row and the x100 funnel's row-level gate.
    */
  private[graft] def tukeyFences(docs: DataFrame, buckets: Int = 1024): DataFrame =
    discreteAt(docs, Seq(0.25, 0.75), buckets)._1
      .groupBy(col("lang"))
      .agg(max(when(col("q") === 0.25, col("v"))).as("q25"),
        max(when(col("q") === 0.75, col("v"))).as("q75"))
      .withColumn("lo", expr("q25 - (3 * (q75 - q25)) div 2"))
      .withColumn("hi", expr("q75 + (3 * (q75 - q25)) div 2"))

  /** Row-level form of the x97 gate: the input documents that pass their
    * own language's fences, original columns preserved. The fence table
    * is L rows — a broadcast at any corpus size.
    */
  def iqrKeptDocs(docs: DataFrame, buckets: Int = 1024): DataFrame = {
    val cols = docs.columns.map(col)
    docs.join(broadcast(tukeyFences(docs, buckets)), "lang")
      .filter(col("n_chars").cast("bigint") >= col("lo") &&
        col("n_chars").cast("bigint") <= col("hi"))
      .select(cols: _*)
  }

  def iqrLengthGate(docs: DataFrame, buckets: Int = 1024): DataFrame = {
    val quart = tukeyFences(docs, buckets)
    docs.select(col("lang"), col("n_chars").cast("bigint").as("v"))
      .join(broadcast(quart), "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("v") >= col("lo") && col("v") <= col("hi"), 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_drop_low"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_drop_high"),
        max(col("q25")).as("q25"), max(col("q75")).as("q75"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"))
      .orderBy(col("lang"))
  }
}
