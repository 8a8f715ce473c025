package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for reproducible training-data pipelines.
  *
  * Random sampling (`df.sample`, reservoir) is not reproducible across
  * engines, retries, or partitionings — a curation run that must be
  * audited or diffed needs sampling that is a pure function of the data.
  * Hash-order sampling delivers that: rank rows by a multiplicative hash
  * of their id and keep the first k per group. The hash is plain integer
  * arithmetic, so any engine (including the DuckDB oracle) reproduces the
  * exact same sample.
  */
object Sampling {

  /** 2^31−1 (Mersenne prime) and an odd multiplier below 2^31: the
    * product (id mod P)·A stays under 2^62, so the arithmetic can NEVER
    * overflow a 64-bit signed integer — safe under ANSI mode for any id
    * (the repo invariant: hash coefficients < 2^31). Multiplication by A
    * is a bijection on [1, P) since P is prime.
    */
  val P = 2147483647L
  val A = 1640531527L

  /** Multiplicative hash of an id column, in [0, 2^31): integer
    * arithmetic only — portable across engines bit-for-bit, and
    * overflow-free for the full bigint id domain.
    */
  def multHash(id: Column): Column =
    pmod(pmod(id, lit(P)) * lit(A), lit(P))

  /** Deterministic k-per-group sample: the k rows with the smallest
    * [[multHash]] per group (ties by id). Implemented with the
    * bounded-heap [[graft.functions.TopKByScore]] aggregate, so each map
    * task shrinks its slice to k rows per group before the shuffle —
    * sampling a 100 TB corpus shuffles k·groups·tasks rows, not the
    * corpus.
    */
  def kPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    graft.functions.ArrayExpressions.register(df.sparkSession)
    // TopKByScore keeps the LARGEST scores: negate the hash to keep the
    // smallest-hash rows (deterministic "uniform" order).
    df.groupBy(col(groupCol))
      .agg(graft.functions.ArrayExpressions
        .topKByScore(-multHash(col(idCol)).cast("double"), col(idCol), k).as("top"))
      .select(col(groupCol), explode(col("top")).as("t"))
      .select(col(groupCol), col("t.id").as(idCol))
  }
}
