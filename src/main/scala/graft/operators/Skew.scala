package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salt the skewed (large) side into
  * `buckets` sub-keys and replicate the other side across every salt, so a
  * single hot key's rows spread over `buckets` tasks instead of one.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * explicit form is for the cases AQE can't re-plan (e.g. aggregations
  * feeding a stateful operator, or forced shuffled hash joins) and to make
  * the technique testable.
  */
object Skew {

  /** Inner equi-join `left ⋈ right` on `key`, salting `left` (the skewed
    * side). Deterministic: salt = content hash modulo buckets
    * ([[saltColumn]]), not rand(), so retries/replays keep the same
    * placement.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = left.withColumn("_salt", saltColumn(left, buckets))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Content-derived salt bucket: hash of every hashable column modulo
    * `buckets`. A pure function of the ROW, so placement is identical
    * under task retries, AQE re-plans, and different input partition
    * layouts — unlike `monotonically_increasing_id`, whose value encodes
    * the partition index. Bytewise-identical rows share a bucket by
    * construction; that is fine, because identical rows collapse in the
    * map-side partial aggregate (algebraic aggs) or deduplicate in the
    * accumulator (set aggs) before any one bucket can concentrate them.
    * MapType columns are skipped (Spark's `hash` rejects them — maps have
    * no canonical entry order).
    */
  def saltColumn(df: DataFrame, buckets: Int): Column = {
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case ArrayType(e, _) => hasMap(e)
      case StructType(fs) => fs.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val hashable = df.schema.fields.collect {
      case f if !hasMap(f.dataType) => col(f.name)
    }.toIndexedSeq
    require(hashable.nonEmpty,
      "saltColumn needs at least one non-map column to derive a deterministic salt")
    pmod(hash(hashable: _*), lit(buckets))
  }

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (key, salt), then combine per key. For algebraic aggregates this is
    * what Spark's partial aggregation already does; the explicit form
    * matters for high-cardinality-accumulator aggs (e.g. collect_set)
    * where map-side partials blow memory on a hot key.
    */
  def saltedSumByKey(df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame =
    df.withColumn("_salt", saltColumn(df, buckets))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
}
