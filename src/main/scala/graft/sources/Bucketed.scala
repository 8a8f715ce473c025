package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table sink/source: the storage-level answer to repeated
  * large-to-large joins and aggregations on one key. Writing both fact
  * tables bucketed (and sorted) by the join key pre-shuffles the data
  * ONCE at write time; every later join/aggregation on that key plans
  * with zero Exchange (and zero per-query sort, when `sortBy` matches) —
  * at 100 TB this converts the recurring dominant cost of a pipeline
  * into a one-time layout decision. LayoutSpec pins the no-Exchange plan.
  */
object Bucketed {

  /** Write `df` as a managed bucketed table, bucketed AND sorted by
    * `key` into `numBuckets` buckets. `numBuckets` should match across
    * tables meant to co-join, and approximate (table size / healthy
    * partition size) at the target scale.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
