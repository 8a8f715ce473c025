package graft.queries

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the extension operators composed the
  * way a real pipeline chains them — quality gate → near-duplicate removal
  * (MinHash-LSH, keep the lowest doc_id of each duplicate pair) → join with
  * the embedding store → per-source retention report. One lazy DAG; every
  * stage is the already-tested operator, so this query exercises
  * composition, not new logic.
  */
object Curation {

  def pipeline(spark: SparkSession, docs: DataFrame, embeddings: DataFrame,
               minQuality: Double = 0.05, dupThreshold: Double = 0.6): DataFrame = {
    // 1. quality gate — the score computed AS A COLUMN on the doc scan
    //    (same formula as qualityStats via TextAnalysis.qualityScore); the
    //    earlier qualityStats-then-self-join form paid a second documents
    //    scan, a shuffle join on doc_id, and qualityStats' global sort,
    //    all to attach one column the scan can compute in place
    graft.functions.ArrayExpressions.register(spark)
    val gated = docs
      .withColumn("quality_score", TextAnalysis.qualityScoreOn(col("text")))
      .filter(col("quality_score") >= minQuality)
    // 2. near-dup removal: every doc_b of a verified LSH pair drops
    //    (doc_a < doc_b, so the lowest id of each cluster survives)
    val losers = Dedup.minhashLshPairs(docs, threshold = dupThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val deduped = gated.join(losers, Seq("doc_id"), "left_anti")
    // 3. attach embeddings (inner: curated set must be embeddable)
    val withEmb = deduped.join(
      embeddings.select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    // 4. retention report per source
    val total = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    withEmb.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("kept_chars"),
        round(avg(col("quality_score")), 6).as("avg_quality"))
      .join(total, "source")
      .withColumn("retention", round(col("n_kept").cast("double") / col("n_total"), 6))
      .select("source", "n_total", "n_kept", "kept_chars", "avg_quality", "retention")
      .orderBy("source")
  }
}
