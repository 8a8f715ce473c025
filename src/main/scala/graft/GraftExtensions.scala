package graft

import graft.functions.ArrayExpressions.{CdcChunks, CosineSimilarity, DeflateRatio, DocFingerprint, HyperplaneBucket, LexiconHits, MinHashSignature, ShingleHashesSorted, SimHash64, SortedLongIntersectCount}
import graft.functions.VectorSum
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: makes the engine's custom expressions
  * visible to plain SQL in any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.SessionizePlan.SessionizeStrategy)
    e.injectFunction((
      FunctionIdentifier("sorted_long_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName, "sorted_long_intersect_count"),
      es => SortedLongIntersectCount(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      es => CosineSimilarity(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      es => MinHashSignature(es.head, es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("shingle_hashes_sorted"),
      new ExpressionInfo(classOf[ShingleHashesSorted].getName, "shingle_hashes_sorted"),
      es => ShingleHashesSorted(es.head, es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      es => SimHash64(es.head)))
    e.injectFunction((
      FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      es => DeflateRatio(es.head)))
    e.injectFunction((
      FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[graft.functions.TopKByScore].getName, "top_k_by_score"),
      es => graft.functions.TopKByScore(es.head, es(1),
        es(2).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
      es => HyperplaneBucket(es.head, es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("vector_sum"),
      new ExpressionInfo(classOf[VectorSum].getName, "vector_sum"),
      es => VectorSum(es.head)))
    e.injectFunction((
      FunctionIdentifier("lexicon_hits"),
      new ExpressionInfo(classOf[LexiconHits].getName, "lexicon_hits"),
      es => LexiconHits(es.head,
        graft.operators.TextAnalysis.LexiconOrder.map(graft.operators.TextAnalysis.Lexicons))))
    e.injectFunction((
      FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(classOf[DocFingerprint].getName, "doc_fingerprint"),
      es => DocFingerprint(es.head, es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      es => CdcChunks(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue(),
        es(3).eval().asInstanceOf[Number].intValue())))
  }
}
