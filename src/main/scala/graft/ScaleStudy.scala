package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LSH dedup scale study: measures candidate-pair volume and wall time of
  * the MinHash-LSH path at 1×/3×/10× the corpus, to demonstrate (or
  * refute) the Σ bucket² near-linearity claim that makes banded LSH the
  * 100-TB dedup plan. Results are recorded in BASELINE.md.
  *
  * Corpus expansion must keep duplicate DENSITY constant: replica r
  * applies an alphabet rotation (a deterministic substitution cipher) to
  * every document, so each replica reproduces the original corpus's
  * near-dup structure in a disjoint shingle space — 10× the corpus means
  * 10× the clusters of the same shape, not clusters 10× denser (naive
  * replication would make every original+replica set mutually near-dup
  * and measure an artificial quadratic blow-up instead of scaling).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.ScaleStudy'
  */
object ScaleStudy {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase
  private val Digits = "0123456789"

  private def rot(s: String, r: Int): String = s.drop(r % s.length) + s.take(r % s.length)

  /** k disjoint-shingle-space replicas of the corpus (replica 0 = original). */
  def expand(docs: DataFrame, k: Int): DataFrame =
    (0 until k).map { r =>
      docs.select(
        (col("doc_id") * k + lit(r)).as("doc_id"),
        (if (r == 0) col("text")
         else translate(col("text"),
           Lower + Upper + Digits, rot(Lower, r) + rot(Upper, r) + rot(Digits, r))).as("text"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session("graft-scale-study")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    // untimed warmup: codegen + JIT of the LSH plan, so the scale-1 row
    // doesn't carry one-time compile cost the larger rows don't pay
    Dedup.minhashLshPairs(docs.localCheckpoint()).count()
    graft.operators.TextAnalysis.boilerplateCoverage(docs).agg(count(lit(1))).head()
    for (k <- Seq(1, 3, 10)) {
      // materialize the synthetic corpus so timings measure LSH, not synthesis
      val corpus = expand(docs, k).localCheckpoint()
      val nDocs = corpus.count()
      val t0 = System.nanoTime()
      val nCand = Dedup.minhashLshCandidates(corpus).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nVerified = Dedup.minhashLshPairs(corpus).count()
      val tFull = (System.nanoTime() - t1) / 1e9
      println(f"""{"scale":$k,"docs":$nDocs,"candidate_pairs":$nCand,"verified_pairs":$nVerified,"candidates_sec":$tCand%.2f,"full_lsh_sec":$tFull%.2f}""")
      // x37 rides the same replicas: the gram relation (and the boilerplate
      // families it contains) must grow linearly with the corpus — each
      // replica reproduces the original's cross-doc gram structure in a
      // disjoint gram space, so superlinear time or sublinear boiler counts
      // would expose a scaling defect in the window-over-gram plan
      val t2 = System.nanoTime()
      val boiler = graft.operators.TextAnalysis.boilerplateCoverage(corpus)
        .agg(count(lit(1)).as("docs"), sum(col("n_grams")).as("grams"),
          sum(col("n_boiler")).as("boiler")).head()
      val tBoiler = (System.nanoTime() - t2) / 1e9
      println(f"""{"op":"boilerplate","scale":$k,"docs":${boiler.getLong(0)},"grams":${boiler.getLong(1)},"boiler_grams":${boiler.getLong(2)},"sec":$tBoiler%.2f}""")
    }
    // x31 incremental dedup: persist the stores once per scale (the
    // one-time write), then time the per-batch incremental join. The new
    // batch is doc_id%10==7 of the expanded corpus (so it grows with the
    // corpus); the claim under test is that the per-NEW-DOC cost stays
    // flat — the batch join touches O(|new| x bucket), never the corpus
    for (k <- Seq(1, 3, 10)) {
      val dirKPath = java.nio.file.Files.createTempDirectory(s"graft_scale_inc")
      val dirK = dirKPath.toString
      var stores = Seq.empty[String]
      try {
        expand(docs, k).write.mode("overwrite").parquet(s"$dirK/documents.parquet")
        val t0 = System.nanoTime()
        stores = Seq(graft.operators.IncrementalDedup.bandStore(spark, dirK),
          graft.operators.IncrementalDedup.fingerprintStore(spark, dirK))
        val tStore = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val nPairs = graft.operators.IncrementalDedup.incrementalPairs(spark, dirK).count()
        val tInc = (System.nanoTime() - t1) / 1e9
        val nNew = spark.read.parquet(s"$dirK/documents.parquet")
          .filter(graft.operators.IncrementalDedup.isNewDoc(col("doc_id"))).count()
        println(f"""{"op":"incremental","scale":$k,"new_docs":$nNew,"pairs":$nPairs,"store_build_sec":$tStore%.2f,"batch_sec":$tInc%.2f}""")
      } finally {
        // each scale mints a unique temp-dir tag, so nothing ever sweeps
        // these: drop the catalog entries and delete the store layouts +
        // fixture copy here or leak three dirs and six tables per run
        stores.foreach { tbl =>
          spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
          graft.sources.LayoutCache.deleteTree(java.nio.file.Paths.get(
            System.getProperty("java.io.tmpdir"), "graft_bucketed", tbl))
        }
        graft.sources.LayoutCache.deleteTree(dirKPath)
      }
    }
    // x49 incremental ANN: persist the index stores once per scale, time
    // the per-batch probe. Replica r cyclically ROTATES each vector's
    // dimensions — an orthogonal transform, so intra-replica geometry
    // (cosines, norms) is exact while the hyperplane signs re-randomize
    // per replica: bucket occupancy grows with the corpus at the natural
    // chance rate, not k× duplicate spikes. NOTE the honest scaling
    // shape: with nBits FIXED, occupancy per bucket grows linearly with
    // the corpus, so per-probe candidate sets (and batch cost) grow with
    // corpus size by design — production sizes nBits ~ log2(corpus) to
    // hold occupancy constant; what must stay flat here is the per-
    // CANDIDATE cost (batch_sec / candidates), recorded in BASELINE.md.
    for (k <- Seq(1, 3, 10)) {
      val dirKPath = java.nio.file.Files.createTempDirectory("graft_scale_ann")
      val dirK = dirKPath.toString
      var stores = Seq.empty[String]
      try {
        val emb = Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        // rotation must stay inside the vector: r*7 unguarded reaches 63
        // at k=10 on the 64-dim fixture, and any larger k or smaller dim
        // would make size(v)-rot non-positive and abort the slice
        val dim = math.max(emb.select(max(size(col("v")))).head.getInt(0), 1)
        (0 until k).map { r =>
          val rot = (r * 7) % dim
          emb.select((col("vec_id") * k + lit(r)).as("vec_id"),
            (if (r == 0) col("v")
             else expr(s"concat(slice(v, ${rot + 1}, size(v) - $rot), slice(v, 1, $rot))"))
              .as("embedding"))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dirK/embeddings.parquet")
        val t0 = System.nanoTime()
        stores = Seq(graft.operators.IncrementalAnn.bucketStore(spark, dirK),
          graft.operators.IncrementalAnn.vectorStore(spark, dirK))
        val tStore = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val nRows = graft.operators.IncrementalAnn.incrementalTopK(spark, dirK).count()
        val tInc = (System.nanoTime() - t1) / 1e9
        val nNew = spark.read.parquet(s"$dirK/embeddings.parquet")
          .filter(graft.operators.IncrementalAnn.isNewVec(col("vec_id"))).count()
        println(f"""{"op":"incremental_ann","scale":$k,"new_vecs":$nNew,"topk_rows":$nRows,"store_build_sec":$tStore%.2f,"batch_sec":$tInc%.2f}""")
      } finally {
        stores.foreach { tbl =>
          spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
          graft.sources.LayoutCache.deleteTree(java.nio.file.Paths.get(
            System.getProperty("java.io.tmpdir"), "graft_bucketed", tbl))
        }
        graft.sources.LayoutCache.deleteTree(dirKPath)
      }
    }
    spark.stop()
  }
}
