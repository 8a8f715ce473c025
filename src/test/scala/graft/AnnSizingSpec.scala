package graft

import graft.operators.{IncrementalAnn, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Occupancy-constant ANN sizing (the x49 scale story): with nBits fixed,
  * per-bucket occupancy — and so per-probe candidate sets — grows linearly
  * with the corpus; sizing nBits ~ log2(corpus)
  * ([[Similarity.occupancySizedBits]]) holds candidates/probe flat. These
  * tests pin the sizing arithmetic and MEASURE the flatness claim on a 4×
  * corpus growth (the full 1×/3×/10× study runs in [[ScaleStudy]] and is
  * recorded in BASELINE.md).
  */
class AnnSizingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("occupancySizedBits: +1 bit per corpus doubling, floor 1, cap maxBits") {
    // the study anchors: sf0.1's 1800-vector corpus at occupancy ~28 is
    // the ledger geometry (2^6 buckets); 3x and 10x re-size to 8 and 9
    assert(Similarity.occupancySizedBits(1800, 28) == 6)
    assert(Similarity.occupancySizedBits(5400, 28) == 8)
    assert(Similarity.occupancySizedBits(18000, 28) == 9)
    // doubling the corpus adds exactly one bit once past the floor
    assert(Similarity.occupancySizedBits(3600, 28) == 7)
    // floor: a corpus below the target occupancy still gets 1 bit
    assert(Similarity.occupancySizedBits(10, 28) == 1)
    assert(Similarity.occupancySizedBits(0, 28) == 1)
    // cap: never exceeds what the caller's signature budget allows
    assert(Similarity.occupancySizedBits(1L << 40, 1, maxBits = 16) == 16)
    // monotone non-decreasing in corpus size
    val sizes = Seq(100L, 1000L, 10000L, 100000L, 1000000L)
      .map(Similarity.occupancySizedBits(_, 28))
    assert(sizes == sizes.sorted, s"sizing not monotone: $sizes")
  }

  test("candidates/probe: flat under sized nBits, grows under fixed nBits (4x corpus)") {
    val nTables = 4
    val targetOcc = 28
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    // per scale: (corpus size, probes, candidates at given nBits)
    def measure(k: Int, nBitsOf: Long => Int): (Long, Double) = {
      val dirKPath = java.nio.file.Files.createTempDirectory("graft_annsizing")
      var stores = Seq.empty[String]
      try {
        ScaleStudy.expandEmbeddings(emb, k)
          .write.mode("overwrite").parquet(s"$dirKPath/embeddings.parquet")
        val scaled = spark.read.parquet(s"$dirKPath/embeddings.parquet")
        val newP = IncrementalAnn.isNewVec(col("vec_id"))
        val corpusN = scaled.filter(!newP).count()
        val nBits = nBitsOf(corpusN)
        stores = Seq(IncrementalAnn.bucketStore(spark, dirKPath.toString, nBits, nTables),
          IncrementalAnn.vectorStore(spark, dirKPath.toString))
        val nCand = IncrementalAnn.candidateIds(spark, dirKPath.toString, nBits, nTables).count()
        val nProbes = scaled.filter(newP).count()
        (corpusN, nCand.toDouble / nProbes)
      } finally {
        stores.foreach { tbl =>
          spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
          graft.sources.LayoutCache.deleteTree(java.nio.file.Paths.get(
            System.getProperty("java.io.tmpdir"), "graft_bucketed", tbl))
        }
        graft.sources.LayoutCache.deleteTree(dirKPath)
      }
    }

    val sized: Long => Int = Similarity.occupancySizedBits(_, targetOcc, maxBits = 64 / nTables)
    val (corpus1, basePerProbe) = measure(1, sized)
    val (corpus4, sizedPerProbe) = measure(4, sized)
    val (_, fixedPerProbe) = measure(4, _ => sized(corpus1))
    assert(corpus4 > 3 * corpus1, s"expansion did not grow the corpus: $corpus1 -> $corpus4")
    // fixed nBits: occupancy (and with it candidates/probe) tracks the
    // corpus — 4x data must at least double the per-probe candidate load
    assert(fixedPerProbe >= 2.0 * basePerProbe,
      s"fixed-nBits candidates/probe did not grow: $basePerProbe -> $fixedPerProbe")
    // sized nBits: expected occupancy is constant by construction; allow
    // a 2x band for the chance collisions of a small random fixture
    assert(sizedPerProbe <= 2.0 * basePerProbe && sizedPerProbe >= basePerProbe / 2.0,
      s"sized-nBits candidates/probe not flat: $basePerProbe -> $sizedPerProbe")
    // and the sizing actually engaged: the 4x corpus got more bits
    assert(sized(corpus4) > sized(corpus1))
  }

  test("incremental multi-probe: candidate superset, top-1 sims never degrade, same stores") {
    // the x51 policy applied to the persisted-store path: Hamming-1
    // probe expansion can only ADD candidates (exact bucket = flip 0),
    // so the candidate set is a strict superset on any non-degenerate
    // fixture and every probe's best-found neighbor is at least as good
    val dir = "/root/testdata/sf0.01"
    val cs = IncrementalAnn.candidateIds(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    val cm = IncrementalAnn.candidateIds(spark, dir, multiProbe = true)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(cs.subsetOf(cm), s"multi-probe dropped candidates: ${(cs -- cm).take(3)}")
    assert(cm.size > cs.size, "multi-probe added no candidates — flips not engaging")
    def top1(multiProbe: Boolean): Map[Long, Double] =
      IncrementalAnn.incrementalTopK(spark, dir, multiProbe = multiProbe)
        .filter(col("rank") === 1)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val s1 = top1(multiProbe = false)
    val m1 = top1(multiProbe = true)
    s1.foreach { case (p, sim) =>
      assert(m1.getOrElse(p, Double.NegativeInfinity) >= sim - 1e-9,
        s"probe $p: multi-probe top-1 ${m1.get(p)} below single-probe $sim")
    }
  }

  test("re-sizing nBits for a dir retires its old bucket store (sweep, not leak)") {
    val dirKPath = java.nio.file.Files.createTempDirectory("graft_annsizing_sweep")
    var live = Seq.empty[String]
    try {
      Tables.load(spark, sf, "embeddings")
        .write.mode("overwrite").parquet(s"$dirKPath/embeddings.parquet")
      val s1 = IncrementalAnn.bucketStore(spark, dirKPath.toString, 4, 4)
      val s2 = IncrementalAnn.bucketStore(spark, dirKPath.toString, 6, 4)
      live = Seq(s2, IncrementalAnn.vectorStore(spark, dirKPath.toString))
      assert(s1 != s2, "different geometries must get different store tags")
      assert(!spark.catalog.tableExists(s1), "old-geometry store table must be swept")
      assert(spark.catalog.tableExists(s2))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_bucketed", s1)),
        "old-geometry store files must be swept")
    } finally {
      live.foreach { tbl =>
        spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
        graft.sources.LayoutCache.deleteTree(java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft_bucketed", tbl))
      }
      graft.sources.LayoutCache.deleteTree(dirKPath)
    }
  }

  test("clustered fixture plants a real neighbor graph and IVFADC recovers it") {
    import graft.operators.ProductQuantization
    val emb = Tables.load(spark, sf, "embeddings")
    val fix = ProductQuantization.clusteredFixture(emb).localCheckpoint()
    // 25 centers (vec_id % 20 = 0 over 500 dominant-dim vectors) x 20
    // members; held-out rule picks members {7, 17} of every cluster
    assert(fix.count() === 25L * ProductQuantization.ClusterMembers)
    val exact = ProductQuantization.exactTopK(fix, topK = 10).localCheckpoint()
    assert(exact.count() === 500L) // 50 queries x 10
    // the PLANTED structure: every exact top-10 neighbor of every query
    // is a cluster sibling — within-cluster distances (<= ~0.34|v|) never
    // lose to cross-cluster ones (~|v| for near-orthogonal centers).
    // This is what makes recall on this fixture meaningful: the truth
    // set is structural, not a concentration artifact.
    assert(exact.filter(expr("q_id div 1000 <> c_id div 1000")).count() === 0L)
    // IVFADC at the ledger geometry, decomposed into its THREE stages:
    // the coarse PROBE CEILING (neighbors whose home list is visited at
    // all) must be near-lossless — routing works on structure. ADC-only
    // recall@10 saturates at ~0.66 at BOTH K=16 and K=256 (measured,
    // ScaleStudy pqrecall): 99% of its hits land in the RIGHT cluster,
    // but no practical code size resolves the ε-graded ordering BETWEEN
    // siblings — which is why production IVFADC ships with exact
    // re-ranking (x114): the 4·topK ADC shortlist re-ranked by exact
    // fixed-point distance must recover recall to ~the ceiling.
    // The isotropic fixture could measure none of this (bulk recall
    // ~0.10 against a ~0.45 ceiling said nothing).
    val ceiling = exact.join(ProductQuantization.candidates(fix),
      Seq("q_id", "c_id"), "left_semi").count() / 500.0
    assert(ceiling >= 0.95, s"coarse probe ceiling on structured neighbors was $ceiling")
    val got = ProductQuantization.adcTopK(fix, topK = 10)
      .select("q_id", "c_id").localCheckpoint()
    val recall = exact.join(got, Seq("q_id", "c_id"), "left_semi").count() / 500.0
    assert(recall >= 0.55, s"IVFADC recall@10 on structured neighbors was $recall")
    val gotR = ProductQuantization.adcRerankTopK(fix, topK = 10)
      .select("q_id", "c_id").localCheckpoint()
    val recallR = exact.join(gotR, Seq("q_id", "c_id"), "left_semi").count() / 500.0
    assert(recallR >= 0.90, s"re-ranked IVFADC recall@10 was $recallR (ceiling $ceiling)")
    assert(recallR >= ceiling - 0.05,
      s"re-rank must recover to ~the probe ceiling: recall $recallR vs ceiling $ceiling")
  }
}
