package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial mega-bucket guarantees for the banded-LSH candidate stage:
  * a degenerate signature shared by (nearly) the whole corpus — identical
  * boilerplate, template families — must produce star edges through a
  * spill-safe plan whose only materialized membership arrays are
  * ≤ maxBucket elements. The r5 shape collected the FULL bucket membership
  * into one aggregation row before applying the cap: one multi-GB row at
  * 100 TB. The window rewrite this spec pins keeps per-row state bounded
  * (size/hub via Window — spillable — and collect_list only BELOW the
  * n <= maxBucket filter).
  */
class BucketBoundSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val MaxBucket = 4

  /** 500 identical docs (one signature in every band) + one 2-doc group. */
  private def adversarialDocs = {
    val boiler = (0L until 500L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val pairDocs = Seq(
      (1000L, "an entirely different small document about spark physical plans"),
      (1001L, "an entirely different small document about spark physical plans"))
    (boiler ++ pairDocs).toDF("doc_id", "text")
  }

  test("mega-bucket emits exactly the hub star edges; small bucket emits its pair") {
    val cands = Dedup.minhashLshCandidates(adversarialDocs, maxBucket = MaxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedStars = (1L until 500L).map(i => (0L, i)).toSet
    assert(cands == expectedStars + ((1000L, 1001L)),
      s"wrong candidate set: missing=${(expectedStars -- cands).take(5)}, " +
        s"extra=${(cands -- expectedStars - ((1000L, 1001L))).take(5)}")
  }

  test("star edges survive exact verification (identical docs: jaccard 1.0)") {
    val pairs = Dedup.minhashLshPairs(adversarialDocs, maxBucket = MaxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 500)
    assert(pairs.forall(_._3 == 1.0))
  }

  test("plan shape: membership arrays only below the maxBucket filter, sizes via Window") {
    val plan = Dedup.minhashLshCandidates(adversarialDocs, maxBucket = MaxBucket)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"bucket sizing must come from a spillable Window:\n$plan")
    // the only collect_list sits in the small-bucket branch, whose input
    // is filtered to n <= MaxBucket — the structural bound on array size
    assert(plan.contains("collect_list"), plan)
    assert(plan.contains(s"<= $MaxBucket"),
      s"collect_list input not visibly capped at $MaxBucket:\n$plan")
  }

  test("unchanged pair output on the real fixture (window rewrite is a pure re-plan)") {
    // sf0.001: the committed value-pinned behavior — pair count and a
    // value spot-check stay what QueriesSpec/x4 gate pinned before the
    // rewrite (the driver's x4 row re-pins this at sf0.01 independently)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.minhashLshPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0.6 && p._3 <= 1.0))
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
  }

  test("x94 SNM hot key: every doc sharing one blocking key still yields <= (w-1)*n pairs") {
    // the adversarial case that kills HASH blocking (one n^2 bucket):
    // 400 docs whose 24-char blocking prefix is identical. SNM's window
    // bound does not care — candidates stay <= (w-1)*n, the total order
    // falls back to the doc_id tie-break, and the result equals the
    // brute-force windowed twin.
    val w = 8
    val hot = (0L until 400L).map { i =>
      (i, s"shared boilerplate heading marker alpha tail$i unique trailing words ${i * 7} end")
    }.toDF("doc_id", "text")
    val got = graft.operators.Dedup.snmPairs(hot, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.size <= (w - 1) * 400, s"window bound violated: ${got.size}")
    val prepped = hot.collect().map { r =>
      val t = r.getString(1).toLowerCase
      val ws = t.split("\\s+").filter(_.nonEmpty)
      (t.replaceAll("\\s+", "").take(24), r.getLong(0),
        ws.sliding(3).map(_.mkString(" ")).toSet)
    }.sortBy(p => (p._1, p._2))
    val expected = (for {
      i <- prepped.indices
      j <- (i + 1) until math.min(i + w, prepped.length)
      inter = (prepped(i)._3 & prepped(j)._3).size
      uni = prepped(i)._3.size + prepped(j)._3.size - inter
      if uni > 0 && 2 * inter >= uni
    } yield (prepped(i)._2, prepped(j)._2) -> (inter.toLong, uni.toLong)).toMap
    assert(got == expected)
  }
}
