package graft.operators

import graft.CkptOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** x75: PageRank over the part co-purchase graph, in INTEGER-SCALED
  * fixed-point arithmetic — the deterministic formulation a distributed
  * engine actually wants. Textbook PageRank accumulates doubles across
  * in-edges, so the result depends on partition boundaries and
  * reduction order: a 1000-executor run gives a different last bit
  * every time, which poisons downstream rank cut-offs AND can never
  * hash-match an oracle. Here ranks are integers at SCALE = 10^6; each
  * edge contribution floors BEFORE the sum (`r·w DIV W_u`), sums are
  * exact integer addition (commutative, order-free), and the damping
  * step is integer arithmetic (`150000 + 85·Σ DIV 100`) — every
  * iteration is bit-reproducible under ANY physical execution, and the
  * DuckDB oracle replays all ten iterations exactly.
  *
  * Scale shape: one distinct-projection + self-join builds the edge
  * relation (Σ C(lines-per-order, 2) pairs — bounded by order width,
  * never corpus²); each iteration is ONE join (ranks ⋈ edges on src,
  * both sides hash-partitioned on the same key) + ONE aggregate on dst
  * with map-side combine — the Pregel step. Lineage truncates per
  * iteration (`graft.ckpt`, the x18 label-propagation pattern), so
  * ten iterations cost ten bounded shuffles, not an exponential plan.
  */
object PageRank {

  val Scale = 1000000L

  /** Undirected co-purchase edges with multiplicity: (src, dst, w) both
    * directions, w = number of orders containing both parts.
    */
  private[graft] def coPurchaseEdges(li: DataFrame): DataFrame = {
    // One groupBy collects each order's distinct parts (sorted), then the
    // C(width, 2) pairs explode map-side — TWO exchanges total (group by
    // order, group by pair) where the old distinct + self-join + aggregate
    // paid FOUR (r21, guide §2.4). Pair volume is unchanged (bounded by
    // order width), and sort_array + i<j slicing reproduces the a.pk<b.pk
    // pair set exactly, so w per (pa, pb) is bit-identical.
    val pairs = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("ps"))
      // spread the per-order sets before the C(width,2) pair explode:
      // AQE coalesces the order aggregate's ~5 MB exchange to a handful
      // of partitions, and the explode's CPU (4.6 s task time in the r22
      // stage profile) then ran on 4 tasks — small bytes ≠ small CPU
      // (guide §2.5). One extra bounded exchange buys a 32-wide explode
      // and map-side pair combine.
      .repartition(graft.spreadWidth(li.sparkSession), col("ok"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS pa, y AS pb))))"))
        .as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("w"))
    pairs.select(col("pa").as("src"), col("pb").as("dst"), col("w"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst"), col("w")))
  }

  /** Ten fixed-point iterations; top-`k` nodes by (rank desc, node). */
  def topRanks(li: DataFrame, iterations: Int = 10, k: Int = 20): DataFrame = {
    // Iteration layout, measured both ways in r21: the layout-visible
    // variant (graft.ckptBy on withOut — exchange-free contribution join,
    // only the per-round aggregate output moves) profiled 7.1-7.3 s here,
    // while this exchange-per-round form profiles 6.4-6.5 s on local[32]:
    // with AQE coalescing the two fresh exchanges to ~13 balanced
    // partitions, the re-exchange of the ~16 MB edge relation is cheaper
    // than the fixed-width LogicalRDD-direct join stages it avoids. On a
    // real cluster the tradeoff flips with network cost — swap the line
    // below to `.ckptBy(par, "src")` to make the layout visible and drop
    // the per-iteration edge shuffle entirely (x82 keeps ckptBy because
    // it wins there even locally). The shuffle_hash hint replaces the
    // default sort-merge: ranks is the node-rank table, hashing it beats
    // re-sorting the edge side every iteration.
    val edges = coPurchaseEdges(li).ckpt()
    // per-source total outgoing weight (the division base of every
    // contribution this source sends)
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val withOut = edges.join(outW, "src")
      .repartition(graft.spreadWidth(li.sparkSession), col("src")).ckpt()
    // the node universe is ITERATION-INVARIANT (always outW's key set) —
    // materialized once, so each round's rank rebuild consumes only the
    // previous round's ranks through the contribution join (ONE consumer
    // per round), which is what makes the k=2 ckpt cadence below safe:
    // an un-ckpt'd odd round is evaluated exactly once inside the even
    // round's materialization, never twice. (The old form re-derived the
    // node list from `ranks` itself — a second consumer per round that
    // forced a ckpt every round.)
    val nodes = outW.select(col("src").as("node")).ckpt()
    var ranks = nodes.select(col("node"), lit(Scale).as("r")).ckpt()
    // AQE stays ON for the loop: an AQE-off variant (skip the ×10
    // replanning) was A/B'd at 8.6-10.0 s vs 6.3 s — the fixed 32-wide
    // exchanges it forces cost far more than the per-round replanning
    // AQE spends coalescing them to ~13 balanced partitions.
    for (i <- 1 to iterations) {
      val contrib = withOut
        .join(ranks.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst"), expr("CAST(r * w DIV wout AS BIGINT)").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contrib.hint("shuffle_hash"), col("node") === col("dst"), "left")
        .select(col("node"),
          expr("CAST(150000 + 85 * coalesce(s, 0) DIV 100 AS BIGINT)").as("r"))
      // lineage truncates every SECOND round (plan depth stays bounded at
      // two join+agg layers): ten eager materializations were five, and
      // the skipped rounds' plans fold into the next ckpt's single pass —
      // A/B'd at 5-rep profile: 6.4 → 5.7 s with the spread explode above
      ranks = if (i % 2 == 0 || i == iterations) next.ckpt() else next
    }
    ranks.orderBy(col("r").desc, col("node")).limit(k)
      .select(col("node").as("l_partkey"), col("r").as("rank_scaled"))
  }
}
