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
    // Hash-partition the iteration-INVARIANT join side by its join key
    // BEFORE the checkpoint (the x18 label-propagation pattern — ckpt
    // preserves outputPartitioning through LogicalRDD): without it, the
    // r21 stage profile showed the full 32 MB edge relation re-exchanged
    // in EVERY one of the ten iterations; with it, only the tiny rank
    // table moves per round (guide §2.4). The shuffle_hash hint replaces
    // the default sort-merge: ranks is the k-node table, hashing it beats
    // re-sorting the edge side every iteration.
    val par = li.sparkSession.sparkContext.defaultParallelism
    val edges = coPurchaseEdges(li).ckpt()
    // per-source total outgoing weight (the division base of every
    // contribution this source sends)
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val withOut = edges.join(outW, "src").repartition(par, col("src")).ckpt()
    var ranks = outW.select(col("src").as("node"), lit(Scale).as("r"))
      .repartition(par, col("node")).ckpt()
    for (_ <- 1 to iterations) {
      val contrib = withOut
        .join(ranks.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst"), expr("CAST(r * w DIV wout AS BIGINT)").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      ranks = ranks.select(col("node"))
        .join(contrib.hint("shuffle_hash"), col("node") === col("dst"), "left")
        .select(col("node"),
          expr("CAST(150000 + 85 * coalesce(s, 0) DIV 100 AS BIGINT)").as("r"))
        .ckpt() // left join preserves Hash(node, par) — no re-exchange
    }
    ranks.orderBy(col("r").desc, col("node")).limit(k)
      .select(col("node").as("l_partkey"), col("r").as("rank_scaled"))
  }
}
