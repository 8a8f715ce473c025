package graft.operators

import graft.CkptOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** x82: triangle counting over the part co-purchase graph — the
  * clustering-structure primitive of corpus/graph analytics (community
  * density, spam-ring detection, graph-quality audits), done with the
  * degree-ordered orientation of the node-iterator family (Schank &
  * Wagner's forward algorithm; Suri & Vassilvitskii's MapReduce
  * adaptation): orient every undirected edge from its lower-(degree, id)
  * endpoint to the higher one, enumerate wedges only at each triangle's
  * MINIMUM-rank vertex, and close them with a join against the oriented
  * edge set.
  *
  * Why the orientation matters at 100 TB: the naive wedge join pays
  * Σ_v C(d(v), 2) — a single celebrity hub with 10⁷ neighbors
  * contributes 5·10¹³ wedges and the job never finishes. Orientation
  * caps every out-degree at O(√m), so wedge work is bounded by
  * O(m^1.5) TOTAL and is hub-proof — the difference between a plan
  * that survives a power-law graph and one that dies on its first hot
  * key. Every stage is joins + map-side-combined aggregates on keyed
  * shuffles; the triangle SET is orientation-invariant, so the DuckDB
  * oracle replays it with plain id-ordering and must match exactly —
  * count per node and in total.
  */
object Triangles {

  /** Top-`k` nodes by triangle participation, with the global triangle
    * count riding every row (broadcast 1-row join — the q29/x8 class).
    */
  def topTriangleNodes(li: DataFrame, k: Int = 20): DataFrame = {
    // undirected simple edges, one row per {a < b} pair
    val e = PageRank.coPurchaseEdges(li)
      .filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .ckpt() // read three times below (degrees + two wedge sides)
    val deg = e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // rank(v) = (d, v) lexicographic; orient u -> v iff rank(u) < rank(v)
    val oriented = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
          .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"), col("o.dv").as("dv"))
      .ckpt() // the wedge self-join reads it twice, the closer once
    // wedges at the minimum-rank vertex: (u -> y), (u -> z), rank(y) < rank(z)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dv") < col("e2.dv") ||
            (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    // a wedge closes iff the oriented edge y -> z exists (rank(y) < rank(z)
    // holds by construction, so the closing edge can only be oriented this way)
    val tris = wedges.join(
      oriented.select(col("u").as("y"), col("v").as("z")), Seq("y", "z"), "left_semi")
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      .ckpt() // tiny (nodes-in-triangles); read for top-k AND total
    val total = perNode
      .agg((sum(col("n_tri")) / 3).cast("bigint").as("total_triangles"))
    perNode.crossJoin(broadcast(total))
      .orderBy(col("n_tri").desc, col("node"))
      .limit(k)
      .select(col("node").as("l_partkey"), col("n_tri"), col("total_triangles"))
  }
}
