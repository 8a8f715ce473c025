package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** Key-aware k× expansion of a driver fixture tree — the substrate for
  * the once-per-round FULL-LEDGER sweep at 10× the standing gate (the
  * r10 q32 lesson generalized: some defects only show at one scale, so
  * the gate should run at one more).
  *
  * Replication is REPLICA-DISJOINT and preserves every structural
  * property the queries and oracles rely on:
  *
  *  - every key and foreign key maps `id → id·k + r`, so uniqueness
  *    (`o_orderkey`) and join fan-in/fan-out replicate exactly — replica
  *    r of lineitem joins replica r of orders/part/supplier and nothing
  *    else;
  *  - dimension tables (region, nation) stay fixed — the TPC-H scaling
  *    rule: facts grow, dims don't (every replica's customers reference
  *    the same 25 nations);
  *  - documents translate their text through a per-replica alphabet
  *    rotation (disjoint shingle/vocab spaces — dedup and LSH rows keep
  *    their per-replica pair structure instead of collapsing every
  *    replica into one dup cluster); lengths are preserved so `n_chars`
  *    stays truthful;
  *  - embeddings rotate components per replica (disjoint vector spaces,
  *    same norms/distances within a replica);
  *  - events keep their time range but get replica-disjoint users —
  *    streaming state and sessionization scale by population, not by
  *    per-key depth;
  *  - all timestamp columns are written as parquet `timestamp[us]`
  *    (isAdjustedToUTC=false), the driver fixture's own encoding, so
  *    DuckDB reads the tree exactly like the originals (session tz is
  *    UTC everywhere — the cast is wall-clock-lossless);
  *  - one parquet FILE per table (`<dst>/<name>.parquet`), the layout
  *    `Tables.load` and the oracle gate's DuckDB views both expect.
  *
  * Usage: `runMain graft.GenScaleTree <srcDir> <dstDir> <k>`.
  */
object GenScaleTree {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase(java.util.Locale.ROOT)
  private val Digits = "0123456789"

  private def rot(s: String, r: Int): String = {
    val n = ((r % s.length) + s.length) % s.length
    s.substring(n) + s.substring(0, n)
  }

  /** Per-replica embedding rotation amount, pairwise distinct for
    * r ∈ 1..dim-1. The step must be COPRIME with dim-1 or rotations
    * repeat with period (dim-1)/gcd — the first cut's fixed step 7 had
    * gcd(7, 63) = 7 at dim 64, so replicas r and r+9 beyond k=10 would
    * have collided into exact duplicate vector sets (r16 ADVICE),
    * silently breaking the replica-disjoint property dedup/ANN pair
    * structure rides on. `r·step mod (dim-1)` is a bijection on
    * 0..dim-2 under coprimality and lands in 1..dim-2 for r ≥ 1, so
    * every replica's rotation is distinct and never the identity.
    */
  private[graft] def rotationOf(r: Int, dim: Int): Int = {
    val m = dim - 1
    val step = (7 to 7 + m).find(s => BigInt(s).gcd(BigInt(m)) == 1).getOrElse(1)
    1 + ((((r * step - 1) % m) + m) % m)
  }

  /** `id → id·k + r` as a Column, type-preserving for long keys. */
  private def key(c: String, k: Int, r: Int) =
    (col(c) * k + lit(r)).as(c)

  private def replicate(base: DataFrame, k: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(r => f(base, r)).reduce(_ unionByName _)

  def expandTable(spark: SparkSession, src: String, name: String, k: Int): DataFrame = {
    val t = Tables.load(spark, src, name)
    name match {
      case "region" | "nation" => t // dims: fixed at every scale
      case "customer" => replicate(t, k)((d, r) =>
        d.select(key("c_custkey", k, r), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment")))
      case "supplier" => replicate(t, k)((d, r) =>
        d.select(key("s_suppkey", k, r), col("s_name"), col("s_nationkey"),
          col("s_acctbal")))
      case "part" => replicate(t, k)((d, r) =>
        d.select(key("p_partkey", k, r), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"), col("p_retailprice")))
      case "orders" => replicate(t, k)((d, r) =>
        d.select(key("o_orderkey", k, r), key("o_custkey", k, r),
          col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
          col("o_orderpriority")))
      case "lineitem" => replicate(t, k)((d, r) =>
        d.select(key("l_orderkey", k, r), key("l_partkey", k, r),
          key("l_suppkey", k, r), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate").cast("timestamp_ntz").as("l_shipdate")))
      case "events" => replicate(t, k)((d, r) =>
        d.select(key("event_id", k, r),
          col("ts").cast("timestamp_ntz").as("ts"),
          key("user_id", k, r), col("event_type"), col("value"), col("props")))
      case "documents" => replicate(t, k)((d, r) =>
        d.select(key("doc_id", k, r),
          (if (r == 0) col("text")
           else translate(col("text"),
             Lower + Upper + Digits, rot(Lower, r) + rot(Upper, r) + rot(Digits, r)))
            .as("text"),
          col("lang"), col("source"), col("n_chars")))
      case "embeddings" =>
        val dim = t.select(min(size(col("embedding")))).head().getInt(0)
        require(dim < 2 || k <= dim - 1,
          s"embeddings support at most dim-1 = ${dim - 1} replica-disjoint rotations; k=$k")
        replicate(t, k) { (d, r) =>
          val rt = if (r == 0 || dim < 2) 0 else rotationOf(r, dim)
          d.select(key("vec_id", k, r),
            (if (rt == 0) col("embedding")
             else expr(s"concat(slice(embedding, ${rt + 1}, size(embedding) - $rt), " +
               s"slice(embedding, 1, $rt))")).as("embedding"),
            col("label"))
        }
      case other => sys.error(s"unknown table $other")
    }
  }

  /** Write `df` as the single parquet FILE `<dst>/<name>.parquet`. */
  private def writeSingleFile(df: DataFrame, dst: Path, name: String): Unit = {
    val tmp = dst.resolve(s"_tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part =
      try listing.filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      finally listing.close()
    Files.move(part, dst.resolve(s"$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val rest = Files.walk(tmp)
    try rest.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
    finally rest.close()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GenScaleTree <srcDir> <dstDir> <k>")
    val (src, dstDir, k) = (args(0), args(1), args(2).toInt)
    require(k >= 1, "k must be >= 1")
    val spark = BenchHarness.session("graft-gen-scale-tree")
    val dst = Paths.get(dstDir)
    Files.createDirectories(dst)
    Tables.names.foreach { name =>
      val df = expandTable(spark, src, name, k)
      writeSingleFile(df, dst, name)
      println(s"[gen-scale-tree] $name: ${spark.read.parquet(s"$dstDir/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
