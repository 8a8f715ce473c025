package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** x92: Bloom-filter semi-join pruning — the runtime-filter technique a
  * 100-TB join actually runs on (Bloom 1970; Spark's own
  * InjectRuntimeFilter / `bloom_filter_agg` is the cost-based built-in
  * analogue). A selective build side is folded into a FIXED-size bitmap
  * (2¹⁸ bits = 4096 longs here) that broadcasts at the same cost no
  * matter how many keys the build side holds — unlike a broadcast hash
  * join, whose table grows with the build cardinality and eventually
  * can't broadcast at all. The big side probes the bitmap BEFORE its
  * shuffle, so rows that cannot match never enter the exchange; false
  * positives (bounded by the classic (1-e^{-kn/m})^k rate) are
  * eliminated by the exact join that follows, and false negatives are
  * impossible by construction — the pruned join is spec-pinned equal to
  * the unpruned one.
  *
  * Determinism: Spark's built-in bloom_filter_agg seeds XXH64 with an
  * engine-internal layout, so its bit pattern can't be replayed
  * elsewhere. Here the k=3 positions derive from md5 (h1/h2 = two
  * 15-hex-digit halves, Kirsch–Mitzenmacher double hashing
  * p_i = (h1 + i·h2) mod m) — pure integer arithmetic both engines
  * compute identically, so even the APPROXIMATION is oracled: the
  * ledger row's false-positive counts hash-gate against a DuckDB
  * replay of the same positions.
  *
  * Plan shape: bitmap build is one explode(3)+bit_or aggregate over the
  * (small) build side, densified to a 4096-long array in a 1-row
  * relation; the probe is a broadcast cross join of that single row plus
  * integer expressions (element_at / shiftright) that stay inside
  * whole-stage codegen — no UDF, no per-row map lookup scan.
  */
object BloomJoin {

  val Bits = 262144L // 2^18
  val Words: Int = (Bits / 64L).toInt
  val Probes = 3

  private def digest(key: Column): Column =
    md5(concat(lit("bf:"), key.cast("string")))

  // two independent 60-bit hashes from one md5; h1 + 2·h2 < 2^62, so the
  // Kirsch–Mitzenmacher combination never overflows under ANSI mode
  private def h1(key: Column): Column =
    conv(substring(digest(key), 1, 15), 16, 10).cast("long")
  private def h2(key: Column): Column =
    conv(substring(digest(key), 17, 15), 16, 10).cast("long")

  private def position(key: Column, i: Int): Column =
    pmod(h1(key) + lit(i.toLong) * h2(key), lit(Bits))

  /** One-row relation carrying the dense bitmap (`bf`: array of
    * [[Words]] longs) over `keyCol` of `keys`. Fixed size regardless of
    * |keys| — the broadcast-safety contract.
    */
  def buildBitmap(keys: DataFrame, keyCol: String): DataFrame = {
    val pos = keys.select(explode(array(
      (0 until Probes).map(i => position(col(keyCol), i)): _*)).as("p"))
    val words = pos
      .select(expr("cast(p div 64 as int)").as("w"), expr("cast(p % 64 as int)").as("b"))
      .groupBy(col("w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), b))").as("bits"))
    words
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("m"))
      .select(expr(s"transform(sequence(0, ${Words - 1}), " +
        "wi -> coalesce(element_at(m, wi), cast(0 as bigint)))").as("bf"))
  }

  /** Probe predicate against a `bf` column in scope, from PRE-COMPUTED
    * h1/h2 columns: each of the [[Probes]] positions is a cheap integer
    * combination of the two hashes. Callers project the hashes ONCE per
    * row ([[withProbeHashes]]) — building the predicate directly over
    * `position(key, i)` would instantiate the md5 digest 2·[[Probes]]
    * times per probed row and lean entirely on codegen subexpression
    * elimination to deduplicate it.
    */
  private def mightContainFrom(h1v: Column, h2v: Column): Column =
    (0 until Probes).map { i =>
      val p = pmod(h1v + lit(i.toLong) * h2v, lit(Bits))
      val word = element_at(col("bf"), floor(p / 64).cast("int") + 1)
      val bit = pmod(p, lit(64L)).cast("int")
      (call_function("shiftright", word, bit).bitwiseAND(lit(1L))) === 1L
    }.reduce(_ && _)

  /** Projects `_h1`/`_h2` for `key` — one md5 per row, kept as real
    * columns so the downstream multi-use cannot re-expand the digest
    * (CollapseProject keeps non-cheap multi-referenced aliases).
    */
  private def withProbeHashes(df: DataFrame, key: Column): DataFrame =
    df.withColumn("_h1", h1(key)).withColumn("_h2", h2(key))

  /** The production path: `fact` rows whose `factKey` survives the
    * bitmap, then the exact left-semi join that removes the false
    * positives. Result is IDENTICAL to the plain semi join (zero false
    * negatives by construction) — the bitmap only cuts what the
    * exchange has to carry.
    */
  def prunedSemiJoin(fact: DataFrame, factKey: String,
                     build: DataFrame, buildKey: String): DataFrame = {
    val bf = buildBitmap(build, buildKey)
    withProbeHashes(fact.crossJoin(broadcast(bf)), col(factKey))
      .filter(mightContainFrom(col("_h1"), col("_h2")))
      .drop("bf", "_h1", "_h2")
      .join(build.select(col(buildKey).as("_bk")).distinct(),
        col(factKey) === col("_bk"), "left_semi")
  }

  /** The x92 ledger row: per-returnflag accounting of the bitmap built
    * from urgent orders and probed by every lineitem — total rows, bloom
    * passes, exact matches, FALSE POSITIVES (pass minus match — the
    * approximation itself, value-gated), and the exact matched quantity
    * sum (integral doubles summed as bigint).
    */
  def filterAccounting(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val build = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bf = buildBitmap(build, "o_orderkey")
    val flags = build.select(col("o_orderkey").as("bk"), lit(true).as("is_match"))
    withProbeHashes(lineitem.crossJoin(broadcast(bf)), col("l_orderkey"))
      .withColumn("bloom_pass", mightContainFrom(col("_h1"), col("_h2")))
      .drop("_h1", "_h2")
      .join(flags, col("l_orderkey") === col("bk"), "left")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("bloom_pass") && col("is_match").isNull, 1L).otherwise(0L))
          .as("n_false_pos"),
        sum(when(col("is_match"), col("l_quantity").cast("bigint")).otherwise(0L))
          .as("sum_qty_matched"))
      .orderBy(col("l_returnflag"))
  }
}
