package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators for LLM training-data pipelines.
  *
  * All of these are pure columnar compositions (no UDFs) so they stay inside
  * whole-stage codegen and scale by partitioning:
  *
  *  - exact dedup: one hash-aggregate (map-side partial + final);
  *  - MinHash+LSH near-dup: shingles → k minhashes → banded signatures →
  *    bucket self-join (shuffle on (band, signature), never all-pairs) →
  *    exact-Jaccard verification of candidates only;
  *  - SimHash: 64-bit sign-of-sums fingerprint, computed with
  *    `aggregate`/`zip_with` over the token array.
  *
  * At 100 TB the all-pairs check is impossible (O(n²)); the LSH bucket join
  * keeps the shuffle proportional to Σ bucket² which stays near-linear for
  * reasonable band/row settings (b=8, r=4 here targets J ≈ 0.8 pairs).
  */
object Dedup {

  /** Character n-gram shingle set of `col` as a sorted distinct array. */
  def shingles(colName: String, n: Int): Column = expr(
    s"""array_sort(array_distinct(CASE WHEN length($colName) < $n THEN array()
        ELSE transform(sequence(1, length($colName) - ${n - 1}), i -> substring($colName, i, $n)) END))""")

  /** Exact-duplicate summary over the full text: one row of corpus stats. */
  def exactDupStats(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_unique"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup_docs"))

  /** Normalization-key dedup: groups sharing the same first-40-chars key
    * (a cheap canonicalization; the synthetic corpus has no full-text dups
    * but does collide on prefixes). Emits only groups with > 1 member.
    */
  def normalizedDupGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(substring(col("text"), 1, 40)).as("norm_key"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_doc_id"),
        sum(col("n_chars")).as("total_chars"))
      .filter(col("n_docs") > 1)
      .orderBy("norm_key")

  /** Exact n-gram Jaccard similarity for every pair in a deterministic
    * doc_id-modulo subset (the all-pairs oracle-checkable baseline; the LSH
    * path below is the scale path). |A∩B| / (|A|+|B|−|A∩B|) on distinct
    * trigram sets.
    */
  def ngramJaccardPairs(docs: DataFrame, mod: Int, threshold: Double): DataFrame = {
    val d = docs
      .filter(col("doc_id") % mod === 0)
      .select(col("doc_id"), shingles("text", 3).as("sh"))
    val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash + banded LSH near-duplicate candidate generation + exact
    * verification. numPerms minhashes from one base 64-bit hash via
    * (a_i·h + b_i) mod p; bands of `rowsPerBand` hashed into bucket
    * signatures; docs sharing any (band, signature) bucket become
    * candidates; candidates verified with exact Jaccard >= threshold.
    */
  def minhashLshPairs(docs: DataFrame, numPerms: Int = 32, rowsPerBand: Int = 4,
                      threshold: Double = 0.6): DataFrame = {
    require(numPerms % rowsPerBand == 0)
    val numBands = numPerms / rowsPerBand
    // 2^31-1 (Mersenne prime): keeps a*h+b within Long range under ANSI
    // overflow checking (a,h < 2^31 so the product is < 2^62).
    val p = 2147483647L
    // Deterministic "random" coefficients derived from the perm index.
    def coef(seed: Long, i: Int): Long = {
      var x = seed + 0x9E3779B97F4A7C15L * (i + 1)
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      math.abs(x ^ (x >>> 31)) % (p - 1) + 1
    }
    val withShingles = docs.select(col("doc_id"),
      expr("transform(array_sort(array_distinct(CASE WHEN length(text) < 3 THEN array() " +
        "ELSE transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)) END)), s -> xxhash64(s))")
        .as("hashes"))
      .filter(size(col("hashes")) > 0)
    val minhashCols = (0 until numPerms).map { i =>
      val a = coef(42L, i); val b = coef(4242L, i)
      // pmod keeps the permuted hash non-negative; array_min = the minhash.
      expr(s"array_min(transform(hashes, h -> pmod($a * pmod(h, ${p}L) + $b, ${p}L)))").as(s"mh_$i")
    }
    val sigs = withShingles.select(col("doc_id") +: minhashCols: _*)
    val bandCols = (0 until numBands).map { bnd =>
      val cols = (0 until rowsPerBand).map(r => s"mh_${bnd * rowsPerBand + r}").mkString(", ")
      expr(s"named_struct('band', $bnd, 'sig', xxhash64($cols))")
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.sig").as("sig"))
    val candidates = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // Exact verification of the (small) candidate set only.
    val sh = docs.select(col("doc_id"), shingles("text", 3).as("sh"))
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash per document over whitespace tokens, plus its 4 16-bit
    * bands (for banded Hamming-neighbor lookup à la Manku et al.). Fully
    * columnar: per-token bit vectors via shiftright/bitwise-and, summed with
    * `aggregate`+`zip_with`, sign-collapsed back into one BIGINT.
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr("""
        aggregate(
          transform(sequence(0, 63),
            j -> named_struct('j', j, 's', aggregate(split(text, '\\s+'), 0L,
              (acc, t) -> acc + CASE WHEN (shiftright(xxhash64(t), CAST(j AS int)) & 1) = 1 THEN 1 ELSE -1 END))),
          0L,
          (fp, e) -> fp | CASE WHEN e.s > 0 THEN shiftleft(1L, CAST(e.j AS int)) ELSE 0L END)
      """).as("simhash64"))
      .withColumn("band0", expr("shiftright(simhash64, 48) & 65535"))
      .withColumn("band1", expr("shiftright(simhash64, 32) & 65535"))
      .withColumn("band2", expr("shiftright(simhash64, 16) & 65535"))
      .withColumn("band3", expr("simhash64 & 65535"))
      .orderBy("doc_id")
}
