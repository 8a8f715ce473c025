package graft.operators

import graft.CkptOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an `array<float>` embedding column.
  *
  * Cosine is computed with native array expressions
  * (`zip_with` product + `aggregate` fold) in double precision — no UDFs.
  *
  * Scale design: the brute-force path broadcasts the (small) probe set, so
  * the candidate side streams through executors with no shuffle at all; the
  * IVF path prunes candidates to the nearest partitions (centroid = the
  * `label` partition's mean vector), turning the scan into a partition-
  * pruned semi-join — the pattern that survives 100 TB while brute force
  * does not. The random-hyperplane LSH in [[Dedup.simhash]] style applies to
  * embeddings too via [[hyperplaneBucket]].
  */
object Similarity {

  /** Dot product of two double-array columns (left-to-right fold, so the
    * result is deterministic). Built-in-only fallback form.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the custom codegen'd expression (single fused loop; the
    * builtin `aggregate`/`zip_with` composition pays per-element lambda
    * dispatch). Callers must have run `ArrayExpressions.register`; all
    * operators here do.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.ArrayExpressions.cosineSim(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** (vec_id, v: array<double>) — the normalized frame every similarity
    * operator starts from.
    */
  private[operators] def vecFrame(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** Exact top-k cosine neighbors for each probe (vec_id < nProbes), over
    * the full candidate set. Probe side is broadcast; top-k via per-probe
    * window. Deterministic tie-break on cand_id.
    */
  def bruteForceTopK(emb: DataFrame, nProbes: Int, k: Int): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), asDouble(col("embedding")).as("pv"))
    val cands = emb.select(col("vec_id").as("cand_id"), asDouble(col("embedding")).as("cv"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    cands.join(broadcast(probes), col("probe_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("pv"), col("cv")))
      .filter(!isnan(col("sim"))) // zero-norm vectors: undefined cosine, drop
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"), round(col("sim"), 4).as("sim"), col("rank"))
      .orderBy("probe_id", "rank")
  }

  /** Exact top-k like [[bruteForceTopK]] but through the custom
    * bounded-heap aggregate ([[graft.functions.TopKByScore]]) instead of a
    * window sort: partial aggregation shrinks every map task's slice to k
    * rows per probe BEFORE the shuffle, so the exchange carries
    * k·probes·tasks rows instead of every scored candidate — the form
    * that survives a billion-candidate scan. Output is identical to
    * [[bruteForceTopK]] (same ordering and tie-breaks).
    */
  def aggTopK(emb: DataFrame, nProbes: Int, k: Int): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), asDouble(col("embedding")).as("pv"))
    val cands = emb.select(col("vec_id").as("cand_id"), asDouble(col("embedding")).as("cv"))
    cands.join(broadcast(probes), col("probe_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("pv"), col("cv")))
      .filter(!isnan(col("sim")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.ArrayExpressions.topKByScore(col("sim"), col("cand_id"), k).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("probe_id"), col("t.id").as("cand_id"),
        round(col("t.score"), 4).as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("probe_id", "rank")
  }

  /** Exact near-duplicate pairs (cosine >= threshold) within a
    * deterministic vec_id-modulo subset — the oracle-checkable baseline for
    * the LSH/IVF scale paths.
    */
  def nearDupPairs(emb: DataFrame, mod: Int, threshold: Double): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    val d = emb.filter(col("vec_id") % mod === 0)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = d.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = d.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(!isnan(col("sim")) && col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Int8 scalar quantization of the embedding column: per-vector scale =
    * max|v|/127, elements rounded to [-127, 127]. Returns per-label
    * round-trip quality stats (mean squared reconstruction error and cosine
    * drift against the original) — the storage-versus-recall calibration a
    * pipeline runs before switching its index to int8 (4x smaller, and the
    * dot-product kernels get SIMD-friendly).
    */
  def quantizationStats(emb: DataFrame): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    val withQ = emb
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("scale", expr("aggregate(v, 0d, (m, x) -> greatest(m, abs(x))) / 127d"))
      .filter(col("scale") > 0)
      .withColumn("q", expr("transform(v, x -> CAST(round(x / scale) AS tinyint))"))
      .withColumn("deq", expr("transform(q, x -> CAST(x AS double) * scale)"))
    withQ
      .withColumn("mse", expr(
        "aggregate(zip_with(v, deq, (a, b) -> (a - b) * (a - b)), 0d, (acc, x) -> acc + x) / size(v)"))
      .withColumn("cos_drift", lit(1.0) - cosine(col("v"), col("deq")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("mse")), 12).as("avg_mse"),
        round(avg(col("cos_drift")), 12).as("avg_cos_drift"))
      .orderBy("label")
  }

  /** Random-hyperplane bucket id (nBits-bit SimHash of the vector): sign of
    * the dot product against nBits deterministic pseudo-random hyperplanes,
    * via the fused [[graft.functions.ArrayExpressions.HyperplaneBucket]]
    * codegen kernel — ONE plan node at any dimensionality (the per-dim
    * Column formulation built dim × nBits nodes: a 100k-node plan at
    * production embedding dims). A vector whose size differs from `dim`
    * gets a NULL bucket (drop-don't-fail); equi-joins on the bucket drop
    * NULLs automatically, and a groupBy-bucket candidate generator must
    * `.filter(bucket.isNotNull)` first, or every ragged vector lands in
    * one shared null group and they all become mutual candidates.
    */
  def hyperplaneBucket(v: Column, dim: Int, nBits: Int): Column =
    when(size(v) === dim, graft.functions.ArrayExpressions.hyperplaneBucket(v, nBits))

  /** Occupancy-constant LSH sizing: the nBits that holds expected
    * per-(table, bucket) occupancy at ~`targetOccupancy` for a given
    * corpus size — `round(log2(corpus / targetOccupancy))`, floored at 1
    * and capped so a signature slice still fits the caller's table count
    * (`nBits · nTables ≤ 64`, [[tableBuckets]]'s invariant).
    *
    * With nBits FIXED, per-bucket occupancy — and therefore per-probe
    * candidate sets and batch cost — grows linearly with the corpus (the
    * x49 scale study records exactly that). Production sizing holds
    * occupancy (and with it the recall/cost point) constant by growing
    * the bucket space with the corpus: +1 bit per corpus doubling. The
    * fixed-parameter x48/x49 ledger oracles deliberately do NOT use this
    * (their replayed-SQL oracles pin nBits); the occupancy-constant scale
    * study in [[graft.ScaleStudy]] does.
    */
  def occupancySizedBits(corpusSize: Long, targetOccupancy: Int, maxBits: Int = 16): Int = {
    require(targetOccupancy > 0, "targetOccupancy must be positive")
    val ratio = math.max(corpusSize.toDouble / targetOccupancy, 1.0)
    math.min(math.max(math.round(math.log(ratio) / math.log(2.0)).toInt, 1), maxBits)
  }

  /** Exact top-k of every probe vector against every candidate vector
    * (two (vec_id, v) frames), with [[bruteForceTopK]]'s scoring and
    * tie-break — the recall baseline for a RESTRICTED search (x49's
    * new-batch-vs-corpus shape, the occupancy study's ground truth).
    * The probe side is broadcast: bounded by construction at the callers.
    */
  private[graft] def topKBetween(probeVecs: DataFrame, candVecs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    candVecs.select(col("vec_id").as("cand_id"), col("v").as("cv"))
      .join(broadcast(probeVecs.select(col("vec_id").as("probe_id"), col("v").as("pv"))),
        col("probe_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("pv"), col("cv")))
      .filter(!isnan(col("sim")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** The shared multi-table angular-LSH index side: one fused
    * `nBits·nTables`-bit hyperplane signature per vector, then each table
    * is a cheap `nBits`-wide slice of it. Signs are computed over the
    * vector's OWN length (no corpus-dim derivation job); consumers join on
    * (tb, sz) so vectors of different sizes never pair up. Output:
    * (vec_id, sz, tb struct(t, bucket)) — one row per (vector, table).
    */
  private[operators] def tableBuckets(vecs: DataFrame, nBits: Int, nTables: Int): DataFrame = {
    require(nBits * nTables <= 64, "nBits * nTables must fit in one long")
    vecs
      .withColumn("sz", size(col("v")))
      .withColumn("bucket64",
        graft.functions.ArrayExpressions.hyperplaneBucket(col("v"), nBits * nTables))
      .select(col("vec_id"), col("sz"), explode(array((0 until nTables).map { t =>
        struct(lit(t).as("t"),
          shiftright(col("bucket64"), t * nBits)
            .bitwiseAND(lit((1L << nBits) - 1)).as("bucket"))
      }: _*)).as("tb"))
  }

  /** Multi-table hyperplane-LSH near-duplicate pairs: `nTables`
    * independent `nBits`-bit bucket ids per vector (disjoint slices of one
    * hyperplane family); vectors sharing any (table, bucket) become
    * candidates; exact cosine verifies, so precision is 1 and recall ≈
    * 1-(1-p^nBits)^nTables with p = 1-θ/π. The shuffle is on (table,
    * bucket) — near-linear like the MinHash LSH — versus the O(n²)
    * all-pairs cosine. Angular LSH only pays off at HIGH thresholds
    * (≥ ~0.8, small angles); below that the collision probability stops
    * discriminating and brute force on a bounded subset is the honest
    * choice ([[nearDupPairs]]).
    */
  def lshNearDupPairs(emb: DataFrame, threshold: Double,
                      nBits: Int = 8, nTables: Int = 8): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    verifyCosinePairs(vecs, lshCandidatePairs(vecs, nBits, nTables), threshold)
  }

  /** The exact-cosine verification stage shared by [[lshNearDupPairs]] and
    * [[sizedNearDup]] — ONE definition, so the fixed-geometry ledger path
    * and the production-sized path can never drift on what "verified"
    * means. Precision is 1 by construction: only candidates that clear the
    * exact threshold survive.
    */
  private def verifyCosinePairs(vecs: DataFrame, pairs: DataFrame,
                                threshold: Double): DataFrame =
    pairs
      .join(vecs.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(vecs.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(!isnan(col("sim")) && col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
      .orderBy("vec_a", "vec_b")

  /** PRODUCTION cosine near-dup entry point (r10 verdict #5): occupancy-
    * sized bits + the x51 multi-probe policy, by DEFAULT. The fixed
    * 6-bit × 8-table geometry the x54 ledger row pins (its SQL replay
    * requires fixed parameters) is measured quadratic-by-occupancy as the
    * corpus grows — 455 s at 10× in the BASELINE.md scale study — because
    * per-bucket occupancy, and so candidates/vector, grows linearly with
    * the corpus at fixed bits. This entry point is the scale-safe default
    * a 100-TB near-dup pass should call:
    *
    *  - `nBits = occupancySizedBits(corpus)` — +1 bit per corpus
    *    doubling holds per-bucket occupancy (and candidates/vector)
    *    constant: the measured near-FLAT curve;
    *  - multi-probe ([[multiProbeCandidatePairs]]) buys back the recall
    *    that fewer chance collisions cost: each vector also probes every
    *    Hamming-1 neighbor bucket, recovering the most likely near-miss
    *    (one hyperplane disagreement) without more tables — measured
    *    recall 1.000 at every scale in the x51 study;
    *  - the corpus count is ONE 1-row driver probe (the documented
    *    ivfTopK-dim pattern) — sizing needs the cardinality.
    *
    * Equivalence at fixture scale (sizedNearDup == exact brute-force pair
    * set on the planted corpus) is pinned in QueriesSpec.
    */
  def sizedNearDup(emb: DataFrame, threshold: Double = 0.9,
                   targetOccupancy: Int = 32, nTables: Int = 4): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val nBits = occupancySizedBits(vecs.count(), targetOccupancy, maxBits = 64 / nTables)
    verifyCosinePairs(vecs, multiProbeCandidatePairs(vecs, nBits, nTables), threshold)
  }

  /** Multi-probe candidate pairs: [[lshCandidatePairs]] widened by the
    * x51 policy — one side of the join also probes every Hamming-1
    * neighbor bucket (single sign-bit XOR; flip 0 = the exact bucket).
    * A pair whose signatures differ in exactly one of nBits bits — the
    * most likely near-miss — is recovered when the lower-id side flips
    * onto the higher's bucket (`vec_a < vec_b` orders ids, not roles, so
    * one flipped side covers both directions). Cost is explicit: the
    * flipped side grows by ×(nBits+1) = O(log corpus) under occupancy
    * sizing, never corpus-quadratic; ids-only rows (16 bytes) shuffle,
    * vectors re-attach after the distinct, exactly like the exact-bucket
    * path.
    */
  private[graft] def multiProbeCandidatePairs(vecs: DataFrame, nBits: Int,
                                              nTables: Int): DataFrame = {
    val withBuckets = tableBuckets(vecs, nBits, nTables)
    val flips = array((lit(0L) +: (0 until nBits).map(b => lit(1L << b))): _*)
    val a = withBuckets
      .select(col("tb.t").as("t"), explode(flips).as("flip"),
        col("tb.bucket").as("b0"), col("sz").as("sza"), col("vec_id").as("vec_a"))
      .select(col("t"), col("b0").bitwiseXOR(col("flip")).as("pb"),
        col("sza"), col("vec_a"))
    val b = withBuckets.select(col("tb.t").as("t2"), col("tb.bucket").as("bb"),
      col("sz").as("szb"), col("vec_id").as("vec_b"))
    a.join(b, col("t") === col("t2") && col("pb") === col("bb") &&
        col("sza") === col("szb") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
  }

  /** The distinct (vec_a, vec_b) candidate stage of [[lshNearDupPairs]]:
    * id pairs sharing any (table, bucket, sz). Dedup happens on CANDIDATE
    * IDS before vectors are re-attached — carrying the wide array columns
    * through the multi-table distinct() would shuffle every vector once
    * per colliding table instead of 16 bytes per pair. Exposed for the
    * scale study's candidate-count measurement.
    */
  private[graft] def lshCandidatePairs(vecs: DataFrame, nBits: Int, nTables: Int): DataFrame = {
    val withBuckets = tableBuckets(vecs, nBits, nTables)
    val a = withBuckets.select(col("tb").as("ta"), col("sz").as("sza"), col("vec_id").as("vec_a"))
    val b = withBuckets.select(col("tb").as("tb2"), col("sz").as("szb"), col("vec_id").as("vec_b"))
    a.join(b, col("ta") === col("tb2") && col("sza") === col("szb") &&
        col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
  }

  /** The deterministic planted-near-duplicate corpus behind x54: the
    * original vectors plus, for each, a twin `w = v + 0.3·rot1(v)`
    * (rot1 = cyclic shift by one) at `vec_id + PlantOffset`. The
    * perturbation is the scale-study probe protocol
    * ([[graft.ScaleStudy]]): cos(v, w) = (1 + 0.3·c1) / √(1.09 + 0.6·c1)
    * with c1 = cos(v, rot1(v)) ≈ 0 on isotropic data, so every planted
    * pair sits at ≈ 0.95–0.97 cosine while unrelated pairs on this
    * fixture stay below 0.7 — a clean margin on both sides of the 0.9
    * near-dup threshold. Pure double arithmetic in one deterministic
    * order, so the corpus (and everything computed from it) replays
    * bit-exact in DuckDB SQL.
    */
  private[graft] val PlantOffset = 1000000L
  private[graft] def plantedNearDupCorpus(emb: DataFrame): DataFrame = {
    // Empty embeddings are dropped from the planted corpus outright: the
    // twin expression slices v at length size(v)-1, which Spark's slice
    // rejects (negative length) for a zero-length array — abort, where the
    // oracle's range(1, len(v)+1) degrades gracefully. An empty vector has
    // no cosine to anything (NaN, dropped at verify) so it can never
    // contribute a pair; drop-don't-fail, mirrored in the oracle's
    // `WHERE len(v) > 0`.
    val vecs = vecFrame(emb).filter(size(col("v")) > 0)
    val twins = vecs.select(
      (col("vec_id") + lit(PlantOffset)).as("vec_id"),
      expr("zip_with(v, concat(slice(v, 2, size(v) - 1), slice(v, 1, 1)), (x, y) -> x + 0.3d * y)")
        .as("embedding"))
    vecs.select(col("vec_id"), col("v").as("embedding")).unionByName(twins)
  }

  /** x54: embedding-cosine near-duplicate detection through the
    * multi-table hyperplane index — [[lshNearDupPairs]]'s bucketed scale
    * path promoted to the ledger, run against [[plantedNearDupCorpus]]
    * (the raw fixture corpus is isotropic and has NO pairs above 0.7, so
    * the raw-table query would gate on an empty result; planting gives
    * the row real recall to defend). 6 bits × 8 tables matches the
    * x48/x51 replayed index, so the whole pipeline — plant, bucket,
    * collide, verify — hash-gates end to end in DuckDB with no recall
    * approximation in the compare: the oracle replays the same LSH, not
    * the exact all-pairs answer. At the planted similarity (θ ≈ 17°,
    * p ≈ 0.91) table recall is 1−(1−p⁶)⁸ ≈ 0.998; the candidate join
    * ships 16-byte id pairs on (table, bucket) — near-linear in corpus
    * size versus x6's O(n²) subset brute force.
    */
  def lshCosineNearDup(emb: DataFrame, threshold: Double = 0.9): DataFrame =
    lshNearDupPairs(plantedNearDupCorpus(emb), threshold, nBits = 6, nTables = 8)

  /** x48: ANN top-k through the hyperplane index — the DETERMINISTIC
    * approximate path next to x7/x22's exact scans and x8's
    * float-centroid IVF. For each probe (vec_id < nProbes), candidates
    * are the vectors sharing ANY (table, bucket) with it in the same
    * multi-table index [[lshNearDupPairs]] joins on; exact cosine ranks
    * them with x7's tie-break. Unlike IVF's learned centroids (whose
    * float-sum reduction order no serial SQL can pin — why x8 ships a
    * recall gate), the hyperplane signs are a pure splitmix function of
    * (bit, index), so the INDEX ITSELF replays in DuckDB SQL and the
    * whole approximate query hash-gates end to end.
    *
    * Scale shape: the index build is one scan (the signature expression
    * is one fused codegen loop); the candidate join ships nProbes·nTables
    * 16-byte rows broadcast against the index — the corpus is never
    * all-paired, and per-probe work is O(collisions), the standard
    * 1-(1-p^nBits)^nTables recall curve (measured against x7 in
    * QueriesSpec). nBits tunes the recall/cost point: 6 bits ≈ 1/64
    * per-table collision rate on isotropic data.
    */
  def lshTopK(emb: DataFrame, nProbes: Int, k: Int,
              nBits: Int = 6, nTables: Int = 8): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    val vecs = vecFrame(emb)
    val index = tableBuckets(vecs, nBits, nTables)
    val probeIdx = index.filter(col("vec_id") < nProbes)
      .select(col("tb").as("ptb"), col("sz").as("psz"), col("vec_id").as("probe_id"))
    // candidate IDS first, vectors re-attached after the distinct — same
    // reasoning as lshNearDupPairs (never shuffle the wide arrays per
    // colliding table)
    val candIds = index.join(broadcast(probeIdx),
        col("tb") === col("ptb") && col("sz") === col("psz") &&
          col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id")).distinct()
    rankCandidates(candIds, vecs.filter(col("vec_id") < nProbes), vecs, k)
  }

  /** x51: MULTI-PROBE ANN through the same hyperplane index as
    * [[lshTopK]] — each probe searches its exact bucket PLUS every
    * Hamming-1 neighbor bucket (one sign-bit flip) in every table. This
    * is the standard recall lever at FIXED table count: a near neighbor
    * that disagrees on exactly one of nBits hyperplanes (the most likely
    * near-miss, probability nBits·p^(nBits−1)·(1−p) vs p^nBits for the
    * exact hit) is recovered without building more tables — the dial the
    * occupancy-constant sizing study (BASELINE.md) leaves fixed. Cost is
    * bounded and explicit: the broadcast probe side grows from
    * nProbes·nTables to nProbes·nTables·(nBits+1) 16-byte rows, and the
    * candidate set by the occupancy of the flipped buckets — still
    * O(collisions), never corpus-quadratic; the index itself is built
    * once and UNCHANGED (multi-probe is a query-time choice, so one
    * persisted index serves both probing policies).
    *
    * Like x48, the whole query replays in SQL (the bucket flips are
    * integer XORs of the replayed buckets), so the ledger hash-gates it
    * end to end.
    */
  def multiProbeTopK(emb: DataFrame, nProbes: Int, k: Int,
                     nBits: Int = 6, nTables: Int = 8): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    val vecs = vecFrame(emb)
    val index = tableBuckets(vecs, nBits, nTables)
    // one row per (probe, table, flip): flip 0 = the exact bucket, then
    // each single-bit XOR. Bounded: nProbes · nTables · (nBits+1) rows.
    val flips = array((lit(0L) +: (0 until nBits).map(b => lit(1L << b))): _*)
    val probeIdx = index.filter(col("vec_id") < nProbes)
      .select(col("tb.t").as("pt"), explode(flips).as("flip"),
        col("tb.bucket").as("pbucket0"), col("sz").as("psz"), col("vec_id").as("probe_id"))
      .select(col("pt"), col("pbucket0").bitwiseXOR(col("flip")).as("pbucket"),
        col("psz"), col("probe_id"))
    val candIds = index.join(broadcast(probeIdx),
        col("tb.t") === col("pt") && col("tb.bucket") === col("pbucket") &&
          col("sz") === col("psz") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id")).distinct()
    rankCandidates(candIds, vecs.filter(col("vec_id") < nProbes), vecs, k)
  }

  /** x52: int8-quantized ANN with float rescore — the memory/bandwidth
    * production path that x16's calibration sets up. All candidates are
    * ranked in INT8 space first (x16's exact quantization: per-vector
    * scale = max|v|/127, HALF-UP rounding; cosine is scale-invariant, so
    * the per-vector scales cancel and the int8 ranking needs no
    * dequantization), a `shortlist`-deep prefix survives per probe, and
    * only that shortlist is rescored with exact float cosine for the
    * final top-k. The int8 phase ships `array<tinyint>` rows — 8× less
    * exchange/scan volume than the float64 vectors, which only the
    * shortlist·nProbes rescore rows ever touch.
    *
    * Fully hash-gated: int8 dot/norm sums are EXACT integers (≤ 127²·dim
    * « 2^53), so the int8 cosine is bit-reproducible in any engine that
    * divides IEEE doubles — the quantize → int8-rank → shortlist →
    * float-rescore pipeline replays in DuckDB SQL verbatim. Zero-scale
    * (all-zero) vectors drop at quantization; they have no cosine to
    * anything.
    */
  def int8RescoreTopK(emb: DataFrame, nProbes: Int, k: Int, shortlist: Int = 15): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    val vecs = vecFrame(emb)
    val q = vecs
      .withColumn("scale", expr("aggregate(v, 0d, (m, x) -> greatest(m, abs(x))) / 127d"))
      .filter(col("scale") > 0)
      .select(col("vec_id"), expr("transform(v, x -> CAST(round(x / scale) AS tinyint))").as("qv"))
    val probes = q.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("qv").as("pq"))
    // shortlist via the bounded-heap aggregate (x22's kernel, identical
    // ordering and tie-break to a window rank): partial aggregation cuts
    // every map task's slice to `shortlist` rows per probe BEFORE the
    // exchange, so the shuffle carries shortlist·probes·tasks rows — a
    // window formulation would shuffle EVERY scored (probe, cand) pair,
    // which is the nProbes·corpus term that breaks at 100 TB
    val shortIds = q.select(col("vec_id").as("cand_id"), col("qv").as("cq"))
      .join(broadcast(probes), col("probe_id") =!= col("cand_id"))
      .withColumn("qsim", cosine(col("pq").cast("array<double>"), col("cq").cast("array<double>")))
      .filter(!isnan(col("qsim")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.ArrayExpressions.topKByScore(col("qsim"), col("cand_id"), shortlist)
        .as("top"))
      .select(col("probe_id"), explode(expr("transform(top, t -> t.id)")).as("cand_id"))
    rankCandidates(shortIds, vecs.filter(col("vec_id") < nProbes), vecs, k)
  }

  /** Exact-cosine ranking of a candidate-ID set with x7's tie-break —
    * the verification half shared by [[lshTopK]] and
    * [[IncrementalAnn.incrementalTopK]]. No forced broadcast of the probe
    * vectors: x48's probe set is bounded but x49's is a whole ingest
    * batch, and a forced broadcast of batch×dim doubles is a driver OOM
    * at production batch sizes — AQE broadcast-converts at runtime when
    * the side actually fits (it does on every fixture, plan-audited), and
    * the join degrades to shuffle gracefully when it doesn't.
    */
  private[operators] def rankCandidates(candIds: DataFrame, probeVecs: DataFrame,
                                        candVecs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    candIds
      .join(candVecs.select(col("vec_id").as("cand_id"), col("v").as("cv")), "cand_id")
      .join(probeVecs.select(col("vec_id").as("probe_id"), col("v").as("pv")),
        "probe_id")
      .withColumn("sim", cosine(col("pv"), col("cv")))
      .filter(!isnan(col("sim"))) // zero-norm vectors: undefined cosine, drop
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"), round(col("sim"), 4).as("sim"), col("rank"))
      .orderBy("probe_id", "rank")
  }

  /** Recall contract for the IVF path, pinned in QueriesSpec (the x8
    * ledger row itself now hash-gates the top-k rows — fixed-point
    * centroids made the row set deterministic — so this gate moved from
    * the driver ledger to the test suite). One output row:
    *
    *  - `n_probes` / `n_exact`: probe count and exact-top-k row count —
    *    DuckDB recomputes both from the x7 oracle query, so they are hard
    *    value checks;
    *  - `recall_ok`: |IVF ∩ exact| / |exact| >= `minRecall`. The floor is
    *    what the fixture's RANDOM vectors support (label clusters barely
    *    discriminate on isotropic data — recall ~0.5 at nprobe=5 of ~10
    *    labels, i.e. ~nprobe/nLabels as theory predicts); on clustered
    *    production embeddings the same plan recalls far higher, and the
    *    gate pins that it never silently degrades below the measured floor.
    *
    * Both sides reduce to 1-row aggregates joined by broadcast — zero
    * driver actions (ivfTopK's dominant-dim selection is in-plan too).
    */
  def ivfRecallGate(emb: DataFrame, nProbes: Int, k: Int, nprobe: Int = 5,
                    minRecall: Double = 0.4): DataFrame = {
    val exact = bruteForceTopK(emb, nProbes, k).select(col("probe_id"), col("cand_id"))
    val approx = ivfTopK(emb, nProbes, k, nprobe).select(col("probe_id"), col("cand_id"))
    val hits = exact.join(approx, Seq("probe_id", "cand_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    exact.agg(
      countDistinct(col("probe_id")).as("n_probes"),
      count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(hits))
      .select(col("n_probes"), col("n_exact"),
        (col("n_hits").cast("double") >=
          col("n_exact").cast("double") * minRecall).as("recall_ok"))
  }

  /** IVF-style ANN: cluster centroids are the per-`label` mean vectors;
    * each probe searches only the `nprobe` nearest clusters. Approximate
    * (recall < 1) — compare against [[bruteForceTopK]] for recall.
    */
  /** Fixed-point per-`label` mean centroids plus the corpus's dominant
    * dimensionality, shared by [[ivfTopK]] (x8) and [[semDedup]] (x87).
    *
    * ONE aggregation job yields both the per-(label, size) centroid sums
    * and the corpus's dominant dimensionality — round 2 ran a separate
    * full-scan dominantDim job before the centroid aggregation, and built
    * the centroids from `dim` separate sum(element_at) columns (a plan
    * whose node count grew with dim). The fused vector_sum aggregate is
    * one plan node at any dim; grouping by size(v) alongside label keeps
    * ragged rows in their own (dropped) groups — drop-don't-fail without
    * a pre-filter.
    *
    * Fixed-point centroid accumulation (x75's integer-determinism
    * pattern): each element is quantized to floor(x·10⁶) — an INTEGRAL
    * double, and every partial sum stays far below 2⁵³ (|x| ≲ 1 and the
    * scale budget holds to ~10⁹ vectors per label), so each addition is
    * EXACT and the reduction is order-independent. That makes the
    * centroids — and therefore every consumer — deterministic across
    * partitionings AND engines: DuckDB recomputes the identical sums
    * serially, so x8/x87 hash-gate like x48/x52 instead of riding a
    * recall boolean. Quantization error ≤ 1e-6 per element is ~4 orders
    * below the cluster-similarity gaps at any scale.
    *
    * Returns (centroids `(c_label, centroid)`, domDim `(dom_sz)` — a
    * 1-row relation selected IN-PLAN and joined back broadcast; round 11
    * still collected it to the driver and parameterized filters with the
    * literal. An empty input yields an empty result instead of a throw,
    * the drop-don't-fail convention.)
    */
  private[operators] def fixedPointCentroids(withV0: DataFrame): (DataFrame, DataFrame) = {
    val sums = withV0
      .groupBy(col("label"), size(col("v")).as("sz"))
      .agg(graft.functions.ArrayExpressions.vectorSum(
        expr("transform(v, x -> cast(floor(x * cast(1000000 as double)) as double))")).as("s"),
        count(lit(1)).as("n"))
      .ckpt() // tiny (labels × sizes rows); read twice below
    val domDim = sums.groupBy(col("sz")).agg(sum(col("n")).as("n"))
      .orderBy(col("n").desc, col("sz")).limit(1)
      .select(col("sz").as("dom_sz"))
    val centroids = sums.join(broadcast(domDim), col("sz") === col("dom_sz"))
      .select(col("label").as("c_label"),
        // exact-integral sum / exact (n·10⁶) — bit-identical on any engine
        expr("transform(s, x -> x / (n * cast(1000000 as double)))").as("centroid"))
    (centroids, domDim)
  }

  def ivfTopK(emb: DataFrame, nProbes: Int, k: Int, nprobe: Int = 5): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val withV0 = emb.select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val (centroids, domDim) = fixedPointCentroids(withV0)
    // drop-don't-fail: ragged vectors leave the probe/candidate sets too.
    val withV = withV0.join(broadcast(domDim), size(col("v")) === col("dom_sz"))
      .drop("dom_sz")
    val probes = withV.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    // nprobe nearest centroids per probe (tiny: nLabels × nProbes rows).
    val wc = Window.partitionBy("probe_id").orderBy(col("csim").desc, col("c_label"))
    val probeClusters = probes.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("pv"), col("centroid")))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe)
      .select(col("probe_id"), col("pv"), col("c_label"))
    // Search only the selected clusters.
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    withV.select(col("vec_id").as("cand_id"), col("label"), col("v").as("cv"))
      .join(broadcast(probeClusters), col("label") === col("c_label") && col("probe_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("pv"), col("cv")))
      .filter(!isnan(col("sim")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"), round(col("sim"), 4).as("sim"), col("rank"))
      .orderBy("probe_id", "rank")
  }

  /** x87: SemDeDup — semantic deduplication by CLUSTER-SCOPED cosine
    * pruning (Abbas et al. 2023, arXiv:2303.09540): embed → k-means
    * partition → within each cell find pairs with cosine ≥ `tau` →
    * resolve the pair graph to connected components → keep ONE
    * representative per component, drop the rest. Keeper rule is the
    * paper's: the member LEAST similar to its cell centroid (farthest
    * from the center of mass keeps the most diverse exemplar);
    * deterministic tie-break on vec_id.
    *
    * Scale shape — the reason SemDeDup exists: candidate generation is
    * scoped to k-means cells, so pair work is O(Σ|cell|²) ≈ O(n²/k) at
    * balanced cells instead of all-pairs O(n²); at 100 TB k grows with n
    * (cells of ~10⁴ vectors keep each self-join partition-local), every
    * stage is a bucketed shuffle on the cell key, and the centroid table
    * stays a broadcast at any corpus size. Assignment is a genuine 1-NN
    * over the centroid set — one Lloyd assign step from the label
    * seeding, NOT the raw label partition: a vector whose embedding sits
    * nearer another label's center moves there. [[fixedPointCentroids]]
    * (x8's integer-determinism pattern) makes centroids — hence
    * assignment, pairs, components, and keepers — deterministic across
    * partitionings AND engines, so the ledger row hash-gates against a
    * full DuckDB replay (centroids → 1-NN cells → in-cell pairs →
    * recursive-CTE reachability → keeper window).
    *
    * Differs from x56 (cosine dup clusters) in candidate GEOMETRY: x56
    * buckets by hyperplane LSH over a subset; x87 partitions the whole
    * corpus by learned centroids — the two production candidate
    * generators for embedding dedup, both resolved by the same
    * [[Dedup.dupClusters]] pointer-doubling.
    *
    * Output: one row per vector that belongs to a duplicate component —
    * (vec_id, cell, component, cos_cent, is_keeper), vec_id-ordered.
    */
  /** The k-means-cell assignment relation `(vec_id, v, cell, cos_cent)`
    * behind [[semDedup]]: 1-NN over the (tiny, broadcast) fixed-point
    * centroid set; zero-norm vectors (NaN cosine against every centroid)
    * drop — undefined cell. Exposed so the scale study can measure
    * per-cell occupancy (the Σ|cell|² pair-work law) on the exact
    * relation the operator uses.
    */
  private[graft] def cellAssignments(emb: DataFrame): DataFrame = {
    graft.functions.ArrayExpressions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val withV0 = emb.select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val (centroids, domDim) = fixedPointCentroids(withV0)
    val withV = withV0.join(broadcast(domDim), size(col("v")) === col("dom_sz"))
      .drop("dom_sz")
    // argmax as a map-side-combined struct MAX (KMeans.lloyd's idiom),
    // NOT a row_number window: the window formulation sort-shuffled the
    // full n·k crossJoin expansion, where the aggregate partial-combines
    // each vector's k candidate rows back to ONE before the exchange
    // (guide §2.2 — shuffle n rows, not n·k). max of (csim, -c_label)
    // reproduces the window's (csim DESC, c_label ASC) winner exactly:
    // csim is NaN-filtered so double struct ordering is total, and
    // c_label is int32 so the negation cannot overflow.
    withV.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("v"), col("centroid")))
      .filter(!isnan(col("csim")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("csim"), (-col("c_label")).as("nlbl"),
        col("c_label"), col("v"))).as("m"))
      .select(col("vec_id"), col("m.v").as("v"), col("m.c_label").as("cell"),
        col("m.csim").as("cos_cent"))
      .ckpt() // read three times: both pair sides + the keeper join
  }

  def semDedup(emb: DataFrame, tau: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val asg = cellAssignments(emb)
    val pairs = asg.as("a").join(asg.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", cosine(col("a.v"), col("b.v")))
      .filter(!isnan(col("sim")) && col("sim") >= tau)
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
    val comps = Dedup.dupClusters(pairs) // (doc_id, cluster_id = min member)
    val wk = Window.partitionBy("component").orderBy(col("cos_cent").asc, col("vec_id"))
    comps.join(asg.select(col("vec_id"), col("cell"), col("cos_cent")),
        col("doc_id") === col("vec_id"))
      .select(col("vec_id"), col("cell"), col("cluster_id").as("component"), col("cos_cent"))
      .withColumn("krk", row_number().over(wk))
      .select(col("vec_id"), col("cell"), col("component"),
        round(col("cos_cent"), 4).as("cos_cent"), (col("krk") === 1).as("is_keeper"))
      .orderBy("vec_id")
  }
}
