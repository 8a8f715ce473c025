package graft.operators

import graft.{CkptOps, Tables}
import graft.sources.{Bucketed, DirTag}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** x115: incremental IVFADC index maintenance — new-batch vectors encoded
  * against a FROZEN PQ store (Jégou, Douze & Schmid 2011 §V: the whole
  * point of a trained coarse quantizer + codebooks is that ingest never
  * retrains them), the [[IncrementalAnn]]/[[IncrementalDedup]] persisted-
  * store posture applied to the production index
  * ([[ProductQuantization]]).
  *
  * A 100 TB corpus ingests a bounded batch per cycle. Re-running
  * [[ProductQuantization.adcTopK]] per cycle re-reads, re-residualizes
  * and re-trains over the WHOLE corpus; here the corpus-scaled work runs
  * ONCE, persisted as three idempotent stores
  * ([[Bucketed.materializedBucketedTable]]):
  *
  *  - '''coarse store''' `(ccell, cc)` — the frozen coarse centroids
  *    (CoarseK rows, trained on the day-0 slice);
  *  - '''codebook store''' `(sub, c_cell, c)` — the frozen residual PQ
  *    codebooks (NumSub·K rows, trained on day-0 residuals);
  *  - '''codes store''' `(c_id, ccell, sub, cell)` — the inverted lists:
  *    every day-0 vector's home cell + NumSub residual codes, bucketed by
  *    `ccell` (the list key) so probing a cell never shuffles the store.
  *
  * Per batch only the NEW vectors are touched: one scan coarse-assigns
  * and residualizes them against the broadcast frozen centroids, one
  * argmin encodes the residuals against the broadcast frozen codebooks
  * — O(|batch|·(CoarseK + NumSub·K)), the corpus never re-read — and the
  * batch codes APPEND (union) to the stored lists. Search is then the
  * exact x108 ADC scan over the merged lists. Because every stage is the
  * same fixed-point integer math as x107/x108, the whole chain (frozen
  * training, batch encode, merged-list ADC rank) replays in DuckDB as
  * unrolled CTEs and hash-gates as x115.
  *
  * The "new day" here is the synthetic slice `vec_id % BatchMod ==
  * BatchRem` (x31's rule, at a residue disjoint from the query slice's
  * [[ProductQuantization.QueryRem]]): the frozen model trains WITHOUT
  * the batch, the batch encodes against it, and the held-out queries
  * search the union — three disjoint slices, so neither queries nor the
  * batch ever leak into training.
  *
  * Reference analog: Job-1 -> Job-2 chaining through materialized output
  * (`AirportTripsRevenue.java:599-600`) — stages communicating through a
  * persisted layout instead of recomputation.
  */
object IncrementalPq {

  /** The synthetic "new day" corpus batch, disjoint from the query
    * slice: `vec_id % BatchMod == BatchRem` with BatchRem != QueryRem.
    */
  val BatchMod: Int = IncrementalAnn.NewMod
  val BatchRem = 3
  require(BatchRem != ProductQuantization.QueryRem % BatchMod,
    "batch and query slices must be disjoint")

  def isBatchVec(id: Column): Column = id % BatchMod === BatchRem

  private[graft] val StoreBuckets = 8

  /** Day-0 training slice: neither a query nor the new batch. */
  private def trainSlice(pts: DataFrame): DataFrame =
    pts.filter(!ProductQuantization.isQueryCol && !isBatchVec(col("vec_id")))

  /** One exact fixed-point centroid update from the `vec_id % coarseK`
    * seeding over `slice` — [[ProductQuantization]]'s coarse quantizer,
    * trained here on the day-0 slice only.
    */
  private def coarseOf(slice: DataFrame, coarseK: Int): DataFrame =
    slice
      .withColumn("ccell", pmod(col("vec_id"), lit(coarseK.toLong)).cast("int"))
      .groupBy(col("ccell"))
      .agg(graft.functions.ArrayExpressions.vectorSum(col("fv")).as("s"),
        count(lit(1)).as("n"))
      .select(col("ccell"),
        expr("transform(s, x -> cast(floor(x / cast(n as double)) as double))").as("cc"))

  /** 1-NN home-cell assignment of `slice` against the (frozen,
    * broadcast) coarse centroids, keeping BOTH the original vector and
    * its home centroid: (vec_id, ccell, fv, cc) — the argmin
    * partial-aggregates BEFORE the shuffle, exactly `coarseParts`'
    * corpus stage. One definition feeds the residual view (PQ encode),
    * the original-vector view (exact re-rank), and the vectors store,
    * so a batch vector's home cell cannot drift between its codes and
    * its re-rank row.
    */
  private def assigned(slice: DataFrame, coarse: DataFrame): DataFrame =
    slice.crossJoin(broadcast(coarse))
      .withColumn("d2c", expr(ProductQuantization.CoarseDist2))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2c"), col("ccell"), col("fv"), col("cc"))).as("m"))
      .select(col("vec_id"), col("m.ccell").as("ccell"),
        col("m.fv").as("fv"), col("m.cc").as("cc"))

  /** Residual view of an [[assigned]] relation: (vec_id, ccell, fv−cc). */
  private def residualOf(a: DataFrame): DataFrame =
    a.select(col("vec_id"), col("ccell"),
      expr("zip_with(fv, cc, (x, y) -> x - y)").as("fv"))

  /** Original-vector view of an [[assigned]] relation, in the re-rank
    * side's (c_id, ccell, cv) shape.
    */
  private def vecsOf(a: DataFrame): DataFrame =
    a.select(col("vec_id").as("c_id"), col("ccell"), col("fv").as("cv"))

  /** 1-NN home cell + residual of `slice` — [[assigned]] ∘ [[residualOf]]. */
  private def residuals(slice: DataFrame, coarse: DataFrame): DataFrame =
    residualOf(assigned(slice, coarse))

  /** Encode subvector rows against a FROZEN (broadcast) codebook: the
    * per-(vec, sub) exact-integer argmin with (d2, cell) tie-break —
    * the same argmin as a training round, no centroid update. For the
    * training slice this reproduces the final training assignment (the
    * last Lloyd round assigns against the same final codebook), so one
    * uniform encode definition covers store AND batch codes.
    */
  private def encode(sp: DataFrame, cb: DataFrame): DataFrame =
    sp.join(broadcast(cb), Seq("sub"))
      .withColumn("d2c", expr(ProductQuantization.Dist2Expr))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2c"), col("c_cell"))).as("m"))
      .select(col("vec_id"), col("sub"), col("m.c_cell").as("cell"))

  /** Inverted-list code rows (c_id, ccell, sub, cell) of a residual
    * relation `r` under a frozen codebook — the ONE definition the codes
    * store, the per-cycle batch encode, and the fresh twin all share, so
    * the store-vs-fresh equality contract cannot drift on row shape.
    */
  private def codesOf(r: DataFrame, cb: DataFrame): DataFrame =
    encode(ProductQuantization.subPtsOf(r), cb)
      .join(r.select(col("vec_id"), col("ccell")), Seq("vec_id"))
      .select(col("vec_id").as("c_id"), col("ccell"), col("sub"), col("cell"))

  /** Idempotently persist the frozen coarse centroids; returns the table
    * name. Tag embeds coarseK — a re-sized geometry is a different
    * physical store and retires the old one (the [[IncrementalAnn]]
    * sweep rule).
    */
  def coarseStore(spark: SparkSession, dir: String,
                  coarseK: Int = ProductQuantization.CoarseK): String =
    Bucketed.materializedBucketedTable(spark, "pqcc_" + DirTag.dirScope(dir) + "_",
      "pqcc_" + DirTag(dir, "embeddings") + s"_k$coarseK", "ccell", StoreBuckets) {
      graft.functions.ArrayExpressions.register(spark)
      coarseOf(trainSlice(KMeans.quantizedPts(Tables.load(spark, dir, "embeddings"), spreadInput = false)),
        coarseK)
    }

  /** Idempotently persist the frozen residual PQ codebooks (trained on
    * the day-0 slice's coarse residuals); returns the table name.
    */
  def codebookStore(spark: SparkSession, dir: String,
                    coarseK: Int = ProductQuantization.CoarseK): String =
    Bucketed.materializedBucketedTable(spark, "pqcb_" + DirTag.dirScope(dir) + "_",
      "pqcb_" + DirTag(dir, "embeddings") + s"_k$coarseK", "sub", StoreBuckets) {
      graft.functions.ArrayExpressions.register(spark)
      val coarse = spark.table(coarseStore(spark, dir, coarseK))
      val pts = KMeans.quantizedPts(Tables.load(spark, dir, "embeddings"), spreadInput = false)
      val r = residuals(trainSlice(pts), coarse).ckpt()
      val (cb, _) = ProductQuantization.train(ProductQuantization.subPtsOf(r))
      cb
    }

  /** Idempotently persist the day-0 inverted lists — every training-slice
    * vector's home cell + NumSub frozen-codebook codes, bucketed by the
    * list key `ccell`; returns the table name. DAY-0 cost note: each of
    * the three builders re-derives its upstream stages (this one pays a
    * second train-slice residualization on a fully cold build) — a
    * deliberate trade: the builders stay independently idempotent and
    * the duplication exists only on the once-per-fixture cold path; the
    * per-cycle path never re-enters any of it.
    */
  def codesStore(spark: SparkSession, dir: String,
                 coarseK: Int = ProductQuantization.CoarseK): String =
    Bucketed.materializedBucketedTable(spark, "pqix_" + DirTag.dirScope(dir) + "_",
      "pqix_" + DirTag(dir, "embeddings") + s"_k$coarseK", "ccell", StoreBuckets) {
      graft.functions.ArrayExpressions.register(spark)
      val coarse = spark.table(coarseStore(spark, dir, coarseK))
      val cb = spark.table(codebookStore(spark, dir, coarseK))
      val pts = KMeans.quantizedPts(Tables.load(spark, dir, "embeddings"), spreadInput = false)
      codesOf(residuals(trainSlice(pts), coarse).ckpt(), cb)
    }

  /** Idempotently persist the day-0 ORIGINAL fixed-point vectors keyed
    * by their home list — (c_id, ccell, cv), bucketed by `ccell` like
    * the codes store; returns the table name. This is the fourth store
    * of the IVFADC-R composition (Jégou et al. 2011 §V keep the raw
    * vectors alongside the compressed index for the refinement step):
    * the exact re-rank needs full-precision distances for the per-query
    * shortlist, which the NumSub-byte codes cannot reconstruct. Read
    * ONLY by the re-rank join against the shortlist (per-query-constant
    * rows out); sharing the list key keeps the read probed-lists-shaped,
    * the same posture as the codes-store scan.
    */
  def vectorsStore(spark: SparkSession, dir: String,
                   coarseK: Int = ProductQuantization.CoarseK): String =
    Bucketed.materializedBucketedTable(spark, "pqvx_" + DirTag.dirScope(dir) + "_",
      "pqvx_" + DirTag(dir, "embeddings") + s"_k$coarseK", "ccell", StoreBuckets) {
      graft.functions.ArrayExpressions.register(spark)
      val coarse = spark.table(coarseStore(spark, dir, coarseK))
      val pts = KMeans.quantizedPts(Tables.load(spark, dir, "embeddings"), spreadInput = false)
      vecsOf(assigned(trainSlice(pts), coarse))
    }

  /** Batch codes computed fresh per run — the ONLY per-cycle encode
    * work: coarse-assign + residualize + PQ-encode the batch slice
    * against the frozen broadcast model. (c_id, ccell, sub, cell).
    */
  private def batchCodes(pts: DataFrame, coarse: DataFrame, cb: DataFrame): DataFrame =
    codesOf(residuals(pts.filter(isBatchVec(col("vec_id"))), coarse).ckpt(), cb)

  /** ADC top-k of the query slice against the inverted lists under the
    * frozen model — x108's search stage: queries probe their nProbe
    * nearest frozen cells, residualize PER PROBED CELL, build the exact
    * LUT against the broadcast codebook, scan the probed lists, rank by
    * summed ADC distance with (adc_d2, c_id) tie-break.
    *
    * The lists arrive as a Seq of relations (persisted store + per-run
    * batch) scored SEPARATELY and unioned after the per-(q, c) sum — a
    * corpus vector lives in exactly one side, so the union of per-side
    * aggregates equals the aggregate of the union, and the ccell-
    * bucketed store side keeps its layout through its own join instead
    * of being destroyed by a pre-join union with the unbucketed batch.
    * No forced broadcast anywhere: the probe side is |queries|·nProbe
    * rows — small for a production query batch but corpus-proportional
    * under this fixture's 1-in-10 query slice, so AQE picks the strategy
    * per side at runtime (a hard broadcast hint would OOM exactly at the
    * scale this operator argues for).
    */
  private def adcSearch(pts: DataFrame, coarse: DataFrame, cb: DataFrame,
                        codeSides: Seq[DataFrame], topK: Int, nProbe: Int): DataFrame = {
    val adc = mergedAdcScores(pts, coarse, cb, codeSides, nProbe)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_d2"), col("c_id"))
    adc.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("c_id"), col("adc_d2"))
      .orderBy("q_id", "rnk")
  }

  /** The merged-list ADC scoring stage [[adcSearch]] (plain ADC rank,
    * x115) and the re-rank entry points (x116) share: (q_id, ccell,
    * c_id, adc_d2). The candidate's home-list key `ccell` rides through
    * the aggregate — functionally dependent on c_id (one home cell per
    * corpus vector, so each (q, c) pair exists under exactly one ccell
    * and the sums are unchanged) — so the re-rank's shortlist can join
    * the ccell-bucketed vectors store on its list key.
    */
  private def mergedAdcScores(pts: DataFrame, coarse: DataFrame, cb: DataFrame,
                              codeSides: Seq[DataFrame], nProbe: Int): DataFrame = {
    val ns = ProductQuantization.NumSub
    val sd = ProductQuantization.SubDim
    val wq = Window.partitionBy(col("vec_id")).orderBy(col("d2c"), col("ccell"))
    val qProbe = pts.filter(ProductQuantization.isQueryCol).crossJoin(broadcast(coarse))
      .withColumn("d2c", expr(ProductQuantization.CoarseDist2))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("ccell"),
        expr("zip_with(fv, cc, (x, y) -> x - y)").as("fv"))
      .ckpt() // read by the LUT and the list scan
    val qSub = qProbe.select(col("q_id"), col("ccell"),
        explode(expr(s"transform(sequence(0, ${ns - 1}), " +
          s"s -> struct(cast(s as int) AS sub, slice(fv, s * $sd + 1, $sd) AS sv))"))
          .as("p"))
      .select(col("q_id"), col("ccell"), col("p.sub").as("sub"), col("p.sv").as("sv"))
    val lut = qSub.join(broadcast(cb), Seq("sub"))
      .withColumn("d2", expr(ProductQuantization.Dist2Expr))
      .select(col("q_id"), col("ccell"), col("sub"), col("c_cell").as("cell"), col("d2"))
    // codes rows carry their list key, so each side's probed-list scan
    // is ONE join on ccell (probed lists only move), then the LUT lookup
    val probeCells = qProbe.select(col("q_id"), col("ccell"))
    codeSides.map { codes =>
      probeCells
        .join(codes, Seq("ccell"))
        .join(lut, Seq("q_id", "ccell", "sub", "cell"))
        .groupBy(col("q_id"), col("ccell"), col("c_id"))
        .agg(sum(col("d2")).as("adc_d2"))
    }.reduce(_ unionByName _)
  }

  /** Exact re-rank of the per-query ADC shortlist (Jégou et al. 2011
    * §V's refinement, [[ProductQuantization.adcRerankTopK]]'s stage run
    * against STORED vectors): keep the `l` ADC-nearest ids per query,
    * fetch ONLY those candidates' full fixed-point vectors from the
    * supplied sides (persisted day-0 store / per-cycle batch — a c_id
    * lives in exactly one side, so per-side joins union losslessly and
    * the store side keeps its bucketed layout through its own join),
    * and rank by exact distance with (d2, c_id) tie-break. The shortlist
    * is |queries|·l rows — per-query CONSTANT — and is ckpt'd because
    * both vector sides consume it. (q_id, rnk, c_id, d2).
    */
  private def rerank(adc: DataFrame, l: Int, topK: Int,
                     vecSides: Seq[DataFrame], pts: DataFrame): DataFrame = {
    val ws = Window.partitionBy(col("q_id")).orderBy(col("adc_d2"), col("c_id"))
    val short = adc.withColumn("srnk", row_number().over(ws))
      .filter(col("srnk") <= l)
      .select(col("q_id"), col("ccell"), col("c_id"))
      .ckpt() // read once per vector side
    val qv = pts.filter(ProductQuantization.isQueryCol)
      .select(col("vec_id").as("q_id"), col("fv").as("qv"))
    val ex = vecSides.map(vs => short.join(vs, Seq("ccell", "c_id")))
      .reduce(_ unionByName _)
      .join(qv, Seq("q_id"))
      .withColumn("d2", expr("fixed_point_dist2(qv, cv)"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("c_id"))
    ex.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("c_id"), col("d2"))
      .orderBy("q_id", "rnk")
  }

  /** x115: top-k IVFADC search of the held-out queries against the
    * MERGED index (persisted day-0 lists + freshly-encoded batch),
    * computed WITHOUT re-reading, re-residualizing or re-training the
    * corpus: model and lists come entirely from the three stores; the
    * per-run compute is the batch encode + the probed-list scan.
    * (q_id, rnk, c_id, adc_d2).
    */
  def incrementalAdcTopK(spark: SparkSession, dir: String, topK: Int = 3,
                         nProbe: Int = ProductQuantization.NProbe,
                         coarseK: Int = ProductQuantization.CoarseK): DataFrame = {
    graft.functions.ArrayExpressions.register(spark)
    val coarse = spark.table(coarseStore(spark, dir, coarseK))
    val cb = spark.table(codebookStore(spark, dir, coarseK))
    val stored = spark.table(codesStore(spark, dir, coarseK))
    val pts = cycleSlice(spark, dir, coarse)
    adcSearch(pts, coarse, cb, Seq(stored, batchCodes(pts, coarse, cb)), topK, nProbe)
  }

  /** The per-cycle scan: ONLY the rows matching `pred` (default: the
    * batch + query slices) are ever read on the store-backed paths (the
    * stored lists carry everything else) — the scan filters BEFORE
    * quantizing and ckpt'ing, and the dominant dim comes from the frozen
    * model itself (every stored coarse centroid is a domDim-length
    * vector) instead of quantizedPts' corpus-wide histogram — either
    * would be an O(corpus) pass per cycle.
    */
  private def cycleSlice(spark: SparkSession, dir: String, coarse: DataFrame,
                         pred: Column = isBatchVec(col("vec_id")) ||
                           ProductQuantization.isQueryCol): DataFrame = {
    val domDim = coarse.select(size(col("cc")).as("dom_sz")).limit(1)
    Tables.load(spark, dir, "embeddings")
      .filter(pred)
      .select(col("vec_id"),
        expr("transform(cast(embedding as array<double>), " +
          s"x -> cast(floor(x * cast(${KMeans.FixedPointScale} as double)) as double))").as("fv"))
      .join(broadcast(domDim), size(col("fv")) === col("dom_sz"))
      .drop("dom_sz")
      .ckpt()
  }

  /** x116: incremental IVFADC search WITH exact re-ranking — the
    * composition that was the r18 verdict's top gap: [[incrementalAdcTopK]]
    * has frozen-store economics but plain-ADC recall (~0.66 ordering
    * saturation on the clustered fixture), while the production default
    * [[ProductQuantization.adcRerankTopKSized]] has retrieval-grade
    * recall but retrains per run. Here the ADC shortlist (RerankFactor
    * · topK per query) re-ranks by EXACT fixed-point distance against
    * the persisted day-0 [[vectorsStore]] plus the in-flight batch's
    * own vectors — so daily ingest gets BOTH: no corpus re-read,
    * re-residualization or retraining per cycle, AND the re-ranked
    * recall (measured ≡ the probe ceiling, ScaleStudy incpqrecall).
    * Per-cycle cost adds one |queries|·shortlist-row join against the
    * ccell-bucketed vectors store. (q_id, rnk, c_id, d2).
    */
  def incrementalRerankTopK(spark: SparkSession, dir: String, topK: Int = 3,
                            nProbe: Int = ProductQuantization.NProbe,
                            coarseK: Int = ProductQuantization.CoarseK,
                            shortlist: Int = 0): DataFrame = {
    graft.functions.ArrayExpressions.register(spark)
    val l = if (shortlist > 0) shortlist else ProductQuantization.RerankFactor * topK
    val coarse = spark.table(coarseStore(spark, dir, coarseK))
    val cb = spark.table(codebookStore(spark, dir, coarseK))
    val stored = spark.table(codesStore(spark, dir, coarseK))
    val storedVecs = spark.table(vectorsStore(spark, dir, coarseK))
    val pts = cycleSlice(spark, dir, coarse)
    // ONE batch assignment feeds both the PQ encode (residual view) and
    // the re-rank side (original-vector view) — home cells cannot drift
    val aBatch = assigned(pts.filter(isBatchVec(col("vec_id"))), coarse).ckpt()
    val adc = mergedAdcScores(pts, coarse, cb,
      Seq(stored, codesOf(residualOf(aBatch), cb)), nProbe)
    rerank(adc, l, topK, Seq(storedVecs, vecsOf(aBatch)), pts)
  }

  /** PRODUCTION DEFAULT incremental ANN entry point — the sized IVFADC-R
    * geometry ([[ProductQuantization.sizedCoarseK]] √n lists probed at
    * [[ProductQuantization.SizedNProbe]]) against frozen stores with
    * exact re-rank. The geometry is a property of the STORES (their
    * tags embed coarseK; a re-size retires and rebuilds them), so the
    * sizing count is paid exactly once, when [[sizedGeometryStore]]
    * first builds for the fixture stamp; every later call — this JVM or
    * another — reads the built geometry back from the catalog (a 1-row
    * store read), never re-counting the corpus on the path whose whole
    * argument is "never touch the corpus per cycle" (r19 verdict item 1).
    */
  def incrementalRerankTopKSized(spark: SparkSession, dir: String, topK: Int = 3,
                                 nProbe: Int = ProductQuantization.SizedNProbe): DataFrame =
    incrementalRerankTopK(spark, dir, topK, nProbe, sizedGeometry(spark, dir))

  /** The coarse geometry the sized entry points use for `dir`'s stores —
    * √(day-0 training slice), read from the persisted geometry catalog
    * ([[sizedGeometryStore]]); the corpus-scaled count runs only on the
    * catalog's cold build. Exposed so [[graft.ScaleStudy]] can name (and
    * afterwards retire) the exact store tags the sized search builds.
    */
  private[graft] def sizedGeometry(spark: SparkSession, dir: String): Int =
    spark.table(sizedGeometryStore(spark, dir))
      .head.getAs[Number]("coarse_k").intValue()

  /** Idempotently persist the sized coarse geometry for `dir`'s stores
    * as a 1-row catalog table (coarse_k) keyed by the fixture stamp —
    * the geometry IS store metadata (every sized store tag embeds it),
    * so it lives in the same [[Bucketed.materializedBucketedTable]]
    * family as the stores themselves: cross-JVM cached, stale stamps
    * swept, a regenerated fixture re-derives it. The builder is the ONE
    * place the O(corpus) sizing count is paid; returns the table name
    * (exposed so [[graft.ScaleStudy]] retires it with the stores).
    */
  private[graft] def sizedGeometryStore(spark: SparkSession, dir: String): String =
    Bucketed.materializedBucketedTable(spark, "pqsz_" + DirTag.dirScope(dir) + "_",
      "pqsz_" + DirTag(dir, "embeddings"), "coarse_k", 1) {
      spark.range(1).select(lit(recountGeometry(spark, dir)).as("coarse_k"))
    }

  /** The direct √(day-0 training slice) derivation — an O(corpus) count.
    * Only [[sizedGeometryStore]]'s cold build pays it; kept callable so
    * the catalog-vs-recount equality is a pinned spec, not an assumption.
    */
  private[graft] def recountGeometry(spark: SparkSession, dir: String): Int = {
    graft.functions.ArrayExpressions.register(spark)
    ProductQuantization.sizedCoarseK(
      trainSlice(KMeans.quantizedPts(Tables.load(spark, dir, "embeddings"), spreadInput = false)).count())
  }

  /** The identical math with NO stores — model, lists and batch all
    * derived in one lineage. The store-vs-fresh restriction-equality
    * contract ([[IncrementalAnn]]'s x49 pattern): staleness or key drift
    * in the persisted stores cannot hide behind the hash gate, because
    * QueriesSpec pins `incrementalAdcTopK == freshAdcTopK` row for row.
    */
  def freshAdcTopK(emb: DataFrame, topK: Int = 3,
                   nProbe: Int = ProductQuantization.NProbe,
                   coarseK: Int = ProductQuantization.CoarseK,
                   exclude: Column = lit(false)): DataFrame = {
    val pts = KMeans.quantizedPts(emb, spreadInput = false).ckpt()
    val coarse = coarseOf(trainSlice(pts), coarseK).ckpt()
    val rTrain = residuals(trainSlice(pts), coarse).ckpt()
    val (cb0, _) = ProductQuantization.train(ProductQuantization.subPtsOf(rTrain))
    val cb = cb0.ckpt()
    // `exclude` (a predicate over c_id) models delete tombstones in the
    // no-store twin — the fresh side of the x117 tombstone contract
    val sides = Seq(codesOf(rTrain, cb), batchCodes(pts, coarse, cb))
      .map(_.filter(!exclude))
    adcSearch(pts, coarse, cb, sides, topK, nProbe)
  }

  /** [[incrementalRerankTopK]]'s identical math with NO stores — model,
    * lists, batch codes and BOTH re-rank vector sides derived in one
    * lineage. QueriesSpec pins `incrementalRerankTopK == freshRerankTopK`
    * row for row (the x49 restriction-equality contract, now covering
    * the fourth store too: staleness or home-cell drift in the persisted
    * vectors cannot hide behind the hash gate).
    */
  def freshRerankTopK(emb: DataFrame, topK: Int = 3,
                      nProbe: Int = ProductQuantization.NProbe,
                      coarseK: Int = ProductQuantization.CoarseK,
                      shortlist: Int = 0,
                      exclude: Column = lit(false)): DataFrame = {
    val l = if (shortlist > 0) shortlist else ProductQuantization.RerankFactor * topK
    val pts = KMeans.quantizedPts(emb, spreadInput = false).ckpt()
    val coarse = coarseOf(trainSlice(pts), coarseK).ckpt()
    val aTrain = assigned(trainSlice(pts), coarse).ckpt()
    val rTrain = residualOf(aTrain)
    val (cb0, _) = ProductQuantization.train(ProductQuantization.subPtsOf(rTrain))
    val cb = cb0.ckpt()
    val aBatch = assigned(pts.filter(isBatchVec(col("vec_id"))), coarse).ckpt()
    // `exclude` (a predicate over c_id) models delete tombstones on
    // BOTH the lists and the re-rank vectors — the x119 fresh twin
    val adc = mergedAdcScores(pts, coarse, cb,
      Seq(codesOf(rTrain, cb), codesOf(residualOf(aBatch), cb)).map(_.filter(!exclude)),
      nProbe)
    rerank(adc, l, topK,
      Seq(vecsOf(aTrain), vecsOf(aBatch)).map(_.filter(!exclude)), pts)
  }

  // ------------- multi-day maintenance: append / compact / delete -------------

  /** Multi-day ingest slices (x117): day d ∈ {1, 2} is
    * `vec_id % DayMod == DayRems(d-1)` with DayMod = 2·BatchMod and both
    * residues ≡ BatchRem (mod BatchMod) — i.e. the two days PARTITION
    * the x115 batch slice. That choice makes the frozen day-0 stores
    * correct by construction (the training slice already excludes both
    * days) and makes "incremental over day-0+1+2" have [[freshAdcTopK]]
    * — and therefore the x115 oracle SQL — as its ready-made
    * fresh-over-union twin.
    */
  val DayMod: Int = 2 * BatchMod
  val DayRems: Seq[Int] = Seq(BatchRem, BatchMod + BatchRem)

  def isDayVec(day: Int)(id: Column): Column = id % DayMod === DayRems(day - 1)

  /** The x117 tombstone set: day-0 vectors with `vec_id % BatchMod ==
    * DeleteRem` are deleted during maintenance (DeleteRem is in the
    * training residue classes — deletes target the STORED lists, which
    * is the case that exercises the compactor).
    */
  val DeleteRem = 1
  require(DeleteRem != BatchRem &&
    DeleteRem != ProductQuantization.QueryRem % BatchMod,
    "tombstones must target the stored day-0 slice")

  def isDeletedVec(id: Column): Column = id % BatchMod === DeleteRem

  /** Idempotently persist day `day`'s codes as a DELTA table in the
    * codes-store shape (bucketed by the list key); returns the table
    * name. Per append only the day slice is read ([[cycleSlice]]'s
    * hygiene); re-running a day is a catalog no-op — the q30
    * last-writer posture's idempotence half. Prefix embeds the day so
    * deltas COEXIST (the sweep retires only re-sized geometries of the
    * same day).
    */
  def dayCodesStore(spark: SparkSession, dir: String, day: Int,
                    coarseK: Int = ProductQuantization.CoarseK): String =
    Bucketed.materializedBucketedTable(spark, s"pqd${day}_" + DirTag.dirScope(dir) + "_",
      s"pqd${day}_" + DirTag(dir, "embeddings") + s"_k$coarseK", "ccell", StoreBuckets) {
      graft.functions.ArrayExpressions.register(spark)
      val coarse = spark.table(coarseStore(spark, dir, coarseK))
      val cb = spark.table(codebookStore(spark, dir, coarseK))
      val slice = cycleSlice(spark, dir, coarse, isDayVec(day)(col("vec_id")))
      codesOf(residuals(slice, coarse).ckpt(), cb)
    }

  /** Idempotently COMPACT the day-0 lists plus the day deltas up to
    * `days` into one re-bucketed generation; returns the table name.
    * Merge rule is the q30 CDC last-writer posture per (c_id, sub) —
    * the highest generation's code row wins (the day slices are
    * disjoint here, so this is armor against re-ingest, not a
    * correction) — and, with `withDeletes`, tombstoned ids drop out of
    * the lists entirely. However many deltas accumulated, the output is
    * ONE bucketed layout of [[StoreBuckets]] files (x42's compaction
    * contract: content identity, file count collapsed), so search-side
    * read amplification stays bounded across maintenance cycles.
    *
    * `dayStore` supplies the day deltas — defaults to the batch-built
    * [[dayCodesStore]]; the streaming ingest twin (x120,
    * [[graft.queries.StreamingQueries.streamingCompactedPq]]) passes its
    * stream-encoded day stores instead, with its own `variantTag` so the
    * stream-fed generation coexists with (and is spec-compared against)
    * the batch-fed one. The compactor itself is provider-blind: deltas
    * in the (c_id, ccell, sub, cell) shape compact identically however
    * they arrived — the seam that lets "stream all day, compact at
    * night" reuse the maintenance path unchanged.
    */
  def compactedCodesStore(spark: SparkSession, dir: String, days: Int = 2,
                          withDeletes: Boolean = false,
                          coarseK: Int = ProductQuantization.CoarseK,
                          dayStore: (SparkSession, String, Int, Int) => String = dayCodesStore,
                          variantTag: String = "g"): String = {
    val variant = s"$variantTag$days" + (if (withDeletes) "t" else "")
    Bucketed.materializedBucketedTable(spark, s"pq$variant" + "_" + DirTag.dirScope(dir) + "_",
      s"pq$variant" + "_" + DirTag(dir, "embeddings") + s"_k$coarseK", "ccell", StoreBuckets) {
      import org.apache.spark.sql.expressions.Window
      val base = spark.table(codesStore(spark, dir, coarseK)).withColumn("gen", lit(0))
      val all = (1 to days).foldLeft(base) { (acc, d) =>
        acc.unionByName(
          spark.table(dayStore(spark, dir, d, coarseK)).withColumn("gen", lit(d)))
      }
      val w = Window.partitionBy(col("c_id"), col("sub")).orderBy(col("gen").desc)
      val lastWriter = all.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn", "gen")
      if (withDeletes) lastWriter.filter(!isDeletedVec(col("c_id"))) else lastWriter
    }
  }

  /** Idempotently persist day `day`'s ORIGINAL vectors as a DELTA in
    * the vectors-store shape (c_id, ccell, cv), bucketed by the list
    * key; returns the table name. The re-rank side of a day append —
    * without it a compacted index can serve only plain-ADC recall
    * (x117); with it the multi-day index keeps the x116 refinement
    * path. Per append only the day slice is read.
    */
  def dayVectorsStore(spark: SparkSession, dir: String, day: Int,
                      coarseK: Int = ProductQuantization.CoarseK): String =
    Bucketed.materializedBucketedTable(spark, s"pqv${day}_" + DirTag.dirScope(dir) + "_",
      s"pqv${day}_" + DirTag(dir, "embeddings") + s"_k$coarseK", "ccell", StoreBuckets) {
      graft.functions.ArrayExpressions.register(spark)
      val coarse = spark.table(coarseStore(spark, dir, coarseK))
      val slice = cycleSlice(spark, dir, coarse, isDayVec(day)(col("vec_id")))
      vecsOf(assigned(slice, coarse))
    }

  /** Idempotently COMPACT the day-0 vectors store plus the day vector
    * deltas up to `days` into one re-bucketed generation — the q30
    * last-writer posture per c_id (a re-ingested vector's newest copy
    * wins), tombstones dropped with `withDeletes`; returns the table
    * name. [[StoreBuckets]] files out regardless of accumulated deltas,
    * the same x42 contract as [[compactedCodesStore]].
    */
  def compactedVectorsStore(spark: SparkSession, dir: String, days: Int = 2,
                            withDeletes: Boolean = false,
                            coarseK: Int = ProductQuantization.CoarseK): String = {
    val variant = s"w$days" + (if (withDeletes) "t" else "")
    Bucketed.materializedBucketedTable(spark, s"pq$variant" + "_" + DirTag.dirScope(dir) + "_",
      s"pq$variant" + "_" + DirTag(dir, "embeddings") + s"_k$coarseK", "ccell", StoreBuckets) {
      import org.apache.spark.sql.expressions.Window
      val base = spark.table(vectorsStore(spark, dir, coarseK)).withColumn("gen", lit(0))
      val all = (1 to days).foldLeft(base) { (acc, d) =>
        acc.unionByName(
          spark.table(dayVectorsStore(spark, dir, d, coarseK)).withColumn("gen", lit(d)))
      }
      val w = Window.partitionBy(col("c_id")).orderBy(col("gen").desc)
      val lastWriter = all.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn", "gen")
      if (withDeletes) lastWriter.filter(!isDeletedVec(col("c_id"))) else lastWriter
    }
  }

  /** x117: ADC top-k of the held-out queries against the COMPACTED
    * multi-day index. Per run ONLY the query slice is read — the model
    * comes from the frozen stores and every list entry (day-0 plus all
    * appended days, minus tombstones) from the compacted generation; no
    * per-run encode at all. With the default horizon (both days, no
    * deletes) the searched lists equal day-0 ∪ batch, so the surface
    * shares the x115 oracle — the compactor sits INSIDE the hash gate.
    */
  def compactedAdcTopK(spark: SparkSession, dir: String, topK: Int = 3,
                       nProbe: Int = ProductQuantization.NProbe,
                       coarseK: Int = ProductQuantization.CoarseK,
                       days: Int = 2, withDeletes: Boolean = false,
                       dayStore: (SparkSession, String, Int, Int) => String = dayCodesStore,
                       variantTag: String = "g"): DataFrame = {
    graft.functions.ArrayExpressions.register(spark)
    val coarse = spark.table(coarseStore(spark, dir, coarseK))
    val cb = spark.table(codebookStore(spark, dir, coarseK))
    val store = spark.table(
      compactedCodesStore(spark, dir, days, withDeletes, coarseK, dayStore, variantTag))
    val pts = cycleSlice(spark, dir, coarse, ProductQuantization.isQueryCol)
    adcSearch(pts, coarse, cb, Seq(store), topK, nProbe)
  }

  /** x119: the full-circle composition — the COMPACTED multi-day index
    * (x117) searched WITH exact re-ranking (x116): ADC over the
    * compacted lists, shortlist re-ranked against the compacted vectors
    * generation. Per run only the query slice is read; a production
    * deployment doing daily ingest + periodic compaction + deletes
    * keeps retrieval-grade recall through every maintenance cycle —
    * without this, compaction silently demoted the index to plain-ADC
    * ordering (~0.66 recall ceiling). Default horizon shares the x116
    * oracle (the lists and vectors equal day-0 ∪ batch), putting the
    * vector compactor inside the hash gate too.
    */
  def compactedRerankTopK(spark: SparkSession, dir: String, topK: Int = 3,
                          nProbe: Int = ProductQuantization.NProbe,
                          coarseK: Int = ProductQuantization.CoarseK,
                          days: Int = 2, withDeletes: Boolean = false,
                          shortlist: Int = 0): DataFrame = {
    graft.functions.ArrayExpressions.register(spark)
    val l = if (shortlist > 0) shortlist else ProductQuantization.RerankFactor * topK
    val coarse = spark.table(coarseStore(spark, dir, coarseK))
    val cb = spark.table(codebookStore(spark, dir, coarseK))
    val codes = spark.table(compactedCodesStore(spark, dir, days, withDeletes, coarseK))
    val vecs = spark.table(compactedVectorsStore(spark, dir, days, withDeletes, coarseK))
    val pts = cycleSlice(spark, dir, coarse, ProductQuantization.isQueryCol)
    val adc = mergedAdcScores(pts, coarse, cb, Seq(codes), nProbe)
    rerank(adc, l, topK, Seq(vecs), pts)
  }

  // ------------- streaming-ingest hooks (x118) -------------

  /** Encode one arriving micro-batch of raw (vec_id, embedding) rows
    * against the frozen broadcast model: quantize, dominant-dim gate
    * (`domSz` from the frozen coarse store), home-cell assign,
    * residualize, PQ-encode — (c_id, ccell, sub, cell). Pure per-vector
    * math: the output is independent of how rows fall into
    * micro-batches, which is what makes the streaming ingest twin
    * stateless ([[graft.queries.StreamingQueries]] x118).
    */
  private[graft] def encodeSlice(mb: DataFrame, coarse: DataFrame, cb: DataFrame,
                                 domSz: Int): DataFrame = {
    val q = mb.select(col("vec_id"),
        expr("transform(cast(embedding as array<double>), " +
          s"x -> cast(floor(x * cast(${KMeans.FixedPointScale} as double)) as double))").as("fv"))
      .filter(size(col("fv")) === domSz)
    codesOf(residuals(q, coarse), cb)
  }

  /** x115's merged search with the per-cycle batch codes supplied by
    * the caller — the seam the streaming ingest twin plugs its
    * stream-encoded codes into, so stream and batch share every stage
    * downstream of the encode.
    */
  private[graft] def searchWithBatchCodes(spark: SparkSession, dir: String,
                                          bCodes: DataFrame, topK: Int = 3,
                                          nProbe: Int = ProductQuantization.NProbe,
                                          coarseK: Int = ProductQuantization.CoarseK): DataFrame = {
    graft.functions.ArrayExpressions.register(spark)
    val coarse = spark.table(coarseStore(spark, dir, coarseK))
    val cb = spark.table(codebookStore(spark, dir, coarseK))
    val stored = spark.table(codesStore(spark, dir, coarseK))
    // queries ONLY: the batch is already encoded in `bCodes` — scanning
    // the batch slice here would be pure dead weight (r19 review)
    val pts = cycleSlice(spark, dir, coarse, ProductQuantization.isQueryCol)
    adcSearch(pts, coarse, cb, Seq(stored, bCodes), topK, nProbe)
  }

  /** The frozen model's pieces the streaming encode needs: (coarse
    * table, codebook table, dominant dim). The dim comes from the
    * frozen store itself — no corpus pass.
    */
  private[graft] def frozenModel(spark: SparkSession, dir: String,
                                 coarseK: Int = ProductQuantization.CoarseK): (DataFrame, DataFrame, Int) = {
    graft.functions.ArrayExpressions.register(spark)
    val coarse = spark.table(coarseStore(spark, dir, coarseK))
    val cb = spark.table(codebookStore(spark, dir, coarseK))
    val domSz = coarse.select(size(col("cc"))).head.getInt(0)
    (coarse, cb, domSz)
  }
}
