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

  private val StoreBuckets = 8

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

  /** 1-NN home cell + residual of `slice` against the (frozen, broadcast)
    * coarse centroids: (vec_id, ccell, fv) with fv the residual — the
    * argmin partial-aggregates BEFORE the shuffle, exactly
    * `coarseParts`' corpus stage.
    */
  private def residuals(slice: DataFrame, coarse: DataFrame): DataFrame =
    slice.crossJoin(broadcast(coarse))
      .withColumn("d2c", expr(ProductQuantization.CoarseDist2))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2c"), col("ccell"), col("fv"), col("cc"))).as("m"))
      .select(col("vec_id"), col("m.ccell").as("ccell"),
        expr("zip_with(m.fv, m.cc, (x, y) -> x - y)").as("fv"))

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
      coarseOf(trainSlice(KMeans.quantizedPts(Tables.load(spark, dir, "embeddings"))),
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
      val pts = KMeans.quantizedPts(Tables.load(spark, dir, "embeddings"))
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
      val pts = KMeans.quantizedPts(Tables.load(spark, dir, "embeddings"))
      codesOf(residuals(trainSlice(pts), coarse).ckpt(), cb)
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
    val adc = codeSides.map { codes =>
      probeCells
        .join(codes, Seq("ccell"))
        .join(lut, Seq("q_id", "ccell", "sub", "cell"))
        .groupBy(col("q_id"), col("c_id"))
        .agg(sum(col("d2")).as("adc_d2"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_d2"), col("c_id"))
    adc.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("c_id"), col("adc_d2"))
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
    // ONLY the batch + query slices of the corpus are ever read on this
    // path (the stored lists carry everything else): the scan filters
    // BEFORE quantizing and ckpt'ing, and the dominant dim comes from
    // the frozen model itself (every stored coarse centroid is a
    // domDim-length vector) instead of quantizedPts' corpus-wide
    // histogram — either would be an O(corpus) pass per cycle
    val domDim = coarse.select(size(col("cc")).as("dom_sz")).limit(1)
    val pts = Tables.load(spark, dir, "embeddings")
      .filter(isBatchVec(col("vec_id")) || ProductQuantization.isQueryCol)
      .select(col("vec_id"),
        expr("transform(cast(embedding as array<double>), " +
          s"x -> cast(floor(x * cast(${KMeans.FixedPointScale} as double)) as double))").as("fv"))
      .join(broadcast(domDim), size(col("fv")) === col("dom_sz"))
      .drop("dom_sz")
      .ckpt()
    adcSearch(pts, coarse, cb, Seq(stored, batchCodes(pts, coarse, cb)), topK, nProbe)
  }

  /** The identical math with NO stores — model, lists and batch all
    * derived in one lineage. The store-vs-fresh restriction-equality
    * contract ([[IncrementalAnn]]'s x49 pattern): staleness or key drift
    * in the persisted stores cannot hide behind the hash gate, because
    * QueriesSpec pins `incrementalAdcTopK == freshAdcTopK` row for row.
    */
  def freshAdcTopK(emb: DataFrame, topK: Int = 3,
                   nProbe: Int = ProductQuantization.NProbe,
                   coarseK: Int = ProductQuantization.CoarseK): DataFrame = {
    val pts = KMeans.quantizedPts(emb).ckpt()
    val coarse = coarseOf(trainSlice(pts), coarseK).ckpt()
    val rTrain = residuals(trainSlice(pts), coarse).ckpt()
    val (cb0, _) = ProductQuantization.train(ProductQuantization.subPtsOf(rTrain))
    val cb = cb0.ckpt()
    val trainCodes = codesOf(rTrain, cb)
    adcSearch(pts, coarse, cb, Seq(trainCodes, batchCodes(pts, coarse, cb)), topK, nProbe)
  }
}
