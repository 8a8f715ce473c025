package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-side recompression: non-splittable compressed text → Parquet.
  *
  * [[TaxiText.warnIfNotSplittable]] documents the physics (one `.gz`
  * text file = ONE input partition, reference report.pdf p.3); this is
  * the action the warning points at. A 100 TB drop of gzip'd text is not
  * something to scan in place every query — a scale-out engine runs ONE
  * single-threaded-per-file decompression pass at ingest and lands the
  * lines in a splittable columnar layout (Parquet + zstd pages), after
  * which every downstream scan parallelizes by row group and prunes by
  * column. Each input FILE is still one task on the way in (that bound
  * is the codec's, not ours — the pass parallelizes across files), paid
  * once instead of per query.
  *
  * '''Byte-identity contract''' (the x41/x42 fingerprint currency): the
  * output carries `(src_file, line_no, line)` with `line_no` the 0-based
  * position within its source file, so the original byte stream of every
  * file is exactly `concat(lines ORDER BY line_no, '\n')` (modulo the
  * final newline, recorded nowhere else by `spark.read.text` either —
  * the same normalization the reference's `TextInputFormat` applies).
  * [[fingerprint]] computes the order-SENSITIVE exact-integer digest
  *
  *   per file: (n_lines, Σ (line_no + 1) · h(line) mod 2^61,  Σ UTF-8 octets)
  *
  * with h = the md5-prefix integer idiom — addition is order-free so the
  * digest distributes, but the positional weight makes any reorder,
  * drop, duplicate, or edit move it. [[textToParquet]] returns the
  * digests of both sides; they must be equal row-for-row.
  */
object Recompress {

  private val Mod = (1L << 61) - 1

  /** Lines of a text source in file order: (src_file, line_no, line).
    * For non-splittable codecs each file IS one partition, so the
    * partition-local id is the in-file position; for splittable inputs
    * this still holds per split only when one file = one split, so the
    * reader pins one-file-one-partition via wholeTextFiles-equivalent
    * planning: `spark.read.text` with `maxPartitionBytes` effectively
    * unbounded for the pass (ingest reads each file once anyway).
    */
  private def readLines(spark: SparkSession, inPath: String): DataFrame = {
    // One file = one partition for the identity pass: a mid-file split
    // would restart the in-file ordering. Codec files are single-split
    // by physics; plain text is forced whole-file for the duration of
    // the read by pinning maxPartitionBytes (ingest reads each file
    // once anyway — this is not a query-path setting).
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    spark.conf.set(key, (1L << 40).toString)
    val lines = try {
      spark.read.text(inPath)
        .select(input_file_name().as("src_file"), col("value").as("line"),
          monotonically_increasing_id().as("mid"))
        .localCheckpoint() // pin rows + ids BEFORE the conf is restored
    } finally spark.conf.set(key, prev)
    // mid is ascending within a partition (= within a file here), so the
    // per-file rank over it is the 0-based in-file line position
    lines
      .withColumn("line_no",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("src_file"))
          .orderBy(col("mid"))).cast("long") - 1)
      .drop("mid")
  }

  /** Order-sensitive per-file digest of a (src_file, line_no, line)
    * relation: exact integer arithmetic only, so it hash-gates and
    * distributes (map-side combine; no collect, no global sort).
    */
  def fingerprint(lines: DataFrame): DataFrame =
    lines
      .select(col("src_file"), col("line_no"), col("line"),
        expr("conv(substring(md5(line), 1, 15), 16, 10)").cast("long").as("h"))
      // terms accumulate in DECIMAL(38,0) (exact, order-free, no int64
      // overflow at any line count that fits a file) and reduce mod 2^61-1
      // once at the end
      .groupBy(col("src_file"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr(s"cast(line_no + 1 as decimal(38,0)) * pmod(h, ${1L << 31})"))
          .as("dsum"),
        // octet_length, not length: length() counts CHARACTERS, which
        // understates on-disk size for any non-ASCII line (r16 ADVICE) —
        // the contract compares identically either way, but the reported
        // bytes_in/bytes_out should mean what they say
        sum(expr("octet_length(line)").cast("long")).as("n_bytes"))
      .select(col("src_file"), col("n_lines"),
        expr(s"cast(pmod(dsum, cast($Mod as decimal(38,0))) as bigint)").as("digest"),
        col("n_bytes"))

  /** The ingest pass: decompress-once → Parquet/zstd, then verify the
    * byte-identity contract by re-reading the landed copy. Returns one
    * row per source file with both digests and the match flag; `ok`
    * false on ANY file aborts the caller's pipeline.
    */
  def textToParquet(spark: SparkSession, inPath: String, outDir: String): DataFrame = {
    TaxiText.warnIfNotSplittable(spark, inPath) // the warning this answers
    // ONE decompression per input file (r16 verdict #6): readLines pins
    // its rows via localCheckpoint, so the landing write and the
    // input-side fingerprint read the SAME materialized pass instead of
    // re-inflating every .gz twice — at ingest scale the double
    // decompression was the one cost this tool exists to pay once. The
    // landed-side fingerprint below still re-reads the parquet from disk:
    // that independence IS the contract (it would catch a write-path
    // corruption a shared plan could mask).
    val lines = readLines(spark, inPath)
    lines
      .write.mode("overwrite")
      .option("compression", "zstd")
      .parquet(outDir)
    val in = fingerprint(lines)
      .withColumnRenamed("digest", "digest_in")
      .withColumnRenamed("n_lines", "lines_in")
      .withColumnRenamed("n_bytes", "bytes_in")
    // the landed copy preserves the ORIGINAL src_file as a data column,
    // so its fingerprint groups by the same key as the input side
    val out = fingerprint(spark.read.parquet(outDir)
        .select(col("src_file"), col("line_no"), col("line")))
      .withColumnRenamed("digest", "digest_out")
      .withColumnRenamed("n_lines", "lines_out")
      .withColumnRenamed("n_bytes", "bytes_out")
    in.join(out, Seq("src_file"))
      .withColumn("ok",
        col("digest_in") === col("digest_out") &&
          col("lines_in") === col("lines_out") &&
          col("bytes_in") === col("bytes_out"))
      .select("src_file", "lines_in", "lines_out", "digest_in", "digest_out",
        "bytes_in", "bytes_out", "ok")
      .orderBy("src_file")
  }

  /** CLI: `runMain graft.sources.Recompress <inPath> <outDir>` — prints
    * the per-file contract table and exits non-zero if any file failed.
    */
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Recompress <inPath> <outDir>")
    val spark = graft.BenchHarness.session("graft-recompress")
    val report = textToParquet(spark, args(0), args(1))
    val rows = report.collect()
    rows.foreach(r => println(r.mkString("\t")))
    val bad = rows.count(!_.getAs[Boolean]("ok"))
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
