package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two modes of [[graft.ckpt]] — the fault-tolerance switch every
  * corpus-scale materialization routes through:
  *
  *  - no checkpoint dir configured → `localCheckpoint` path (executor-local
  *    blocks, the local-dev/bench default);
  *  - `spark.graft.checkpoint.dir` set → reliable `checkpoint()` path:
  *    blocks written under the configured directory, so on a real cluster a
  *    lost executor recomputes from fault-tolerant storage instead of
  *    killing the job.
  *
  * Both modes must produce IDENTICAL rows for the same plan — the switch is
  * a durability posture, never a semantics change.
  *
  * NOTE: `SparkContext.setCheckpointDir` is global and has no unsetter, so
  * the local-mode test runs first (ScalaTest runs a suite's tests in
  * registration order) and later suites simply inherit reliable mode with a
  * temp dir — identical results by this very contract, at test-scale IO
  * cost.
  */
class CheckpointSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** A small plan with a shuffle on both sides of the ckpt, so lineage
    * truncation is actually exercised rather than a pass-through.
    */
  private def pipeline(): org.apache.spark.sql.DataFrame = {
    val base = spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).as("k"), (col("id") * 31 % 101).as("v"))
    val mid = ckpt(base.groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n")))
    mid.select(col("k"), (col("sv") + col("n")).as("score")).orderBy("k")
  }

  private var localRows: Seq[(Long, Long)] = Seq.empty

  test("local mode (no checkpoint dir): rows computed through localCheckpoint") {
    if (spark.sparkContext.getCheckpointDir.isDefined)
      cancel("checkpoint dir already set by an earlier suite; local mode untestable here")
    localRows = pipeline().collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(localRows.size === 7)
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "local mode must not install a checkpoint dir")
  }

  test("reliable mode (spark.graft.checkpoint.dir): identical rows, blocks on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    dir.deleteOnExit()
    spark.conf.set("spark.graft.checkpoint.dir", dir.getAbsolutePath)
    val rows = pipeline().collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(spark.sparkContext.getCheckpointDir.isDefined,
      "ckpt must install the configured dir as the context checkpoint dir")
    if (localRows.nonEmpty)
      assert(rows === localRows, "reliable and local modes must agree row-for-row")
    // reliable checkpoint leaves RDD block files under <dir>/<uuid>/rdd-N
    def walk(f: java.io.File): Iterator[java.io.File] =
      Iterator(f) ++ Option(f.listFiles()).iterator.flatten.flatMap(walk)
    assert(walk(dir).exists(f => f.isFile && f.getName.startsWith("part-")),
      s"expected checkpoint part files under $dir")
  }

  test("reliable mode survives a second materialization with the dir still set") {
    val rows = pipeline().collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    if (localRows.nonEmpty) assert(rows === localRows)
  }
}
