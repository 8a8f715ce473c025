package graft

import org.apache.spark.GraftCheckpointTestHook
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
  * `SparkContext.setCheckpointDir` is global with no public unsetter, so an
  * earlier revision of this suite depended on cross-suite registration
  * order (the local-mode test self-cancelled if any suite had flipped the
  * context first, and every LATER suite silently inherited reliable mode).
  * Both hazards are gone: each reliable-mode block runs inside
  * [[withReliableMode]], which restores the pristine context via the
  * test-classpath [[GraftCheckpointTestHook]] on exit, and the local-mode
  * test clears the dir up front instead of cancelling.
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

  private def collectRows(): Seq[(Long, Long)] =
    pipeline().collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))

  private def forceLocalMode(): Unit = {
    spark.conf.unset("spark.graft.checkpoint.dir")
    GraftCheckpointTestHook.clearCheckpointDir(spark.sparkContext)
  }

  /** Run `body` with reliable mode configured on `dir`, then ALWAYS restore
    * local mode — no later test or suite inherits the global flip.
    */
  private def withReliableMode[A](dir: java.io.File)(body: => A): A = {
    spark.conf.set("spark.graft.checkpoint.dir", dir.getAbsolutePath)
    try body finally forceLocalMode()
  }

  test("local mode (no checkpoint dir): rows computed through localCheckpoint") {
    forceLocalMode()
    assert(collectRows().size === 7)
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "local mode must not install a checkpoint dir")
  }

  test("reliable mode (spark.graft.checkpoint.dir): identical rows, blocks on disk") {
    forceLocalMode()
    val localRows = collectRows()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    dir.deleteOnExit()
    withReliableMode(dir) {
      val rows = collectRows()
      assert(spark.sparkContext.getCheckpointDir.isDefined,
        "ckpt must install the configured dir as the context checkpoint dir")
      assert(rows === localRows, "reliable and local modes must agree row-for-row")
      // reliable checkpoint leaves RDD block files under <dir>/<uuid>/rdd-N
      def walk(f: java.io.File): Iterator[java.io.File] =
        Iterator(f) ++ Option(f.listFiles()).iterator.flatten.flatMap(walk)
      assert(walk(dir).exists(f => f.isFile && f.getName.startsWith("part-")),
        s"expected checkpoint part files under $dir")
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "withReliableMode must restore the pristine context on exit")
  }

  test("reliable mode survives a second materialization with the dir still set") {
    forceLocalMode()
    val localRows = collectRows()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2").toFile
    dir.deleteOnExit()
    withReliableMode(dir) {
      assert(collectRows() === localRows)
      assert(collectRows() === localRows, "second materialization, dir still set")
    }
  }
}
