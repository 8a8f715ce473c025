package graft

/** Ad-hoc per-query profiler: runs the named SparkEntry queries `reps`
  * times each (same session config, warmup, and value-consuming evaluation
  * as [[Bench]], via [[BenchHarness]]) and prints every timing, so
  * regressions can be separated from JIT/ordering noise that a min-of-N
  * hides. Usage:
  *   sbt "runMain graft.Profile q10_json_extract x9_text_langid" \
  *     [-Dgraft.profile.reps=5]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object Profile {

  /** `--stages` collector: per-stage wall, task time and shuffle bytes,
    * so a slow query's seconds can be attributed to specific operators
    * (stage names carry the callsite). Guide §1: measure first.
    */
  private final class StageLog extends org.apache.spark.scheduler.SparkListener {
    final case class Row(id: Int, name: String, wallMs: Long, taskMs: Long,
                         shReadB: Long, shWriteB: Long, tasks: Int)
    val rows = new scala.collection.concurrent.TrieMap[Int, Row]()
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val wall = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(0L)
      val tm = si.taskMetrics
      rows(si.stageId) = Row(si.stageId, si.name.linesIterator.next(), wall,
        tm.executorRunTime,
        tm.shuffleReadMetrics.localBytesRead + tm.shuffleReadMetrics.remoteBytesRead,
        tm.shuffleWriteMetrics.bytesWritten, si.numTasks)
    }
    def report(): Unit = {
      val all = rows.values.toSeq.sortBy(-_.wallMs)
      val totW = all.map(_.wallMs).sum
      println(f"[stages] ${all.size} stages, sum-of-stage-wall ${totW / 1e3}%.2f s")
      all.take(40).foreach { r =>
        println(f"[stages] ${r.wallMs}%6d ms wall ${r.taskMs}%7d ms task ${r.tasks}%4d t " +
          f"shR ${r.shReadB / 1024}%8d KiB shW ${r.shWriteB / 1024}%8d KiB  s${r.id}%-5d ${r.name.take(110)}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.props.getOrElse("graft.profile.reps", "5").toInt
    // --explain: dump each query's formatted physical plan instead of
    // timing it — the plan-audit loop (pushdown reached the scan?
    // exchanges where expected? codegen spans wide?). An arg, not a
    // -D flag: sbt runMain forks, so sbt-side system properties never
    // reach this JVM.
    val explainFlag = args.contains("--explain")
    val stagesFlag = args.contains("--stages")
    // --no-ckpt (with --explain): disable every graft.ckpt so the dump
    // shows the full end-to-end plan instead of post-checkpoint stubs.
    // Plan-audit only — see the switch's scaladoc in graft.ckpt.
    val noCkptFlag = args.contains("--no-ckpt")
    val qArgs = args.toSeq.filterNot(a =>
      a == "--explain" || a == "--stages" || a == "--no-ckpt")
    val names = if (qArgs.nonEmpty) qArgs else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")

    val spark = BenchHarness.session("graft-profile")
    BenchHarness.warmup(spark)
    if (noCkptFlag) spark.conf.set("spark.graft.ckpt.disable", "true")
    val explain = explainFlag
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) {
        println(s"===== $name =====")
        fn(spark, sfDir).explain("formatted")
      } else if (stagesFlag) {
        // one warm run (codegen/JIT), then one instrumented run
        BenchHarness.consume(fn(spark, sfDir))
        val log = new StageLog
        spark.sparkContext.addSparkListener(log)
        val t0 = System.nanoTime()
        BenchHarness.consume(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        // listener bus is async; let the tail events drain
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(log)
        println(f"===== $name: $sec%.3f s =====")
        log.report()
      } else {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          BenchHarness.consume(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[profile] $name%-24s ${times.map(t => f"$t%.3f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
