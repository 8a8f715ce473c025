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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.props.getOrElse("graft.profile.reps", "5").toInt
    // --explain: dump each query's formatted physical plan instead of
    // timing it — the plan-audit loop (pushdown reached the scan?
    // exchanges where expected? codegen spans wide?). An arg, not a
    // -D flag: sbt runMain forks, so sbt-side system properties never
    // reach this JVM.
    val explainFlag = args.contains("--explain")
    val qArgs = args.toSeq.filterNot(_ == "--explain")
    val names = if (qArgs.nonEmpty) qArgs else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")

    val spark = BenchHarness.session("graft-profile")
    BenchHarness.warmup(spark)
    val explain = explainFlag
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) {
        println(s"===== $name =====")
        fn(spark, sfDir).explain("formatted")
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
