package graft

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * (default sf0.1) and prints ONE JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}`.
  * Driver runs this per round → BENCH_r{N}.json (compared against
  * BASELINE.md).
  *
  * Timings consume every result value ([[BenchHarness.consume]]) — a
  * count()-style consumer lets column pruning skip the computed columns,
  * under-reporting exactly the expensive operators.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session("graft-bench")
    BenchHarness.warmup(spark)

    // One untimed warm run (codegen compile + JIT of this query's plan),
    // then two timed runs, report the min. Round 2 showed min-of-2 alone
    // still reports 2-5x cold-start numbers for cheap queries late in the
    // run (both timed runs hit compile/GC noise): q10/x9 "regressions"
    // reproduced only in the bench's own first iterations, never at steady
    // state. Queries run in sorted-name order — deterministic, so rounds
    // are comparable.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        BenchHarness.consume(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val sec = try { once(); math.min(once(), once()) }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1.0 }
      name -> sec
    }
    // Locale-pinned formatting: a comma-decimal default locale would emit
    // unparseable JSON and break the driver's round comparison.
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
