package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * (default sf0.1) and prints ONE JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}`.
  * Driver runs this per round → BENCH_r{N}.json (compared against
  * BASELINE.md).
  *
  * Timings consume every result value ([[BenchHarness.consume]]) — a
  * count()-style consumer lets column pruning skip the computed columns,
  * under-reporting exactly the expensive operators.
  *
  * Two measurement-hygiene mechanisms, added after rounds 12-13 showed the
  * recorded numbers being contaminated by machine contention rather than
  * plan changes (on bit-identical code, 8 rows drew 2-5x their same-tree
  * local bands in one draw and returned to band in the next):
  *
  *  - '''Re-draw guard''': each row is min-of-2 timed runs after a warm
  *    run; if that min still exceeds 2x the row's recorded steady-state
  *    band (`tools/bench_bands.json`, committed), the row is re-drawn up
  *    to twice more and the overall min is recorded. A genuine regression
  *    survives every draw; a contention spike does not.
  *  - '''Tail-safe output''': the capture that becomes BENCH_r{N}.json
  *    keeps only the LAST ~2000 chars of stdout, which decapitated the
  *    previous ~4.4 KB single line (both BENCH_r12 and _r13 record
  *    `"parsed": null` with 69-of-137-row tails). The final stdout line is
  *    now a ~1.6 KB compact form (leading-ID keys, 2-decimal seconds) that
  *    fits the tail buffer with margin even after sbt's trailing
  *    `[success]` line; the full-fidelity map (full names, 3 decimals,
  *    plus the short→full legend) is written to `bench_full.json` and
  *    printed earlier in the log.
  */
object Bench {

  /** Compact alias for the tail-limited driver line: the leading ID token
    * (`q1`, `x85`), plus the next token's initial where that alone
    * collides — only the q2 trio (q2a airport / q2d daily / q2t total).
    */
  def shortKey(name: String): String = {
    val t = name.split("_")
    if (t.length > 1 && t(0) == "q2") t(0) + t(1).head else t(0)
  }

  /** Steady-state per-row bands (seconds) from a committed local run.
    * Flat `{"name": sec, ...}` JSON; parsed with a regex so we need no
    * JSON dependency. Missing file → no re-draw guard (first bootstrap).
    */
  def loadBands(): Map[String, Double] = {
    val path = sys.env.getOrElse("SPARK_GRAFT_BANDS", "tools/bench_bands.json")
    try {
      val txt = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
      val re = """"([^"]+)"\s*:\s*(-?[0-9][0-9.eE+-]*)""".r
      re.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session("graft-bench")
    BenchHarness.warmup(spark)
    // Settle: the driver runs this right after a verify sweep whose JVM and
    // page cache are still draining; give the machine a beat before timing.
    System.gc()
    Thread.sleep(1500)

    val bands = loadBands()

    // One untimed warm run (codegen compile + JIT of this query's plan),
    // then two timed runs, report the min; re-draw on band breach (above).
    // Queries run in sorted-name order — deterministic, so rounds are
    // comparable.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        BenchHarness.consume(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val sec = try {
        once()
        var best = math.min(once(), once())
        val band = bands.getOrElse(name, Double.PositiveInfinity)
        var redraws = 0
        while (best > 2 * band && redraws < 2) {
          System.err.println(f"[bench] $name: $best%.3f s > 2x band $band%.3f s - re-draw")
          best = math.min(best, once())
          redraws += 1
        }
        best
      } catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1.0 }
      name -> sec
    }

    // Locale-pinned formatting: a comma-decimal default locale would emit
    // unparseable JSON and break the driver's round comparison.
    def num(v: Double, p: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${p}f", Double.box(v))
    val total = results.map(_._2).filter(_ >= 0).sum

    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + num(v, 3) }
      .mkString("{", ",", "}")
    val legend = results.map { case (k, _) => "\"" + shortKey(k) + "\":\"" + k + "\"" }
      .mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$fullQs,"legend":$legend,"sf":"$sfDir"}"""
    try Files.write(Paths.get("bench_full.json"), (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] bench_full.json: $e") }
    println(full)

    val compactQs = results.map { case (k, v) => "\"" + shortKey(k) + "\":" + num(v, 2) }
      .mkString("{", ",", "}")
    val sfName = Paths.get(sfDir).getFileName.toString
    // LAST line: must stay under the ~2 KB stdout tail (see scaladoc).
    println(s"""{"metric":"total","value":${num(total, 2)},"unit":"sec","queries":$compactQs,"sf":"$sfName"}""")
    spark.stop()
  }
}
