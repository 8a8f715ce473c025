package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: runs the named SparkEntry queries `reps`
  * times each (after the same warmup Bench uses) and prints every timing,
  * so regressions can be separated from JIT/ordering noise that a
  * min-of-2 hides. Usage:
  *   sbt "runMain graft.Profile q10_json_extract x9_text_langid" \
  *     [-Dgraft.profile.reps=5]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.props.getOrElse("graft.profile.reps", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-24s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
