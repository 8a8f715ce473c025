package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-contract smoke checks (VERDICT r9 next-step #2).
  *
  * The driver regenerates `/root/testdata` between rounds, and round 9
  * showed a silent encoding drift (events.ts nanos → micros) can take out
  * every events consumer at once. This suite fails FIRST and LOUDLY when
  * the fixture contract moves: every table must load and count at
  * sf0.001, and `events.ts` must come back as a TIMESTAMP instant after
  * loader normalization (whatever the on-disk encoding is).
  */
class FixtureContractSpec extends AnyFunSuite {
  private val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("every fixture table loads and is non-empty at sf0.001") {
    val counts = Tables.names.map { n =>
      n -> Tables.load(spark, dir, n).count()
    }
    val empty = counts.filter(_._2 == 0L)
    assert(empty.isEmpty, s"empty fixture tables: ${empty.map(_._1).mkString(", ")}")
  }

  test("events.ts normalizes to TIMESTAMP (epoch-UTC instant) regardless of on-disk encoding") {
    val events = Tables.load(spark, dir, "events")
    val dt = events.schema("ts").dataType
    assert(dt == TimestampType, s"events.ts loaded as $dt, expected TIMESTAMP — fixture encoding drifted? (TESTDATA.md contract)")
    // Values must be sane instants, not 1970-epoch garbage or wall-clock shifts:
    // the generator writes events inside the fixture's date range (~2023+).
    val row = events.selectExpr("min(ts) as lo", "max(ts) as hi").head()
    val lo = row.getTimestamp(0).toInstant
    val hi = row.getTimestamp(1).toInstant
    assert(lo.isAfter(java.time.Instant.parse("2000-01-01T00:00:00Z")),
      s"events.ts min=$lo — looks like a unit/precision mix-up in the loader")
    // Bound the OTHER direction too: micros read as seconds/millis inflate
    // instants far into the future and would pass a lower bound silently.
    assert(hi.isBefore(java.time.Instant.parse("2100-01-01T00:00:00Z")),
      s"events.ts max=$hi — looks like a unit/precision mix-up in the loader (inflated instants)")
  }

  test("oracle-critical column dtypes are pinned (drift here breaks oracles as silently as events.ts did)") {
    val want = Map(
      "embeddings" -> Map("vec_id" -> "bigint", "embedding" -> "array<float>"),
      "documents" -> Map("doc_id" -> "bigint", "text" -> "string", "source" -> "string", "n_chars" -> "bigint"),
      "orders" -> Map("o_orderkey" -> "bigint", "o_totalprice" -> "double", "o_orderdate" -> "timestamp_ntz"),
      "lineitem" -> Map("l_quantity" -> "double", "l_discount" -> "double", "l_shipdate" -> "timestamp_ntz"),
      "events" -> Map("event_id" -> "bigint", "user_id" -> "bigint", "value" -> "double", "props" -> "string"))
    val drift = for {
      (t, cols) <- want.toSeq
      schema = Tables.load(spark, dir, t).schema
      (c, dt) <- cols
      got = schema(c).dataType.simpleString if got != dt
    } yield s"$t.$c: expected $dt, loaded $got"
    assert(drift.isEmpty, "fixture dtype drift (update oracles + this contract together):\n  " + drift.mkString("\n  "))
  }

  test("registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, dir)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() == 1L, s"view $n not queryable")
    }
  }
}
