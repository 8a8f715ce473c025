package graft

import graft.operators.{TaxiFsm, TaxiPosition}
import graft.queries.TaxiQueries
import graft.sources.TaxiText
import graft.streaming.StreamingSessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TestGroupState
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("streaming sessionizer across micro-batches matches the batch FSM") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Fixture positions + a trailing E sentinel per taxi (closes any open
    // trip through the normal M->E path, so batch and stream agree without
    // relying on timeout flushes).
    val positions = TaxiQueries
      .segmentsToPositions(TaxiText.readSegments(spark, s"${TaxiQueries.FixtureDir}/segments.txt"))
      .withColumn("ts", graft.functions.Geo.tsToEpoch(org.apache.spark.sql.functions.col("tsS")))
      .select("taxi", "ts", "tsS", "latS", "longS", "status")
      .as[TaxiPosition]
      .collect()
      .sortBy(p => (p.taxi, p.tsS, p.latS, p.longS, p.status))
    // Sentinel event time must be ahead of the GLOBAL watermark (a per-taxi
    // last.ts+60 would be "late" for day-1 taxis once day-3 data advances
    // the watermark, and the stateful operator drops late input).
    val globalMax = positions.map(_.ts).max
    val sentinels = positions.map(_.taxi).distinct.map { taxi =>
      TaxiPosition(taxi, globalMax + 3600, "2008-05-29 00:00:00", "37.70000", "-122.40000", "E")
    }

    val expected = (positions ++ sentinels)
      .groupBy(_.taxi).toSeq.flatMap { case (_, ps) =>
        TaxiFsm.sessionize(ps.sortBy(p => (p.tsS, p.latS, p.longS, p.status)).iterator)
      }.map(_.toString).sorted

    val ms = MemoryStream[TaxiPosition]
    val q = StreamingSessionize.trips(spark, ms.toDS())
      .writeStream.format("memory").queryName("trips_out").outputMode("append").start()
    try {
      // Split chronologically into two micro-batches: open trips must carry
      // over in GroupState between batches.
      val (b1, b2) = positions.partition(_.tsS < "2008-05-26")
      ms.addData(b1.toIndexedSeq); q.processAllAvailable()
      ms.addData(b2.toIndexedSeq); q.processAllAvailable()
      ms.addData(sentinels.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("trips_out").as[graft.operators.TaxiTrip]
        .collect().map(_.toString).sorted.toSeq
      assert(got.size == expected.size, s"${got.size} != ${expected.size}")
      assert(got == expected)
    } finally q.stop()
  }

  test("event-time timeout flushes an idle taxi's open trip") {
    val sfo = (37.62131, -122.37896)
    def pos(t: Int, dLat: Double) = TaxiPosition(9, 1211673600.0 + t,
      f"2008-05-25 ${t / 3600}%02d:${(t % 3600) / 60}%02d:${t % 60}%02d",
      f"${sfo._1 + dLat}%.5f", f"${sfo._2}%.5f", "M")
    // Build state with an open airport trip via the normal path.
    var s = TaxiFsm.initialState
    Seq(pos(1000, 0.0), pos(1060, 0.01), pos(1120, 0.02)).foreach { p =>
      s = TaxiFsm.step(s, p)._1
    }
    assert(s.open)
    val timedOut = TestGroupState.create[TaxiFsm.State](
      optionalState = org.apache.spark.api.java.Optional.of(s),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(Long.MaxValue >> 1),
      hasTimedOut = true)
    val out = StreamingSessionize.sessionizeGroup(9, Iterator.empty, timedOut).toList
    assert(out.size == 1)
    assert(out.head.isAirport && out.head.taxi == 9)
    assert(timedOut.isRemoved)
  }
}
