package graft

import graft.operators.{TaxiFsm, TaxiPosition}
import graft.queries.TaxiQueries
import graft.sources.TaxiText
import graft.streaming.{GapEvent, GapSession, StreamingGapSessionize, StreamingSessionize}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState
import org.scalatest.funsuite.AnyFunSuite

/** Event row for the x36 MemoryStream feed (top-level for a stable
  * product encoder).
  */
case class FtEvent(user_id: Long, us: Long, event_id: Long, cents: Long)

/** Event row for the x39 restart feed (top-level for a stable encoder). */
case class JEvent(user_id: Long, us: Long, event_id: Long, event_type: String)

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

  test("x47: file-spool streaming FSM daily revenue equals the batch q2_daily") {
    // the driver-visible row end to end: spool replay + sentinels +
    // flatMapGroupsWithState + daily aggregation == the batch trio's result
    val got = graft.queries.StreamingQueries.streamingTaxiDaily(spark)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = TaxiQueries.q2Daily(spark)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty)
    assert(got == want, s"stream=$got vs batch=$want")
  }

  test("checkpoint restart: taxi-FSM streaming sessionizer restores open trips") {
    import spark.implicits._
    import java.nio.file.Files
    // x47's recovery contract: kill the query at a day boundary (open
    // trips for every active taxi live in the GroupState store), start a
    // NEW query from the same checkpoint, deliver the rest + sentinels —
    // the union of outputs must equal the batch truth with no duplicates.
    val positions = TaxiQueries
      .segmentsToPositions(TaxiText.readSegments(spark, s"${TaxiQueries.FixtureDir}/segments.txt"))
      .withColumn("ts", graft.functions.Geo.tsToEpoch(col("tsS")))
      .select("taxi", "ts", "tsS", "latS", "longS", "status")
      .as[TaxiPosition]
      .collect()
      .sortBy(p => (p.tsS, p.latS, p.longS, p.status))
    val globalMax = positions.map(_.ts).max
    val sentinels = positions.map(_.taxi).distinct.map { taxi =>
      TaxiPosition(taxi, globalMax + 3600, "2008-05-29 00:00:00", "37.70000", "-122.40000", "E")
    }
    val expected = (positions ++ sentinels).groupBy(_.taxi).toSeq.flatMap { case (_, ps) =>
      TaxiFsm.sessionize(ps.sortBy(p => (p.tsS, p.latS, p.longS, p.status)).iterator)
    }.map(_.toString).sorted

    val (a, b) = positions.partition(_.tsS < "2008-05-26")
    assert(a.nonEmpty && b.nonEmpty, "cut must straddle the fixture")
    val root = Files.createTempDirectory("graft_taxi_restart")
    val feed = root.resolve("feed"); Files.createDirectories(feed)
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val posSchema = org.apache.spark.sql.Encoders.product[TaxiPosition].schema
    val mtimeBase = System.currentTimeMillis() - 1000L * 3600
    def addFile(idx: Int, ps: Seq[TaxiPosition]): Unit = {
      val tmp = root.resolve(s"w$idx")
      ps.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part = try listing.filter(_.getFileName.toString.startsWith("part-"))
        .findFirst.get finally listing.close()
      val dest = feed.resolve(f"file-$idx%03d.parquet")
      Files.move(part, dest)
      require(dest.toFile.setLastModified(mtimeBase + idx * 1000L))
    }
    def startQuery() = StreamingSessionize.trips(spark,
        spark.readStream.schema(posSchema).option("maxFilesPerTrigger", "1")
          .parquet(feed.toString).as[TaxiPosition])
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // phase 1: days 1-2, then KILL — open trips are in the state store
    addFile(0, a.toIndexedSeq)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2: fresh query, same checkpoint; rest + flush sentinels
    addFile(1, b.toIndexedSeq)
    addFile(2, sentinels.toIndexedSeq)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir).as[graft.operators.TaxiTrip]
      .collect().map(_.toString).sorted.toSeq
    assert(got.size == got.distinct.size, "restart duplicated trips")
    assert(got == expected)
  }

  test("gap sessionizer: disordered input matches batch; beyond-watermark row drops") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // 12 users x 3 session waves (2 h apart, gap 30 min), 1-5 events per
    // session 5 min apart — so within-batch disorder (minutes) stays well
    // inside the 30-minute watermark delay.
    val gapUs = 1800L * 1000000L
    val waveUs = 7200L * 1000000L
    val base = 1700000000L * 1000000L
    val rng = new scala.util.Random(4)
    val events = (for {
      u <- 1 to 12
      w <- 0 until 3
      e <- 0 until (1 + rng.nextInt(5))
    } yield GapEvent(u.toLong, base + w * waveUs + e * 300L * 1000000 + u * 1000L,
      (u * 100 + e).toLong)).toVector

    // Batch truth from the SAME machinery q8 ships (GapSessionize.assign),
    // so stream==batch is checked against the oracled operator, not a
    // reimplementation.
    val expected = {
      val assigned = graft.operators.GapSessionize.assign(
        events.toDF(), col("user_id"), col("us"), gapUs, col("cents"))
      assigned.groupBy(col("user_id"), col("session_id"))
        .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
          count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
        .select("user_id", "start_us", "end_us", "n_events", "total_cents")
        .as[GapSession].collect().sortBy(s => (s.user_id, s.start_us)).toSeq
    }

    // One micro-batch per wave, SHUFFLED within the batch; additionally the
    // two globally-latest events of waves 0 and 1 are held back and
    // delivered one batch late (older than everything around them — genuine
    // cross-batch disorder, still newer than the watermark).
    val waves = (0 until 3).map { w =>
      events.filter(e => (e.us - base) / waveUs == w).sortBy(_.us)
    }
    val batches = Seq(
      rng.shuffle(waves(0).dropRight(2)),
      rng.shuffle(waves(1).dropRight(2) ++ waves(0).takeRight(2)),
      rng.shuffle(waves(2) ++ waves(1).takeRight(2)))

    val ms = MemoryStream[GapEvent]
    val q = StreamingGapSessionize.sessions(spark, ms.toDS(), gapUs)
      .writeStream.format("memory").queryName("gap_disorder_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      // By now the watermark sits ~30 min behind wave 2 (base + 4 h), so an
      // event back at `base` is late beyond the watermark: the stateful
      // operator must drop it BEFORE it reaches user state. Fresh user id,
      // so if it leaked through it would surface as a flushed session.
      ms.addData(GapEvent(999L, base, 1L)); q.processAllAvailable()
      // Far-future sentinel advances the watermark past every open
      // session's timeout, flushing them (the x26 pattern).
      ms.addData(GapEvent(-1L, base + 100L * 3600 * 1000000, 0L)); q.processAllAvailable()

      val all = spark.table("gap_disorder_out").as[GapSession].collect()
      assert(!all.exists(_.user_id == 999L), "beyond-watermark event must be dropped")
      val got = all.filter(_.user_id >= 0).sortBy(s => (s.user_id, s.start_us)).toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("checkpoint restart: file-stream sessionizer resumes exactly-once") {
    import spark.implicits._
    import java.nio.file.Files
    // The recovery contract x26's checkpoint dir merely configures: kill
    // the query mid-stream, start a NEW query from the same checkpoint,
    // deliver the rest, and the union of outputs must equal the batch
    // truth with no duplicates. State restoration is exercised for real:
    // two events of the pre-stop wave are held back and delivered only
    // AFTER the restart, so their sessions are open in the state store at
    // the kill point and must be restored, extended, and flushed by the
    // second query.
    implicit val enc: org.apache.spark.sql.Encoder[GapEvent] = org.apache.spark.sql.Encoders.product[GapEvent]
    val gapUs = 1800L * 1000000L
    val waveUs = 7200L * 1000000L
    val base = 1700000000L * 1000000L
    val rng = new scala.util.Random(11)
    val events = (for {
      u <- 1 to 8
      w <- 0 until 3
      e <- 0 until (1 + rng.nextInt(4))
    } yield GapEvent(u.toLong, base + w * waveUs + e * 300L * 1000000 + u * 1000L,
      (u * 10 + e).toLong)).toVector

    val expected = {
      val assigned = graft.operators.GapSessionize.assign(
        events.toDF(), col("user_id"), col("us"), gapUs, col("cents"))
      assigned.groupBy(col("user_id"), col("session_id"))
        .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
          count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
        .select("user_id", "start_us", "end_us", "n_events", "total_cents")
        .as[GapSession].collect().sortBy(s => (s.user_id, s.start_us)).toSeq
    }

    val waves = (0 until 3).map { w =>
      events.filter(e => (e.us - base) / waveUs == w).sortBy(_.us)
    }
    val root = Files.createTempDirectory("graft_restart")
    val feed = root.resolve("feed"); Files.createDirectories(feed)
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val mtimeBase = System.currentTimeMillis() - 1000L * 3600
    def addFile(idx: Int, evs: Seq[GapEvent]): Unit = {
      val tmp = root.resolve(s"w$idx")
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part = try listing.filter(_.getFileName.toString.startsWith("part-"))
        .findFirst.get finally listing.close()
      val dest = feed.resolve(f"file-$idx%03d.parquet")
      Files.move(part, dest)
      require(dest.toFile.setLastModified(mtimeBase + idx * 1000L))
    }
    def startQuery() = StreamingGapSessionize.sessions(spark,
        spark.readStream.schema(enc.schema).option("maxFilesPerTrigger", "1")
          .parquet(feed.toString).as[GapEvent], gapUs)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // phase 1: waves 0 and 1, then KILL the query
    addFile(0, waves(0))
    addFile(1, waves(1).dropRight(2)) // hold the 2 latest wave-1 events back
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: fresh query, same checkpoint; stragglers + wave 2 + sentinel
    addFile(2, waves(2) ++ waves(1).takeRight(2))
    addFile(3, Seq(GapEvent(-1L, base + 100L * 3600 * 1000000, 0L)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val all = spark.read.parquet(outDir).as[GapSession].collect()
    assert(all.length == all.distinct.length, "restart duplicated output rows")
    val got = all.filter(_.user_id >= 0).sortBy(s => (s.user_id, s.start_us)).toSeq
    assert(got == expected)
  }

  test("checkpoint restart: stream-stream join resumes with buffered state") {
    import spark.implicits._
    import java.nio.file.Files
    // The pairs can ONLY come from recovered state: every click is
    // delivered before the kill, every purchase after the restart — if
    // the second query lost the buffered click side, the join would emit
    // nothing (or, with a corrupt offset log, duplicates).
    implicit val enc: org.apache.spark.sql.Encoder[JEvent] = org.apache.spark.sql.Encoders.product[JEvent]
    val base = 1700000000L * 1000000L
    val clicks = (1 to 4).map(u =>
      JEvent(u.toLong, base + u * 1000000L, 100L + u, "click"))
    val purchases = (1 to 4).map(u =>
      JEvent(u.toLong, base + u * 1000000L + 60L * 1000000, 200L + u, "purchase")) :+
      JEvent(1L, base + 7200L * 1000000, 299L, "purchase") // outside the 30-min window

    val root = Files.createTempDirectory("graft_join_restart")
    val feed = root.resolve("feed"); Files.createDirectories(feed)
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val mtimeBase = System.currentTimeMillis() - 1000L * 3600
    def addFile(idx: Int, evs: Seq[JEvent]): Unit = {
      val tmp = root.resolve(s"w$idx")
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part = try listing.filter(_.getFileName.toString.startsWith("part-"))
        .findFirst.get finally listing.close()
      val dest = feed.resolve(f"file-$idx%03d.parquet")
      Files.move(part, dest)
      require(dest.toFile.setLastModified(mtimeBase + idx * 1000L))
    }
    def startQuery() = graft.queries.StreamingQueries.intervalJoinStream(
        spark.readStream.schema(enc.schema).option("maxFilesPerTrigger", "1")
          .parquet(feed.toString), 1800L)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // phase 1: clicks only, then KILL
    addFile(0, clicks)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2: fresh query, same checkpoint; purchases arrive now
    addFile(1, purchases)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val all = spark.read.parquet(outDir)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("p_us") - col("click_us")).as("delta_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(all.length == all.distinct.length, "restart duplicated join output")
    assert(all.sorted == (1 to 4).map(u => (u.toLong, 100L + u, 200L + u, 60L * 1000000)),
      s"recovered join state did not produce the expected pairs: $all")
  }

  test("x50 outer join: streamed set equals the batch left join; unmatched clicks DO emit nulls") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.StreamingQueries.intervalJoinOuter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("cus"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("us").as("pus"), col("event_id").as("purchase_id"))
    val want = clicks.join(purchases,
        col("user_id") === col("pu") && col("pus") >= col("cus") &&
          col("pus") <= col("cus") + 1800L * 1000000L, "left")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("pus") - col("cus")).as("delta_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == want,
      s"stream != batch left join: only-stream=${(got -- want).take(3)}, only-batch=${(want -- got).take(3)}")
    assert(got.exists(_._3.isEmpty), "fixture has no unmatched clicks — outer path untested")
    assert(got.exists(_._3.nonEmpty), "fixture has no matched clicks — inner path untested")
  }

  test("x36 first touch: adversarial (reversed) arrival order still yields the batch first event") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[FtEvent].collect()
    // Feed NEWEST-first across three micro-batches: dropDuplicates-style
    // first-ARRIVAL state would keep the newest event; the commutative
    // min-struct state must still converge to the true first.
    val batches = events.sortBy(e => (-e.us, -e.event_id))
      .grouped((events.length + 2) / 3).toSeq
    val ms = MemoryStream[FtEvent]
    val q = graft.queries.StreamingQueries.firstTouchAgg(ms.toDS().toDF())
      .writeStream.format("memory").queryName("ft_adversarial").outputMode("update").start()
    try {
      batches.foreach { b => ms.addData(b.toIndexedSeq); q.processAllAvailable() }
      val got = graft.queries.StreamingQueries.firstTouchFinal(spark.table("ft_adversarial"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = events.groupBy(_.user_id).map { case (u, es) =>
        val f = es.minBy(e => (e.us, e.event_id)); (u, f.us, f.event_id)
      }.toSet
      assert(got == expected)
    } finally { q.stop(); spark.catalog.dropTempView("ft_adversarial") }
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

  test("x57: streaming simhash dedup equals the batch banded-pair set reduced to first match") {
    val dir = "/root/testdata/sf0.01"
    val got = graft.queries.StreamingQueries.streamingSimhashDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // batch twin: x25's verified pairs, each doc reduced to its minimum
    // prior match (hamming is a pure function of the chosen pair)
    val want = graft.operators.Dedup
      .simhashNearDupPairs(Tables.load(spark, dir, "documents"))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
      .groupBy(_._2).map { case (b, rs) =>
        val best = rs.minBy(_._1); (b, best._1, best._3)
      }.toSet
    assert(want.nonEmpty, "fixture should contain Hamming<=3 simhash pairs")
    assert(got == want, s"stream (${got.size}) != batch reduction (${want.size})")
  }

  test("x57 group logic: within-batch disorder sorted, min prior id wins, state accumulates") {
    import graft.streaming.{BandDoc, BucketState, DupHit, SimEntry, StreamingSimhashDedup}
    val st = TestGroupState.create[BucketState](
      optionalState = org.apache.spark.api.java.Optional.of(
        BucketState(Vector(SimEntry(1L, 0x00L), SimEntry(2L, 0xFFL)))),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // delivered disordered (7, 4, 6); processing must sort to 4, 6, 7:
    //  - 4 (0x01) matches prior 1 (hamming 1), not 2 (hamming 7)
    //  - 6 (0xFE) matches prior 2 (hamming 1); 4 is hamming 8 away
    //  - 7 (0x00) matches 1 exactly — min id 1 wins even though 4 also
    //    sits at hamming 1
    val out = StreamingSimhashDedup.dedupGroup(0L,
      Iterator(BandDoc(0L, 7L, 0x00L), BandDoc(0L, 4L, 0x01L), BandDoc(0L, 6L, 0xFEL)), st).toList
    assert(out == List(DupHit(4L, 1L, 1), DupHit(6L, 2L, 1), DupHit(7L, 1L, 0)))
    assert(st.get.docs.map(_.doc_id).sorted == Seq(1L, 2L, 4L, 6L, 7L))
  }
}
