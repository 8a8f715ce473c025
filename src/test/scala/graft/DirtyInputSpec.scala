package graft

import graft.operators.{TaxiFsm, TaxiPosition}
import graft.queries.TaxiQueries
import graft.sources.TaxiText
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Drop-don't-fail contract under Spark 4's default ANSI mode: malformed
  * numerics/timestamps/arity must DROP rows, never abort the job
  * (the reference's posture, AirportTripsRevenue.java:155-195, made strict
  * here because plain ANSI casts throw).
  */
class DirtyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def writeTemp(name: String, lines: Seq[String]): String = {
    val d = Files.createTempDirectory(s"graft-$name")
    d.toFile.deleteOnExit()
    val f = d.resolve("data.txt")
    Files.write(f, String.join("\n", lines: _*).getBytes)
    f.toString
  }

  test("segments with non-numeric taxi, malformed timestamp, junk coords drop cleanly") {
    val good = "450,'2008-05-25 09:16:58',37.62131,-122.37896,'M','2008-05-25 09:18:00',37.63000,-122.37800,'M'"
    val goodEnd = "450,'2008-05-25 09:19:00',37.64000,-122.37800,'E','2008-05-25 09:20:00',37.64100,-122.37900,'E'"
    val path = writeTemp("dirty-segments", Seq(
      good,
      goodEnd,
      "abc,'2008-05-25 10:00:00',37.7,-122.4,'M','2008-05-25 10:01:00',37.7,-122.41,'M'", // taxi NaN
      "451,'2008-99-99 10:00:00',37.7,-122.4,'M','2008-05-25 10:01:00',37.7,-122.41,'M'", // bad ts
      "452,'2008-05-25 10:00:00',xx.x,-122.4,'M','2008-05-25 10:01:00',37.7,-122.41,'M'", // bad lat
      "453,'2008-05-25 10:00:00'",                                                        // arity
      ""))                                                                                // empty line
    val trips = TaxiQueries.reconstructTrips(spark, TaxiText.readSegments(spark, path)).collect()
    // only taxi 450's rows survive: one valid airport trip
    assert(trips.length == 1 && trips.head.taxi == 450)
    // half-valid rows contribute their valid halves (451/452's second halves
    // are clean M positions -> single-point trips, below min distance)
  }

  test("trips file with short rows and junk numerics drops them from q1") {
    val good = "450 1211706872.0 37.61799 -122.38607 1211707018.0 37.61611 -122.38888 true 0.327 4.06 2008-05-25"
    val path = writeTemp("dirty-trips", Seq(
      good,
      "451 1211706872.0 37.61799",                     // short row
      good.replace("37.61799", "not-a-number"),        // junk coordinate
      ""))
    val rows = TaxiQueries.q1(spark, path).collect()
    assert(rows.map(_.getLong(1)).sum == 1) // exactly the one good row binned
  }

  test("cross-midnight trip is dated by its START timestamp") {
    val sfo = (37.62131, -122.37896)
    def pos(tsS: String, ts: Double, dLat: Double, st: String) =
      TaxiPosition(1, ts, tsS, f"${sfo._1 + dLat}%.5f", f"${sfo._2}%.5f", st)
    val t0 = 1211759880.0 // 2008-05-25 23:58:00 UTC
    val trips = TaxiFsm.sessionize(Iterator(
      pos("2008-05-25 23:58:00", t0, 0.0, "M"),
      pos("2008-05-25 23:59:30", t0 + 90, 0.01, "M"),
      pos("2008-05-26 00:01:00", t0 + 180, 0.02, "M"),
      pos("2008-05-26 00:02:30", t0 + 270, 0.03, "E"))).toList
    assert(trips.size == 1)
    assert(trips.head.date == "2008-05-25") // start date, not stop date
    assert(trips.head.stopTime == t0 + 180)
  }

  test("x54/x56: degenerate embedding inputs — empty corpus, zero vectors, ragged twins") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.lshCosineNearDup(empty).collect().isEmpty)
    // zero vectors have no cosine to anything (NaN) and must drop, not abort;
    // ragged sizes never pair up (the sz join key)
    val mixed = Seq(
      (0L, Array(0f, 0f, 0f)),             // zero vector
      (1L, Array(1f, 2f, 3f)),
      (2L, Array(1f, 2f)),                 // ragged
      (3L, Array(0.9f, 2.1f, 3.1f)),
      (4L, Array.empty[Float])).toDF("vec_id", "embedding") // empty: slice(v,2,-1) territory — must drop, not abort
    val pairs = graft.operators.Similarity.lshCosineNearDup(mixed).collect()
    pairs.foreach(r => assert(!r.getDouble(2).isNaN))
    // the zero vector (and its zero twin) has no cosine to anything:
    // neither id may appear in any emitted pair
    val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains(0L) && !ids.contains(graft.operators.Similarity.PlantOffset))
    // the empty vector is dropped outright (no twin, no bucket, no pair)
    assert(!ids.contains(4L) && !ids.contains(4L + graft.operators.Similarity.PlantOffset))
    // the full-dim near-identical pair (1, 3) must be found
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L))
  }

  test("x55: short and empty documents fall below minShingles, never divide by zero") {
    import spark.implicits._
    val docs = Seq((0L, ""), (5L, "ab"), (10L, "abc"), (15L, "abcd")).toDF("doc_id", "text")
    // every doc has < 10 distinct trigrams -> no pairs, no ANSI aborts
    assert(graft.operators.Dedup.ngramContainmentPairs(docs, 5, 0.8).collect().isEmpty)
  }

  test("x67/x69: empty and degenerate documents — null scores, no ANSI aborts") {
    import spark.implicits._
    val docs = Seq((0L, ""), (1L, "a"), (2L, "zzzz"), (3L, "no vowl txt"))
      .toDF("doc_id", "text")
    val div = graft.operators.TextAnalysis.charDiversityStats(docs).collect()
    // empty doc: zero counts, NULL ratios (never 0/0)
    val empty = div.find(_.getLong(0) == 0L).get
    assert(empty.getLong(1) == 0L && empty.isNullAt(3) && empty.isNullAt(4))
    // single-char doc: top fraction 1.0, Simpson 0.0 exactly
    val single = div.find(_.getLong(0) == 1L).get
    assert(single.getDouble(3) == 1.0 && single.getDouble(4) == 0.0)
    val rep = div.find(_.getLong(0) == 2L).get
    assert(rep.getLong(2) == 1L && rep.getDouble(4) == 0.0)
    // x69 with no 'e' anywhere: decomposition is a no-op, lengths agree,
    // composed=false, restored_ok=true
    val norm = graft.operators.TextAnalysis.unicodeNormalizeAudit(docs).collect()
    norm.foreach { r =>
      // no 'e' in any row: decomposition is the identity end-to-end
      assert(r.getInt(1) == r.getInt(2) && r.getInt(2) == r.getInt(3))
      assert(!r.getBoolean(4) && r.getBoolean(5))
    }
  }

  test("x68: empty docs and empty prefixes never abort; self-pairs excluded") {
    import spark.implicits._
    val docs = Seq((0L, ""), (1L, ""), (2L, "w1 w2 w3"), (3L, "w1 w2 w3"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.editDistanceNearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // identical docs share every band and have distance 0; empty docs
    // hash identically too (simhash of [""]), distance 0 on empty prefixes
    assert(pairs.contains((2L, 3L, 0)) && pairs.contains((0L, 1L, 0)))
    pairs.foreach { case (a, b, l) => assert(a < b && l >= 0 && l <= 20) }
  }

  test("x57: empty document stream produces an empty dedup result") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-x57-empty")
    d.toFile.deleteOnExit()
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(d.resolve("documents.parquet").toString)
    assert(graft.queries.StreamingQueries.streamingSimhashDedup(spark, d.toString)
      .collect().isEmpty)
  }
}
