package graft

import graft.operators.{TaxiFsm, TaxiPosition}
import graft.queries.WindowedSessionize
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Cross-check: the windowed-SQL sessionization (declarative form) agrees
  * with the FSM operator on speed-outlier-free, tie-free inputs — the
  * domain where both semantics provably coincide (SURVEY.md §2.2 option b).
  */
class WindowedSessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def cleanStream(rnd: Random, taxi: Int): Seq[TaxiPosition] = {
    var t = 1211673600L + rnd.nextInt(600)
    var lat = 37.62131 + (rnd.nextDouble() - 0.5) * 0.01
    var long = -122.37896 + (rnd.nextDouble() - 0.5) * 0.01
    (0 until 40 + rnd.nextInt(40)).map { _ =>
      t += 40 + rnd.nextInt(50) + (if (rnd.nextInt(12) == 0) 300 else 0) // occasional gap split
      lat += (rnd.nextDouble() - 0.5) * 0.008 // <= ~0.9 km per >= 40 s: far below 180 km/h
      long += (rnd.nextDouble() - 0.5) * 0.008
      val st = if (rnd.nextInt(4) == 0) "E" else "M"
      val h = (t % 86400) / 3600; val m = (t % 3600) / 60; val s = t % 60
      TaxiPosition(taxi, t.toDouble, f"2008-05-25 $h%02d:$m%02d:$s%02d",
        f"$lat%.5f", f"$long%.5f", st)
    }
  }

  test("windowed SQL == FSM on clean streams (50 random taxis)") {
    import spark.implicits._
    val rnd = new Random(17)
    val all = (1 to 50).flatMap(taxi => cleanStream(rnd, taxi))
    val df = all.toDF()

    val viaWindow = WindowedSessionize.trips(df)
      .collect()
      .map(r => (r.getAs[Int]("taxi"), r.getAs[Double]("startTime"), r.getAs[Double]("stopTime"),
        r.getAs[String]("startLat"), r.getAs[String]("stopLat"),
        r.getAs[Double]("distanceKm"), r.getAs[String]("date")))
      .sortBy(t => (t._1, t._2))

    val viaFsm = all.groupBy(_.taxi).toSeq.flatMap { case (_, ps) =>
      TaxiFsm.sessionize(ps.sortBy(p => (p.tsS, p.latS, p.longS, p.status)).iterator)
    }.map(t => (t.taxi, t.startTime, t.stopTime, t.startLat, t.stopLat, t.distanceKm, t.date))
      .sortBy(t => (t._1, t._2))

    assert(viaWindow.length == viaFsm.length,
      s"windowed ${viaWindow.length} != fsm ${viaFsm.length}")
    viaWindow.zip(viaFsm).foreach { case (w, f) =>
      assert(w._1 == f._1 && w._2 == f._2 && w._3 == f._3 && w._4 == f._4 && w._5 == f._5)
      assert(math.abs(w._6 - f._6) < 1e-9, s"distance ${w._6} vs ${f._6}")
      assert(w._7 == f._7)
    }
  }
}
