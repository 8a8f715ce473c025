package graft

import graft.functions.GeoMath
import graft.operators.{TaxiFsm, TaxiPosition}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties of the sessionization FSM over randomized position
  * streams (SURVEY.md §5.4).
  */
object FsmProperties extends Properties("TaxiFsm") {

  private val sfo = (GeoMath.SfoLat, GeoMath.SfoLong)

  private def mkPos(taxi: Int, t: Long, lat: Double, long: Double, status: String) = {
    val ts = 1211673600L + t
    val h = (t / 3600) % 24; val m = (t % 3600) / 60; val s = t % 60
    TaxiPosition(taxi, ts.toDouble, f"2008-05-25 $h%02d:$m%02d:$s%02d",
      f"$lat%.5f", f"$long%.5f", status)
  }

  /** A plausible per-taxi stream: mostly small moves at 40-90 s intervals,
    * occasional big gaps, teleports, and status flips.
    */
  private val streamGen: Gen[List[TaxiPosition]] = for {
    taxi <- Gen.choose(1, 5)
    n <- Gen.choose(0, 60)
    steps <- Gen.listOfN(n, for {
      dt <- Gen.frequency(8 -> Gen.choose(40L, 90L), 1 -> Gen.choose(211L, 2000L))
      dLat <- Gen.frequency(9 -> Gen.choose(-60, 60).map(_ / 10000.0), 1 -> Gen.const(1.0))
      dLong <- Gen.choose(-60, 60).map(_ / 10000.0)
      st <- Gen.frequency(3 -> Gen.const("M"), 1 -> Gen.const("E"))
    } yield (dt, dLat, dLong, st))
  } yield {
    var t = 0L; var lat = sfo._1; var long = sfo._2
    steps.map { case (dt, dLat, dLong, st) =>
      t += dt; lat += dLat; long += dLong
      mkPos(taxi, t, lat, long, st)
    }
  }

  private def sorted(ps: List[TaxiPosition]) =
    ps.sortBy(p => (p.tsS, p.latS, p.longS, p.status))

  property("every emitted trip satisfies the emit contract") = Prop.forAll(streamGen) { ps =>
    TaxiFsm.sessionize(sorted(ps).iterator).forall { tr =>
      tr.isAirport &&
        tr.distanceKm >= GeoMath.MinTripKm &&
        math.abs(tr.revenue - (GeoMath.FareBase + GeoMath.FarePerKm * tr.distanceKm)) < 1e-9 &&
        tr.startTime <= tr.stopTime &&
        tr.date == "2008-05-25"
    }
  }

  property("trips are chronologically disjoint") = Prop.forAll(streamGen) { ps =>
    val trips = TaxiFsm.sessionize(sorted(ps).iterator).toList
    trips.zip(trips.drop(1)).forall { case (a, b) => b.startTime >= a.stopTime }
  }

  property("multi-taxi partition == concat of per-taxi runs") =
    Prop.forAll(Gen.listOfN(3, streamGen)) { streams =>
      val all = streams.flatten
      val partitioned = all.sortBy(p => (p.taxi, p.tsS, p.latS, p.longS, p.status))
      val got = TaxiFsm.sessionizePartition(partitioned.iterator).toList
      val want = all.groupBy(_.taxi).toList.sortBy(_._1).flatMap { case (_, ps) =>
        TaxiFsm.sessionize(sorted(ps).iterator).toList
      }
      got.sortBy(t => (t.taxi, t.startTime)) == want.sortBy(t => (t.taxi, t.startTime))
    }

  property("FSM is insensitive to exact-duplicate records after dedup order") =
    Prop.forAll(streamGen) { ps =>
      val base = sorted(ps)
      // duplicating then deduping (the pipeline's dropDuplicates) is identity
      val doubled = sorted(ps ++ ps).distinct
      TaxiFsm.sessionize(base.iterator).toList ==
        TaxiFsm.sessionize(doubled.iterator).toList
    }

  property("speed-skipped points never contribute distance") = Prop.forAll(streamGen) { ps =>
    // Total emitted distance is bounded by sum of all legs <= 180 km/h.
    val pts = sorted(ps)
    val trips = TaxiFsm.sessionize(pts.iterator).toList
    trips.forall { tr =>
      val dt = (tr.stopTime - tr.startTime) / 3600.0
      tr.distanceKm <= GeoMath.MaxSpeedKmh * dt + 1e-9
    }
  }
}
