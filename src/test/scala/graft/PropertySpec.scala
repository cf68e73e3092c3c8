package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed}
import graft.operators.TopKAgg.TopKBuf
import graft.core.Grid

/** Property-based pins (scalacheck, driver-side — no Spark session):
  * the top-k heap against a reference sort under arbitrary inputs,
  * splits, and serialization; projection forward∘inverse identity over
  * their whole usable domains.
  */
class PropertySpec extends AnyFunSuite {

  private def run(name: String)(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.status == Passed, s"$name: $r")
  }

  private def referenceTopK(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  test("TopKBuf equals sort-based top-k for any input, any split, any order") {
    val entry = for {
      s <- Gen.chooseNum(-5, 5) // small domain forces exact-tie coverage
      id <- Gen.chooseNum(0L, 30L)
    } yield (s.toDouble / 2, id)
    val gen = for {
      xs <- Gen.listOf(entry)
      k <- Gen.chooseNum(1, 12)
      cut <- Gen.chooseNum(0, xs.length)
    } yield (xs, k, cut)
    run("topk")(forAll(gen) { case (xs, k, cut) =>
      // two partial buffers merged, one of them through serialization
      val (l, r) = xs.splitAt(cut)
      val b1 = new TopKBuf(k); l.foreach { case (s, id) => b1.insert(s, id) }
      val b2 = new TopKBuf(k); r.foreach { case (s, id) => b2.insert(s, id) }
      val b2rt = graft.operators.TopKAgg.TopKBuf.deserialize(b2.serialize())
      var i = 0
      while (i < b2rt.n) { b1.insert(b2rt.scores(i), b2rt.ids(i)); i += 1 }
      val got = b1.sortedIndices.map(i => (b1.scores(i), b1.ids(i))).toSeq
      // the reference dedups nothing: equal (score, id) duplicates are
      // legitimate distinct observations and both representations keep them
      got == referenceTopK(xs, k)
    })
  }

  private val projections: Seq[(String, Grid.Projection, Gen[(Double, Double)])] = {
    def box(lo1: Double, hi1: Double, lo2: Double, hi2: Double) = for {
      lon <- Gen.chooseNum(lo1, hi1)
      lat <- Gen.chooseNum(lo2, hi2)
    } yield (lon, lat)
    Seq(
      ("aea", Grid.projectionFor("aea", -54), box(-80, -30, -35, 6)),
      ("sinu", Grid.projectionFor("sinu", 0), box(-179, 179, -85, 85)),
      ("utm23s", Grid.utm(23, south = true), box(-48, -42, -60, 60)),
      ("merc", Grid.Mercator(lon0Deg = 0), box(-179, 179, -85, 85)),
      ("webmerc", Grid.fromProj4("+proj=merc +a=6378137 +b=6378137"),
        box(-179, 179, -85, 85)),
      ("lcc", Grid.LambertConformal(-96, 23, 33, 45), box(-130, -60, 5, 70)),
      ("lcc-south", Grid.LambertConformal(-60, -32, -18, -36),
        box(-80, -40, -55, -5)),
      ("tmerc+lat0", Grid.fromProj4(
        "+proj=tmerc +lat_0=-33 +lon_0=19 +k=1 +x_0=1000 +y_0=2000 +ellps=WGS84"),
        box(16, 22, -60, 10)),
      ("stere-south", Grid.fromProj4(
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +k=1 +datum=WGS84"),
        box(-179, 179, -89.5, -55)),
      ("stere-north", Grid.fromProj4(
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +datum=WGS84"),
        box(-179, 179, 55, 89.5)),
      ("stere-oblique", Grid.fromProj4(
        "+proj=stere +lat_0=52 +lon_0=5 +k=0.9999 +ellps=WGS84"),
        box(-25, 35, 30, 75)),
      ("stere-equatorial", Grid.fromProj4(
        "+proj=stere +lat_0=0 +lon_0=-20 +ellps=WGS84"),
        box(-80, 40, -45, 45)),
      ("laea-eu", Grid.fromProj4(
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80"),
        box(-25, 45, 27, 72)),
      ("laea-polar", Grid.fromProj4("+proj=laea +lat_0=-90 +lon_0=0 +ellps=WGS84"),
        box(-179, 179, -89.5, -40)))
  }

  test("forward/inverse round-trips to 1e-7 degrees across each domain") {
    // longitude compares on the circle: a domain whose Δλ crosses ±180°
    // (e.g. polar aspects with lon_0 = -45) legitimately returns the
    // wrapped representative of the same meridian
    def lonDiff(a: Double, b: Double): Double =
      math.abs(((a - b) % 360 + 540) % 360 - 180)
    projections.foreach { case (name, proj, dom) =>
      run(name)(forAll(dom) { case (lon, lat) =>
        val (x, y) = proj.forward(lon, lat)
        val (lon2, lat2) = proj.inverse(x, y)
        lonDiff(lon2, lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7
      })
    }
  }

  test("Mercator +lat_ts sets true scale at the named parallel") {
    // k0 = cos(phi_ts)/sqrt(1 - e^2 sin^2 phi_ts): an east-west step at
    // lat_ts must project to (ellipsoidal parallel radius) * dLambda
    val merc = Grid.fromProj4("+proj=merc +lat_ts=20 +lon_0=0 +ellps=WGS84")
    val dLon = 1e-6
    val (x1, _) = merc.forward(10.0, 20.0)
    val (x2, _) = merc.forward(10.0 + dLon, 20.0)
    val f = 1.0 / 298.257223563
    val e2 = f * (2 - f)
    val phi = math.toRadians(20.0)
    val parallelR = 6378137.0 * math.cos(phi) /
      math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    val expected = parallelR * math.toRadians(dLon)
    assert(math.abs((x2 - x1) / expected - 1.0) < 1e-9,
      s"scale at lat_ts: ${(x2 - x1) / expected}")
  }
}
