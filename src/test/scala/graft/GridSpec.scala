package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Grid

class GridSpec extends AnyFunSuite {

  test("Albers forward/inverse round-trip across the Brazil extent") {
    val proj = Grid.projectionFor("aea", -54)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val lon = -74 + rnd.nextDouble() * 46   // -74..-28
      val lat = -34 + rnd.nextDouble() * 39   // -34..5
      val (x, y) = proj.forward(lon, lat)
      val (lon2, lat2) = proj.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat -> $lat2")
    }
  }

  test("sinusoidal forward/inverse round-trip") {
    val proj = Grid.projectionFor("sinu", -54)
    for (lon <- Seq(-70.0, -54.0, -30.0); lat <- Seq(-30.0, -12.0, 0.0, 4.0)) {
      val (x, y) = proj.forward(lon, lat)
      val (lon2, lat2) = proj.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("Albers center maps to the false origin offsets") {
    val proj = Grid.projectionFor("aea", -54)
    val (x, y) = proj.forward(-54, -12)
    assert(math.abs(x - 5000000) < 1e-6) // lon0 → x_0
    assert(math.abs(y - 10000000) < 1e-6) // lat0 → y_0
  }

  test("hierarchical grids nest: one MD tile = 2x2 SM tiles") {
    val grids = Grid.createGrids(Seq("SM", "MD"), "aea", -54,
      Seq((1, 1), (2, 2)), (10560, 10560),
      (-46.0, -15.0, -42.0, -11.0), srid = 100009)
    val sm = grids("SM"); val md = grids("MD")
    assert(sm.nonEmpty && md.nonEmpty)
    // every MD tile boundary coincides with SM tile boundaries
    val smXs = sm.map(_.xmin).toSet
    md.foreach(t => assert(smXs.contains(t.xmin)))
    val smArea = (sm.head.xmax - sm.head.xmin) * (sm.head.ymax - sm.head.ymin)
    val mdArea = (md.head.xmax - md.head.xmin) * (md.head.ymax - md.head.ymin)
    assert(math.abs(mdArea / smArea - 4.0) < 1e-9)
  }

  test("tile ids are %03d%03d of (h, v) indices") {
    val tiles = Grid.createTiles("G", 100.0, 100.0, 0.0, 1000.0,
      150.0, 460.0, 550.0, 900.0, 1)
    assert(tiles.forall(_.tileId.length == 6))
    assert(tiles.map(_.tileId).contains("001001"))
    // adjacency: consecutive h indices shift xmin by exactly one tile
    val byId = tiles.groupBy(_.tileId).view.mapValues(_.head)
    assert(byId("002001").xmin - byId("001001").xmin == 100.0)
  }

  test("transverse mercator matches Snyder's published worked example") {
    // Snyder PP1395 p.269: Clarke 1866, phi=40d30'N, lam=73d30'W,
    // lon0=-75, k0=0.9996 -> x = 127,106.5 m, y = 4,484,124.4 m
    val tm = Grid.TransverseMercator(lon0Deg = -75, k0 = 0.9996,
      x0 = 0, y0 = 0, a = 6378206.4, invF = 294.978698214)
    val (x, y) = tm.forward(-73.5, 40.5)
    assert(math.abs(x - 127106.5) < 0.5, s"x=$x")
    assert(math.abs(y - 4484124.4) < 0.5, s"y=$y")
    val (lon, lat) = tm.inverse(x, y)
    assert(math.abs(lon - (-73.5)) < 1e-7 && math.abs(lat - 40.5) < 1e-7)
  }

  test("UTM zones: anchors and round-trips (Sentinel-2 native CRS)") {
    // central meridian on the equator is the (false easting, 0/10M) anchor
    val z33n = Grid.utm(33, south = false)
    val (x0, y0) = z33n.forward(15.0, 0.0)
    assert(math.abs(x0 - 500000.0) < 1e-6 && math.abs(y0) < 1e-6)
    val z23s = Grid.projectionFor("utm23s", 0)
    val (xs, ys) = z23s.forward(-45.0, 0.0)
    assert(math.abs(xs - 500000.0) < 1e-6 && math.abs(ys - 10000000.0) < 1e-6)
    // round-trip across each zone's width, both hemispheres
    for (lon <- Seq(-47.9, -45.0, -42.1); lat <- Seq(-33.0, -15.0, -0.5)) {
      val (x, y) = z23s.forward(lon, lat)
      val (lon2, lat2) = z23s.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
    // name routing accepts tmerc with an arbitrary meridian too
    val tm = Grid.projectionFor("tmerc", -63)
    val (lon3, lat3) = tm.inverse _ tupled tm.forward(-62.2, 4.4)
    assert(math.abs(lon3 - (-62.2)) < 1e-7 && math.abs(lat3 - 4.4) < 1e-7)
  }
}
