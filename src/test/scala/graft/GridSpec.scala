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

  test("Mercator: Web Mercator constants and ellipsoidal round-trip") {
    // EPSG:3857 — the sphere a=6378137 makes the projected world square:
    // x(180°) = y(85.05112878°) = 20037508.342789244
    val web = Grid.fromProj4(
      "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +units=m +no_defs")
    val (xMax, _) = web.forward(180.0, 0.0)
    assert(math.abs(xMax - 20037508.342789244) < 1e-6, s"x=$xMax")
    val (_, yTop) = web.forward(0.0, 85.05112878)
    assert(math.abs(yTop - 20037508.342789244) < 0.5, s"y=$yTop")
    // ellipsoidal form round-trips through the iterative inverse
    val merc = Grid.Mercator(lon0Deg = -43, a = 6378137.0, invF = 298.257223563)
    for (lon <- Seq(-60.0, -43.0, -20.0); lat <- Seq(-35.0, 0.0, 48.0, 70.0)) {
      val (x, y) = merc.forward(lon, lat)
      val (lon2, lat2) = merc.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
    // equator maps to y=0 on both forms
    assert(math.abs(merc.forward(-50, 0)._2) < 1e-9)
  }

  test("proj4 strings resolve to the equivalent named projections") {
    // BDC Albers grid string == projectionFor("aea", -54)
    val aea = Grid.fromProj4("+proj=aea +lat_0=-12 +lon_0=-54 +lat_1=-2 " +
      "+lat_2=-22 +x_0=5000000 +y_0=10000000 +ellps=GRS80 +units=m +no_defs")
    val aeaNamed = Grid.projectionFor("aea", -54)
    for (lon <- Seq(-70.0, -54.0, -30.0); lat <- Seq(-30.0, -12.0, 3.0)) {
      val (x1, y1) = aea.forward(lon, lat)
      val (x2, y2) = aeaNamed.forward(lon, lat)
      assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
    }
    // UTM 23S == utm(23, south = true); +datum resolves the ellipsoid
    val u23s = Grid.fromProj4("+proj=utm +zone=23 +south +datum=WGS84")
    val named = Grid.utm(23, south = true)
    val (xa, ya) = u23s.forward(-44.2, -19.9)
    val (xb, yb) = named.forward(-44.2, -19.9)
    assert(math.abs(xa - xb) < 1e-9 && math.abs(ya - yb) < 1e-9)
    // MODIS sinusoidal sphere via +a=+b
    val sinu = Grid.fromProj4("+proj=sinu +lon_0=0 +x_0=0 +y_0=0 " +
      "+a=6371007.181 +b=6371007.181 +units=m +no_defs")
    val sinuNamed = Grid.projectionFor("sinu", 0)
    val (xs2, ys2) = sinu.forward(-54.0, -12.0)
    val (xn, yn) = sinuNamed.forward(-54.0, -12.0)
    assert(math.abs(xs2 - xn) < 1e-9 && math.abs(ys2 - yn) < 1e-9)
    // longlat passes coordinates through
    assert(Grid.fromProj4("+proj=longlat +datum=WGS84 +no_defs")
      .forward(-54.5, -12.25) == ((-54.5, -12.25)))
    // projectionFor dispatches "+..." names to the parser
    val viaName = Grid.projectionFor("+proj=utm +zone=23 +south +datum=WGS84", 0)
    assert(viaName.forward(-44.2, -19.9) == ((xa, ya)))
  }

  test("Lambert conformal conic matches Snyder's published worked example") {
    // Snyder PP1395 p.296-297 (ellipsoid example): Clarke 1866,
    // lat_1=33, lat_2=45, lat_0=23, lon_0=-96; phi=35, lam=-75
    // -> x = 1,894,410.9 m, y = 1,564,649.5 m
    val lcc = Grid.LambertConformal(lon0Deg = -96, lat0Deg = 23,
      lat1Deg = 33, lat2Deg = 45, a = 6378206.4, invF = 294.978698214)
    val (x, y) = lcc.forward(-75.0, 35.0)
    assert(math.abs(x - 1894410.9) < 0.5, s"x=$x")
    assert(math.abs(y - 1564649.5) < 0.5, s"y=$y")
    val (lon, lat) = lcc.inverse(x, y)
    assert(math.abs(lon - (-75.0)) < 1e-8 && math.abs(lat - 35.0) < 1e-8)
    // origin maps to the false origin
    val viaP4 = Grid.fromProj4("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 " +
      "+lon_0=-96 +x_0=2000 +y_0=500 +ellps=clrk66")
    val (ox, oy) = viaP4.forward(-96.0, 23.0)
    assert(math.abs(ox - 2000.0) < 1e-6 && math.abs(oy - 500.0) < 1e-6)
    // conformality: unit scale along both standard parallels, >1 outside
    def k(p: Grid.Projection, latDeg: Double): Double = {
      val dLon = 1e-6
      val (x1, y1) = p.forward(-96.0, latDeg)
      val (x2, y2) = p.forward(-96.0 + dLon, latDeg)
      val proj = math.hypot(x2 - x1, y2 - y1)
      val phi = math.toRadians(latDeg)
      val e2 = 1 - math.pow(1 - 1 / 294.978698214, 2) // ~first eccentricity²
      val mr = 6378206.4 * math.cos(phi) /
        math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      proj / (mr * math.toRadians(dLon))
    }
    assert(math.abs(k(lcc, 33.0) - 1.0) < 1e-6, s"k(33)=${k(lcc, 33.0)}")
    assert(math.abs(k(lcc, 45.0) - 1.0) < 1e-6, s"k(45)=${k(lcc, 45.0)}")
    assert(k(lcc, 25.0) > 1.0 && k(lcc, 55.0) > 1.0 && k(lcc, 39.0) < 1.0)
    // single-parallel degenerate form round-trips
    val single = Grid.fromProj4("+proj=lcc +lat_1=-10 +lat_0=-10 +lon_0=-54 " +
      "+ellps=GRS80")
    val (lo2, la2) = single.inverse _ tupled single.forward(-50.5, -14.25)
    assert(math.abs(lo2 - (-50.5)) < 1e-8 && math.abs(la2 - (-14.25)) < 1e-8)
  }

  test("tmerc honors +lat_0 and unsupported +proj fails with a typed message") {
    // y measures from lat_0: the origin projects to (x_0, y_0) exactly
    val tm = Grid.fromProj4("+proj=tmerc +lat_0=-33 +lon_0=19 +k=1 " +
      "+x_0=100000 +y_0=50000 +ellps=WGS84")
    val (x0, y0) = tm.forward(19.0, -33.0)
    assert(math.abs(x0 - 100000.0) < 1e-6 && math.abs(y0 - 50000.0) < 1e-6)
    val (lonR, latR) = tm.inverse _ tupled tm.forward(19.8, -33.9)
    assert(math.abs(lonR - 19.8) < 1e-7 && math.abs(latR - (-33.9)) < 1e-7)
    // lat_0=0 stays byte-identical with the historical behavior
    val plain = Grid.TransverseMercator(lon0Deg = -75)
    val withLat0 = Grid.fromProj4("+proj=tmerc +lat_0=0 +lon_0=-75 " +
      "+k=0.9996 +x_0=500000 +y_0=0 +ellps=WGS84")
    assert(plain.forward(-74.1, 40.0) == withLat0.forward(-74.1, 40.0))
    val err = intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=ortho +lat_0=90"))
    assert(err.getMessage.contains("+proj=ortho"))
    val noZone = intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=utm +south"))
    assert(noZone.getMessage.contains("+zone"))
    // +lat_ts on an oblique stere center is a polar-aspect parameter
    val obliqueTs = intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=stere +lat_0=52 +lat_ts=70 +lon_0=5"))
    assert(obliqueTs.getMessage.contains("lat_ts"))
  }

  test("oblique/equatorial stereographic: center, conformality, anchors") {
    // mid-latitude oblique aspect (Netherlands-style center)
    val ob = Grid.fromProj4("+proj=stere +lat_0=52 +lon_0=5 +k=0.9999 " +
      "+ellps=WGS84 +units=m +no_defs")
    // the center is the (false) origin
    val (cx, cy) = ob.forward(5.0, 52.0)
    assert(math.abs(cx) < 1e-6 && math.abs(cy) < 1e-6)
    // dual-implementation anchor (independent implementation of Snyder
    // 21-27..21-39 over the conformal latitude)
    val (ax, ay) = ob.forward(10.0, 48.0)
    assert(math.abs(ax - 373280.794) < 0.01, s"x=$ax")
    assert(math.abs(ay - -432543.761) < 0.01, s"y=$ay")
    // conformality: meridian scale == parallel scale off-center
    val e2 = { val f = 1.0 / 298.257223563; f * (2 - f) }
    def km(p: Grid.Projection, lon: Double, lat: Double): Double = {
      val d = 1e-6
      val (x1, y1) = p.forward(lon, lat)
      val (x2, y2) = p.forward(lon, lat + d)
      val phi = math.toRadians(lat)
      val mr = 6378137.0 * (1 - e2) /
        math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
      math.hypot(x2 - x1, y2 - y1) / (mr * math.toRadians(d))
    }
    def kp(p: Grid.Projection, lon: Double, lat: Double): Double = {
      val d = 1e-6
      val (x1, y1) = p.forward(lon, lat)
      val (x2, y2) = p.forward(lon + d, lat)
      val phi = math.toRadians(lat)
      val nr = 6378137.0 / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      math.hypot(x2 - x1, y2 - y1) / (nr * math.cos(phi) * math.toRadians(d))
    }
    for ((lon, lat) <- Seq((10.0, 48.0), (-2.0, 58.0), (5.0, 40.0))) {
      val r = km(ob, lon, lat) / kp(ob, lon, lat)
      assert(math.abs(r - 1.0) < 1e-5, s"isotropy at ($lon,$lat): $r")
    }
    // scale at the center is k0
    assert(math.abs(kp(ob, 5.0, 52.0) - 0.9999) < 1e-6)
    // equatorial aspect anchor + round-trip
    val eq = Grid.fromProj4("+proj=stere +lat_0=0 +lon_0=-20 +ellps=WGS84")
    val (ex, ey) = eq.forward(-12.5, 30.0)
    assert(math.abs(ex - 776519.760) < 0.01, s"x=$ex")
    assert(math.abs(ey - 3411755.654) < 0.01, s"y=$ey")
    for ((lon, lat) <- Seq((10.0, 48.0), (-2.0, 58.0), (15.0, 35.0))) {
      val (lon2, lat2) = ob.inverse _ tupled ob.forward(lon, lat)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("polar stereographic: EPSG:3031/3413 semantics") {
    // EPSG:3031 Antarctic Polar Stereographic (WGS84, lat_ts=-71)
    val sps = Grid.fromProj4("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 " +
      "+k=1 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs")
    // the pole is the origin
    val (px, py) = sps.forward(0.0, -90.0)
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6)
    // defining property (Snyder 21-34): true scale on the standard
    // parallel — an east-west step at lat_ts projects to exactly the
    // ellipsoidal parallel-circle arc
    val e2 = { val f = 1.0 / 298.257223563; f * (2 - f) }
    def parallelR(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      6378137.0 * math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    }
    def kPar(p: Grid.Projection, lonDeg: Double, latDeg: Double): Double = {
      val dLon = 1e-6
      val (x1, y1) = p.forward(lonDeg, latDeg)
      val (x2, y2) = p.forward(lonDeg + dLon, latDeg)
      math.hypot(x2 - x1, y2 - y1) / (parallelR(latDeg) * math.toRadians(dLon))
    }
    def kMer(p: Grid.Projection, lonDeg: Double, latDeg: Double): Double = {
      val dLat = 1e-6
      val (x1, y1) = p.forward(lonDeg, latDeg)
      val (x2, y2) = p.forward(lonDeg, latDeg + dLat)
      val phi = math.toRadians(latDeg)
      val m = 6378137.0 * (1 - e2) / math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
      math.hypot(x2 - x1, y2 - y1) / (m * math.toRadians(dLat))
    }
    assert(math.abs(kPar(sps, 30.0, -71.0) - 1.0) < 1e-6,
      s"k(lat_ts)=${kPar(sps, 30.0, -71.0)}")
    // conformality: meridian scale == parallel scale everywhere
    for ((lon, lat) <- Seq((150.0, -75.0), (-60.0, -65.0), (10.0, -85.0))) {
      val ratio = kMer(sps, lon, lat) / kPar(sps, lon, lat)
      assert(math.abs(ratio - 1.0) < 1e-5, s"isotropy at ($lon,$lat): $ratio")
    }
    // scale grows away from the standard parallel on both sides
    assert(kPar(sps, 0.0, -60.0) > 1.0 && kPar(sps, 0.0, -80.0) < 1.0)
    // north aspect (EPSG:3413-style): pole at origin, round-trips
    val nps = Grid.fromProj4(
      "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +datum=WGS84")
    val (nx, ny) = nps.forward(-45.0, 90.0)
    assert(math.abs(nx) < 1e-6 && math.abs(ny) < 1e-6)
    assert(math.abs(kPar(nps, 100.0, 70.0) - 1.0) < 1e-6)
    for ((lon, lat) <- Seq((-45.0, 70.0), (130.0, 62.5), (-179.0, 88.0))) {
      val (lon2, lat2) = nps.inverse _ tupled nps.forward(lon, lat)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
    // dual-implementation anchor (Snyder 21-34 south aspect computed by an
    // independent implementation of the same published equations):
    // International ellipsoid, lat_ts=-71, lon_0=-100, point (150E, 75S)
    val intl = Grid.PolarStereographic(lon0Deg = -100, south = true,
      latTsDeg = -71, a = 6378388.0, invF = 297.0)
    val (ax, ay) = intl.forward(150.0, -75.0)
    assert(math.abs(ax - -1540033.61) < 0.1, s"x=$ax")
    assert(math.abs(ay - -560526.39) < 0.1, s"y=$ay")
    // pole-scale variant (+k, no lat_ts): k0 halves coordinates linearly
    val k1 = Grid.fromProj4("+proj=stere +lat_0=90 +lon_0=0 +k=1 +ellps=WGS84")
    val kh = Grid.fromProj4("+proj=stere +lat_0=90 +lon_0=0 +k=0.5 +ellps=WGS84")
    val (x1, y1) = k1.forward(77.0, 80.0)
    val (xh, yh) = kh.forward(77.0, 80.0)
    assert(math.abs(xh * 2 - x1) < 1e-6 && math.abs(yh * 2 - y1) < 1e-6)
  }

  test("laea matches Snyder's published worked example and preserves area") {
    // Snyder PP1395 p.333-334 (ellipsoid example): Clarke 1866,
    // lat_0=40, lon_0=-100; phi=30, lam=-110
    // -> x = -965,932.1 m, y = -1,056,814.9 m
    val laea = Grid.LambertAzimuthalEqualArea(lon0Deg = -100, lat0Deg = 40,
      a = 6378206.4, invF = 294.978698214)
    val (x, y) = laea.forward(-110.0, 30.0)
    assert(math.abs(x - -965932.1) < 0.5, s"x=$x")
    assert(math.abs(y - -1056814.9) < 0.5, s"y=$y")
    val (lon, lat) = laea.inverse(x, y)
    assert(math.abs(lon - (-110.0)) < 1e-7 && math.abs(lat - 30.0) < 1e-7)
    // EPSG:3035 (Europe LAEA, GRS80): the center is the false origin
    val eu = Grid.fromProj4("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 " +
      "+y_0=3210000 +ellps=GRS80 +units=m +no_defs")
    val (cx, cy) = eu.forward(10.0, 52.0)
    assert(math.abs(cx - 4321000.0) < 1e-6 && math.abs(cy - 3210000.0) < 1e-6)
    // defining property: the areal scale factor (Jacobian determinant
    // over the ellipsoidal area element M·r) is 1 everywhere
    val e2 = { val f = 1.0 / 298.257222101; f * (2 - f) }
    def arealScale(p: Grid.Projection, lonDeg: Double, latDeg: Double): Double = {
      val d = 1e-6
      val (x0, y0) = p.forward(lonDeg, latDeg)
      val (xl, yl) = p.forward(lonDeg + d, latDeg)
      val (xp, yp) = p.forward(lonDeg, latDeg + d)
      val jac = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) /
        (math.toRadians(d) * math.toRadians(d))
      val phi = math.toRadians(latDeg)
      val w2 = 1 - e2 * math.sin(phi) * math.sin(phi)
      val mRad = 6378137.0 * (1 - e2) / math.pow(w2, 1.5)
      val r = 6378137.0 * math.cos(phi) / math.sqrt(w2)
      jac / (mRad * r)
    }
    for ((lo, la) <- Seq((10.0, 52.0), (-9.0, 38.5), (28.0, 66.0), (20.0, 45.0))) {
      val s = arealScale(eu, lo, la)
      assert(math.abs(s - 1.0) < 1e-4, s"areal scale at ($lo,$la): $s")
    }
    // polar aspect (Snyder 24-23/24-25): pole at origin, round-trips
    val np = Grid.fromProj4("+proj=laea +lat_0=90 +lon_0=0 +datum=WGS84")
    val (px, py) = np.forward(0.0, 90.0)
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6)
    for ((lo, la) <- Seq((33.0, 80.0), (-140.0, 55.0), (179.0, 89.5))) {
      val (lo2, la2) = np.inverse _ tupled np.forward(lo, la)
      assert(math.abs(lo2 - lo) < 1e-7 && math.abs(la2 - la) < 1e-7,
        s"($lo,$la) -> ($lo2,$la2)")
    }
    val sp = Grid.fromProj4("+proj=laea +lat_0=-90 +lon_0=0 +datum=WGS84")
    val (slo, sla) = sp.inverse _ tupled sp.forward(-77.0, -66.0)
    assert(math.abs(slo - (-77.0)) < 1e-7 && math.abs(sla - (-66.0)) < 1e-7)
  }

  test("proj4 misconfigurations fail typed instead of emitting NaN") {
    // unknown named ellipsoid: not a silent WGS84 swap
    val badEllps = intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=tmerc +lon_0=19 +ellps=bessel"))
    assert(badEllps.getMessage.contains("bessel"))
    // ellipsoidal sinusoidal requests are refused, not reprojected on
    // the MODIS sphere
    val sinuEllps = intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=sinu +lon_0=0 +ellps=GRS80"))
    assert(sinuEllps.getMessage.contains("sinusoidal"))
    val sinuAB = intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=sinu +a=6371007.181 +b=6356752.3"))
    assert(sinuAB.getMessage.contains("sinusoidal"))
    // a lone +a IS a sphere of that radius (proj semantics)
    val (x, _) = Grid.fromProj4("+proj=sinu +a=6371000 +lon_0=0")
      .forward(90.0, 0.0)
    assert(math.abs(x - 6371000.0 * math.Pi / 2) < 1e-6)
    // spherical Albers: the ellipsoidal q() series has no e=0 form
    val sphereAea = intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=aea +lat_1=-2 +lat_2=-22 +ellps=sphere"))
    assert(sphereAea.getMessage.toLowerCase.contains("spherical albers"))
    // conics without +lat_1, or with a degenerate (symmetric) cone
    assert(intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=lcc +lon_0=-54")).getMessage.contains("+lat_1"))
    assert(intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=aea +lon_0=-54")).getMessage.contains("+lat_1"))
    assert(intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=lcc +lat_1=33 +lat_2=-33"))
      .getMessage.contains("degenerate"))
    assert(intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=aea +lat_1=20 +lat_2=-20"))
      .getMessage.contains("degenerate"))
    // single-parallel Albers works via n = sin(lat_1), round-trips
    val aea1 = Grid.fromProj4("+proj=aea +lat_1=-12 +lat_0=-12 +lon_0=-54 +ellps=GRS80")
    val (lo, la) = aea1.inverse _ tupled aea1.forward(-50.0, -15.0)
    assert(math.abs(lo - (-50.0)) < 1e-9 && math.abs(la - (-15.0)) < 1e-9)
  }
}
