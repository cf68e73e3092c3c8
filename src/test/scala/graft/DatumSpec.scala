package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Datum, Grid}
import graft.core.Datum.{DatumShifted, Helmert}

/** Datum-shift leg of the proj4 front-end: position-vector Helmert
  * (EPSG method 9606), geodetic↔geocentric, and the `+towgs84`
  * composition rule that keeps the Projection surface WGS84.
  */
class DatumSpec extends AnyFunSuite {

  test("position-vector Helmert matches the EPSG GN 7-2 worked example") {
    // WGS72 -> WGS84 (tz=+4.5 m, rz=+0.554", ds=+0.219 ppm):
    // (3657660.66, 255768.55, 5201382.11) -> (3657660.78, 255778.43, 5201387.75)
    val h = Helmert(0, 0, 4.5, 0, 0, 0.554, 0.219)
    val (x, y, z) = h.forward(3657660.66, 255768.55, 5201382.11)
    // the published output is rounded to cm; compare within 1 cm
    assert(math.abs(x - 3657660.78) < 0.011, s"x=$x")
    assert(math.abs(y - 255778.43) < 0.011, s"y=$y")
    assert(math.abs(z - 5201387.75) < 0.011, s"z=$z")
  }

  test("Helmert inverse is the exact algebraic inverse, not sign-reversal") {
    // large rotations exaggerate the difference between the exact
    // 3x3 solve and the EPSG small-angle sign-flip approximation
    val h = Helmert(120.5, -64.2, 301.8, 15.0, -22.0, 31.0, 8.5)
    val pts = Seq((6378137.0, 0.0, 0.0), (3657660.66, 255768.55, 5201382.11),
      (-2176344.0, 4383094.0, 4487419.0))
    for ((x, y, z) <- pts) {
      val (xw, yw, zw) = h.forward(x, y, z)
      val (x2, y2, z2) = h.inverse(xw, yw, zw)
      assert(math.abs(x2 - x) < 1e-8 && math.abs(y2 - y) < 1e-8 &&
        math.abs(z2 - z) < 1e-8, s"($x,$y,$z) -> ($x2,$y2,$z2)")
    }
  }

  test("geodetic<->geocentric matches GN 7-2 and Bowring round-trips") {
    // WGS84, lat 53°48'33.82"N lon 2°07'46.38"E h=73.0 m
    // -> X=3771793.968, Y=140253.342, Z=5124304.349
    val lat = 53 + 48 / 60.0 + 33.82 / 3600.0
    val lon = 2 + 7 / 60.0 + 46.38 / 3600.0
    val (x, y, z) = Datum.geodeticToGeocentric(lon, lat, 73.0,
      Datum.Wgs84A, Datum.Wgs84InvF)
    assert(math.abs(x - 3771793.968) < 0.0011, s"x=$x")
    assert(math.abs(y - 140253.342) < 0.0011, s"y=$y")
    assert(math.abs(z - 5124304.349) < 0.0011, s"z=$z")
    // Bowring one-step is sub-micro-degree even with h=73 m
    val (lon2, lat2) = Datum.geocentricToGeodetic(x, y, z,
      Datum.Wgs84A, Datum.Wgs84InvF)
    assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    // sphere degenerates cleanly (e=0)
    val (sx, sy, sz) = Datum.geodeticToGeocentric(10.0, 45.0, 0.0,
      6371000.0, Double.PositiveInfinity)
    val (slon, slat) = Datum.geocentricToGeodetic(sx, sy, sz,
      6371000.0, Double.PositiveInfinity)
    assert(math.abs(slon - 10.0) < 1e-12 && math.abs(slat - 45.0) < 1e-12)
  }

  test("fromProj4 +towgs84: 3- and 7-param wrap, zeros stay a no-op") {
    val p3 = Grid.fromProj4("+proj=longlat +ellps=intl +towgs84=-87,-96,-120")
    assert(p3.isInstanceOf[DatumShifted])
    val p7 = Grid.fromProj4("+proj=utm +zone=30 +ellps=intl " +
      "+towgs84=89.5,93.8,123.1,0,0,0.156,-1.2")
    assert(p7.isInstanceOf[DatumShifted])
    // all-zero +towgs84 is the "this IS WGS84" declaration
    val z = Grid.fromProj4("+proj=longlat +datum=WGS84 +towgs84=0,0,0")
    assert(z == Grid.LongLat)
    val z7 = Grid.fromProj4("+proj=longlat +datum=WGS84 +towgs84=0,0,0,0,0,0,0")
    assert(z7 == Grid.LongLat)
    val bad = intercept[IllegalArgumentException](
      Grid.fromProj4("+proj=longlat +ellps=intl +towgs84=1,2"))
    assert(bad.getMessage.contains("towgs84"))
  }

  test("longlat + towgs84 is a pure datum shift pinned by a dual implementation") {
    // ED50-style 3-param (International ellipsoid); expected values from
    // an independently written implementation of the same published
    // formulas (geodetic->geocentric -> Helmert -> Bowring)
    val ed50 = Grid.fromProj4("+proj=longlat +ellps=intl +towgs84=-87,-96,-120")
    // inverse: datum lon/lat -> WGS84 lon/lat
    val (lonW, latW) = ed50.inverse(2.0, 48.0)
    assert(math.abs(lonW - 1.998755077) < 1e-8, s"lonW=$lonW")
    assert(math.abs(latW - 47.999063851) < 1e-8, s"latW=$latW")
    // forward: WGS84 lon/lat -> datum lon/lat
    val (lonD, latD) = ed50.forward(2.0, 48.0)
    assert(math.abs(lonD - 2.001244929) < 1e-8, s"lonD=$lonD")
    assert(math.abs(latD - 48.000936118) < 1e-8, s"latD=$latD")
    // 7-param variant
    val p7 = Grid.fromProj4("+proj=longlat +ellps=intl " +
      "+towgs84=89.5,93.8,123.1,0,0,0.156,-1.2")
    val (l7, b7) = p7.inverse(-3.0, 55.0)
    assert(math.abs(l7 - -2.998419830) < 1e-8, s"lon=$l7")
    assert(math.abs(b7 - 54.999240828) < 1e-8, s"lat=$b7")
  }

  test("projected base composes: UTM-on-ED50 differs by ~100 m and round-trips") {
    val utmEd50 = Grid.fromProj4(
      "+proj=utm +zone=31 +ellps=intl +towgs84=-87,-96,-120")
    val utmWgs = Grid.fromProj4("+proj=utm +zone=31 +ellps=WGS84")
    val (xe, ye) = utmEd50.forward(3.0, 46.5)
    val (xw, yw) = utmWgs.forward(3.0, 46.5)
    // the same WGS84 ground point lands ~50-250 m away in the ED50 grid
    val d = math.hypot(xe - xw, ye - yw)
    assert(d > 50 && d < 250, s"shift=$d m")
    // round-trip: the 2D pipeline drops ellipsoidal height, which for
    // meter-scale shifts bounds the error near 2e-5 deg (~2 m)
    for ((lon, lat) <- Seq((0.5, 40.0), (3.0, 46.5), (5.9, 55.0))) {
      val (x, y) = utmEd50.forward(lon, lat)
      val (lon2, lat2) = utmEd50.inverse(x, y)
      assert(math.abs(lon2 - lon) < 2e-5 && math.abs(lat2 - lat) < 2e-5,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }
}
