package graft.core

/** Geodetic datum transformation: 3-/7-parameter Helmert shifts between
  * reference frames, as declared by proj4 `+towgs84` (SURVEY §2.5 C13;
  * the reference accepts any datum through GDAL/pyproj —
  * `cube_builder/grids.py:92-99`, `utils/processing.py:223-231`).
  *
  * Published formulas only: the position-vector 7-parameter
  * transformation (EPSG method 9606, Guidance Note 7-2), geodetic ↔
  * geocentric conversion (GN 7-2 §2.2), and Bowring's closed-form
  * geocentric → geodetic latitude (Bowring 1976, Survey Review 23/181).
  * Bowring's single-step form is used deliberately — its error is far
  * below a micro-degree for |h| < 10 km, orders of magnitude under the
  * meter-level accuracy of any `+towgs84` transform itself, and being
  * closed-form it is exactly re-computable by the SQL oracle.
  */
object Datum {

  /** WGS84 semi-major axis / inverse flattening — the pivot frame every
    * `+towgs84` transform targets.
    */
  val Wgs84A = 6378137.0
  val Wgs84InvF = 298.257223563

  /** Position-vector Helmert transform, source datum → WGS84 (EPSG
    * 9606; the sign convention proj4's `+towgs84` uses):
    *
    * {{{
    * [X']   [dx]            [  1   -rz   ry ] [X]
    * [Y'] = [dy] + (1+s) ·  [  rz   1   -rx ] [Y]
    * [Z']   [dz]            [ -ry   rx   1  ] [Z]
    * }}}
    *
    * Rotations in arc-seconds, scale in parts-per-million (the units
    * `+towgs84=dx,dy,dz,rx,ry,rz,s` carries).
    */
  final case class Helmert(dx: Double, dy: Double, dz: Double,
                           rxArcsec: Double = 0.0, ryArcsec: Double = 0.0,
                           rzArcsec: Double = 0.0, sPpm: Double = 0.0)
      extends Serializable {
    private val rx = math.toRadians(rxArcsec / 3600.0)
    private val ry = math.toRadians(ryArcsec / 3600.0)
    private val rz = math.toRadians(rzArcsec / 3600.0)
    private val m = 1.0 + sPpm * 1e-6

    val isIdentity: Boolean =
      dx == 0 && dy == 0 && dz == 0 &&
        rxArcsec == 0 && ryArcsec == 0 && rzArcsec == 0 && sPpm == 0

    /** Source-datum geocentric → WGS84 geocentric. */
    def forward(x: Double, y: Double, z: Double): (Double, Double, Double) =
      (dx + m * (x - rz * y + ry * z),
       dy + m * (rz * x + y - rx * z),
       dz + m * (-ry * x + rx * y + z))

    /** WGS84 geocentric → source-datum geocentric: the EXACT algebraic
      * inverse of [[forward]] (3×3 solve of the linearized rotation
      * matrix), not the EPSG sign-reversal approximation — so
      * forward∘inverse round-trips to machine precision even for
      * large-rotation test transforms.
      */
    def inverse(xw: Double, yw: Double, zw: Double): (Double, Double, Double) = {
      val u = (xw - dx) / m
      val v = (yw - dy) / m
      val w = (zw - dz) / m
      // R = [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]]; solve R·p = (u,v,w)
      val det = 1.0 + rx * rx + ry * ry + rz * rz
      val x = (u * (1 + rx * rx) + v * (rz + rx * ry) + w * (rx * rz - ry)) / det
      val y = (u * (rx * ry - rz) + v * (1 + ry * ry) + w * (rx + ry * rz)) / det
      val z = (u * (ry + rx * rz) + v * (ry * rz - rx) + w * (1 + rz * rz)) / det
      (x, y, z)
    }
  }

  /** Geodetic (lon°, lat°, h meters above the ellipsoid) → geocentric
    * XYZ meters on an ellipsoid (a, invF). `invF = Infinity` is a
    * sphere. (EPSG GN 7-2 §2.2.)
    */
  def geodeticToGeocentric(lonDeg: Double, latDeg: Double, h: Double,
                           a: Double, invF: Double): (Double, Double, Double) = {
    val f = if (invF.isInfinity) 0.0 else 1.0 / invF
    val e2 = f * (2 - f)
    val lat = math.toRadians(latDeg)
    val lon = math.toRadians(lonDeg)
    val sinLat = math.sin(lat)
    val n = a / math.sqrt(1 - e2 * sinLat * sinLat)
    ((n + h) * math.cos(lat) * math.cos(lon),
     (n + h) * math.cos(lat) * math.sin(lon),
     (n * (1 - e2) + h) * sinLat)
  }

  /** Geocentric XYZ → geodetic (lon°, lat°) via Bowring's closed-form
    * single step. Height is intentionally dropped: the engine's
    * [[Grid.Projection]] surface is 2D, mirroring proj's own behavior
    * for 2D coordinate pipelines.
    */
  def geocentricToGeodetic(x: Double, y: Double, z: Double,
                           a: Double, invF: Double): (Double, Double) = {
    val f = if (invF.isInfinity) 0.0 else 1.0 / invF
    val e2 = f * (2 - f)
    val b = a * (1 - f)
    val ep2 = (a * a - b * b) / (b * b)
    val p = math.hypot(x, y)
    val theta = math.atan2(z * a, p * b)
    val sinT = math.sin(theta)
    val cosT = math.cos(theta)
    val lat = math.atan2(z + ep2 * b * sinT * sinT * sinT,
                         p - e2 * a * cosT * cosT * cosT)
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(lat))
  }

  /** A projection on a non-WGS84 datum, composed with its `+towgs84`
    * shift so the [[Grid.Projection]] contract stays "lon/lat means
    * WGS84" end to end (the proj pipeline convention — cross-CRS warps
    * compose as `dst.inverse → src.forward` with no datum bookkeeping
    * at the call site).
    *
    * forward: WGS84 lon/lat → geocentric → Helmert⁻¹ → datum geodetic
    * → `base.forward`. inverse: `base.inverse` → datum geodetic →
    * geocentric → Helmert → WGS84 lon/lat. Heights are taken as 0 on
    * the input ellipsoid and dropped on output (the standard 2D
    * pipeline); the induced round-trip error is ≲2e-5° (~2 m of
    * ellipsoidal-height mismatch leverage) for meter-scale shifts —
    * below the stated accuracy of any 3-/7-parameter transform.
    */
  final case class DatumShifted(base: Grid.Projection,
                                baseA: Double, baseInvF: Double,
                                toWgs84: Helmert) extends Grid.Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (xw, yw, zw) = geodeticToGeocentric(lonDeg, latDeg, 0.0, Wgs84A, Wgs84InvF)
      val (x, y, z) = toWgs84.inverse(xw, yw, zw)
      val (lonD, latD) = geocentricToGeodetic(x, y, z, baseA, baseInvF)
      base.forward(lonD, latD)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val (lonD, latD) = base.inverse(x, y)
      val (xd, yd, zd) = geodeticToGeocentric(lonD, latD, 0.0, baseA, baseInvF)
      val (xw, yw, zw) = toWgs84.forward(xd, yd, zd)
      geocentricToGeodetic(xw, yw, zw, Wgs84A, Wgs84InvF)
    }
  }
}
