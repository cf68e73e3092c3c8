package graft.core

/** Tile-grid tessellation (SURVEY §2.5 C13; reference
  * `cube_builder/grids.py:32-182`).
  *
  * A grid is a regular tiling of a projected plane; tiles are axis-aligned
  * rectangles named `%03d%03d` by (horizontal, vertical) index counted from
  * the grid's upper-left corner. Hierarchical grids share that corner and
  * scale the tile size by integer factors, so a coarse tile is exactly an
  * n×m block of fine tiles.
  *
  * Projection math (forward longlat→plane only, which is all grid creation
  * needs) is implemented from the standard published formulas (Snyder,
  * "Map Projections — A Working Manual", USGS PP 1395):
  * Albers Equal-Area on the GRS80 ellipsoid and spherical Sinusoidal.
  */
object Grid {

  final case class Tile(grid: String, tileId: String,
                        xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                        srid: Int)

  /** Forward/inverse map projection: (lonDeg, latDeg) ↔ (x, y) meters.
    * Serializable: projections ride into executor-side warp kernels.
    */
  trait Projection extends Serializable {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double)
    def inverse(x: Double, y: Double): (Double, Double)
  }

  /** Identity "projection": coordinates already in lon/lat degrees. */
  case object LongLat extends Projection {
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  /** Spherical sinusoidal, R = 6371007.181 (MODIS sphere) by default. */
  final case class Sinusoidal(lon0Deg: Double, x0: Double = 0, y0: Double = 0,
                              R: Double = 6371007.181) extends Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lam = math.toRadians(lonDeg - lon0Deg)
      val phi = math.toRadians(latDeg)
      (x0 + R * lam * math.cos(phi), y0 + R * phi)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi = (y - y0) / R
      val lam = (x - x0) / (R * math.cos(phi))
      (lon0Deg + math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Albers Equal-Area conic on an ellipsoid (Snyder 14-1..14-6). */
  final case class AlbersEqualArea(lon0Deg: Double, lat0Deg: Double,
                                   lat1Deg: Double, lat2Deg: Double,
                                   x0: Double, y0: Double,
                                   a: Double = 6378137.0,
                                   invF: Double = 298.257222101 /* GRS80 */)
      extends Projection {
    require(!invF.isInfinity,
      "spherical Albers (invF = Infinity) is not supported; the q() series needs e > 0")
    private val f = 1.0 / invF
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)

    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private def m(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e2 * s * s)
    }

    private val phi0 = math.toRadians(lat0Deg)
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val m1 = m(phi1); private val m2 = m(phi2)
    private val q0 = q(phi0); private val q1 = q(phi1); private val q2 = q(phi2)
    // Snyder 14-6; coincident parallels degenerate to the single-parallel
    // cone n = sin(phi1) (the two-parallel formula is 0/0 there)
    private val n =
      if (lat1Deg == lat2Deg) math.sin(phi1)
      else (m1 * m1 - m2 * m2) / (q2 - q1)
    require(n != 0 && !n.isNaN && !n.isInfinity,
      s"degenerate Albers cone (n = $n) for parallels $lat1Deg/$lat2Deg" +
        " — symmetric or equatorial parallels have no valid cone")
    private val bigC = m1 * m1 + n * q1
    private val rho0 = a * math.sqrt(bigC - n * q0) / n

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val rho = a * math.sqrt(bigC - n * q(phi)) / n
      val theta = n * math.toRadians(lonDeg - lon0Deg)
      (x0 + rho * math.sin(theta), y0 + rho0 - rho * math.cos(theta))
    }

    /** Inverse per Snyder 14-19..14-21 + the iterative 3-16 latitude. */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - x0
      val dy = rho0 - (y - y0)
      val sign = if (n >= 0) 1.0 else -1.0
      val rho = sign * math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(sign * dx, sign * dy)
      val qq = (bigC - (rho * n / a) * (rho * n / a)) / n
      var phi = math.asin(math.max(-1, math.min(1, qq / 2)))
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val one = 1 - e2 * s * s
        val delta = (one * one) / (2 * math.cos(phi)) *
          (qq / (1 - e2) - s / one +
            math.log((1 - e * s) / (1 + e * s)) / (2 * e))
        phi += delta
        i += 1
      }
      (lon0Deg + math.toDegrees(theta / n), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Transverse Mercator (Snyder 8-9..8-17 forward,
    * 8-18..8-25 inverse with the 3-26 footpoint-latitude series) — the
    * projection of every UTM zone, i.e. of Sentinel-2's native MGRS
    * tiling. WGS84 by default; `a`/`invF` are parameters so historic
    * datums (Clarke 1866 etc.) project too.
    */
  final case class TransverseMercator(lon0Deg: Double, k0: Double = 0.9996,
                                      x0: Double = 500000.0, y0: Double = 0.0,
                                      a: Double = 6378137.0,
                                      invF: Double = 298.257223563, /* WGS84 */
                                      lat0Deg: Double = 0.0)
      extends Projection {
    private val f = 1.0 / invF
    private val e2 = f * (2 - f)
    private val ep2 = e2 / (1 - e2)
    private val lam0 = math.toRadians(lon0Deg)

    /** Meridional arc M(φ), Snyder 3-21. */
    private def arc(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
        + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
        - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))

    /** Arc at the latitude of origin (Snyder 8-13: y measures from φ0). */
    private val m0 = arc(math.toRadians(lat0Deg))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      val sinP = math.sin(phi); val cosP = math.cos(phi)
      val bigN = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = (sinP / cosP) * (sinP / cosP)
      val c = ep2 * cosP * cosP
      val bigA = cosP * (lam - lam0)
      val x = k0 * bigN * (bigA + (1 - t + c) * bigA * bigA * bigA / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) *
          math.pow(bigA, 5) / 120)
      val y = k0 * (arc(phi) - m0 + bigN * (sinP / cosP) * (bigA * bigA / 2 +
        (5 - t + 9 * c + 4 * c * c) * math.pow(bigA, 4) / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) *
          math.pow(bigA, 6) / 720))
      (x0 + x, y0 + y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val bigM = m0 + (y - y0) / k0
      val mu = bigM / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val phi1 = mu +
        (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sin1 = math.sin(phi1); val cos1 = math.cos(phi1)
      val c1 = ep2 * cos1 * cos1
      val t1 = (sin1 / cos1) * (sin1 / cos1)
      val n1 = a / math.sqrt(1 - e2 * sin1 * sin1)
      val r1 = a * (1 - e2) / math.pow(1 - e2 * sin1 * sin1, 1.5)
      val d = (x - x0) / (n1 * k0)
      val phi = phi1 - (n1 * (sin1 / cos1) / r1) * (d * d / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) *
          math.pow(d, 6) / 720)
      val lam = lam0 + (d - (1 + 2 * t1 + c1) * d * d * d / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) *
          math.pow(d, 5) / 120) / cos1
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Lambert Conformal Conic on an ellipsoid (Snyder 15-1..15-11) — the
    * standard projection of regional/weather grids. Two standard
    * parallels; `lat1Deg == lat2Deg` degenerates to the single-parallel
    * form (n = sin φ1). Inverse latitude by fixed-point iteration on
    * Snyder 7-9 applied to t (converges in ≤6 rounds at double
    * precision).
    */
  final case class LambertConformal(lon0Deg: Double, lat0Deg: Double,
                                    lat1Deg: Double, lat2Deg: Double,
                                    x0: Double = 0.0, y0: Double = 0.0,
                                    a: Double = 6378137.0,
                                    invF: Double = 298.257223563 /* WGS84 */)
      extends Projection {
    private val f = 1.0 / invF
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)

    /** Snyder 15-9. */
    private def t(phi: Double): Double = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - esin) / (1 + esin), e / 2)
    }
    /** Snyder 14-15. */
    private def m(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e2 * s * s)
    }

    private val phi0 = math.toRadians(lat0Deg)
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val t0 = t(phi0); private val t1 = t(phi1); private val t2 = t(phi2)
    private val n =
      if (lat1Deg == lat2Deg) math.sin(phi1)
      else (math.log(m(phi1)) - math.log(m(phi2))) / (math.log(t1) - math.log(t2))
    require(n != 0 && !n.isNaN && !n.isInfinity,
      s"degenerate Lambert cone (n = $n) for parallels $lat1Deg/$lat2Deg" +
        " — equatorial or symmetric parallels have no valid cone")
    private val bigF = m(phi1) / (n * math.pow(t1, n))
    private def rho(tv: Double): Double = a * bigF * math.pow(tv, n)
    private val rho0 = rho(t0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val r = rho(t(math.toRadians(latDeg)))
      val theta = n * math.toRadians(lonDeg - lon0Deg)
      (x0 + r * math.sin(theta), y0 + rho0 - r * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - x0
      val dy = rho0 - (y - y0)
      val sign = if (n >= 0) 1.0 else -1.0
      val r = sign * math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(sign * dx, sign * dy)
      val tv = math.pow(r / (a * bigF), 1 / n)
      var phi = math.Pi / 2 - 2 * math.atan(tv)
      var i = 0
      while (i < 10) {
        val esin = e * math.sin(phi)
        val next = math.Pi / 2 -
          2 * math.atan(tv * math.pow((1 - esin) / (1 + esin), e / 2))
        if (math.abs(next - phi) < 1e-13) i = 10 else i += 1
        phi = next
      }
      (lon0Deg + math.toDegrees(theta / n), math.toDegrees(phi))
    }
  }

  /** Mercator (Snyder 7-7..7-10); `invF = Infinity` gives the spherical
    * form, which with a = 6378137 is Web Mercator (EPSG:3857). Inverse
    * latitude by fixed-point iteration on Snyder 7-9 (converges in ≤5
    * rounds at double precision).
    *
    * NOTE the default is the SPHERICAL form (`invF = Infinity`, i.e. Web
    * Mercator) — deliberately unlike the other projections here, whose
    * defaults are ellipsoidal, because the dominant direct use of
    * Mercator is EPSG:3857 tiling. Pass `invF = 298.257223563` (or go
    * through [[fromProj4]] with `+ellps`/`+datum`) for ellipsoidal
    * Mercator; the two differ by ~0.3% in northing.
    */
  final case class Mercator(lon0Deg: Double, k0: Double = 1.0,
                            x0: Double = 0.0, y0: Double = 0.0,
                            a: Double = 6378137.0,
                            invF: Double = Double.PositiveInfinity)
      extends Projection {
    private val f = if (invF.isInfinity) 0.0 else 1.0 / invF
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)
    private val lam0 = math.toRadians(lon0Deg)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      val esin = e * math.sin(phi)
      val y = a * k0 * math.log(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1 - esin) / (1 + esin), e / 2))
      (x0 + a * k0 * (lam - lam0), y0 + y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.exp(-(y - y0) / (a * k0))
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 8) {
        val esin = e * math.sin(phi)
        val next = math.Pi / 2 -
          2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
        if (math.abs(next - phi) < 1e-12) i = 8 else i += 1
        phi = next
      }
      (math.toDegrees(lam0 + (x - x0) / (a * k0)), math.toDegrees(phi))
    }
  }

  /** Polar Stereographic on an ellipsoid (Snyder 21-33/21-34 forward,
    * 21-39/21-40 + 7-9 iterative latitude inverse) — the projection of
    * polar EO scenes (EPSG:3413 Arctic, EPSG:3031 Antarctic). `south`
    * selects the aspect; scale comes from the standard parallel
    * `latTsDeg` when given (Snyder 21-34, the EPSG convention) or from
    * `k0` at the pole (21-33). The spherical form falls out of e = 0.
    */
  final case class PolarStereographic(lon0Deg: Double, south: Boolean,
                                      latTsDeg: Double = 90.0, k0: Double = 1.0,
                                      x0: Double = 0.0, y0: Double = 0.0,
                                      a: Double = 6378137.0,
                                      invF: Double = 298.257223563 /* WGS84 */)
      extends Projection {
    private val f = if (invF.isInfinity) 0.0 else 1.0 / invF
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)
    // everything below runs in north-aspect terms; `south` mirrors the
    // inputs (Snyder: reverse signs of φ, λ−λ0, x, y for the south aspect)
    private val phiC = math.toRadians(math.abs(latTsDeg))
    require(math.abs(latTsDeg) > 0,
      s"polar stereographic standard parallel must be off the equator: $latTsDeg")

    /** Snyder 15-9. */
    private def t(phi: Double): Double = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - esin) / (1 + esin), e / 2)
    }
    // ρ = rhoK * t: 21-33 at the pole (scale by k0), 21-34 on a standard
    // parallel (scale so the parallel is true)
    private val rhoK =
      if (math.abs(math.abs(latTsDeg) - 90) < 1e-12)
        2 * a * k0 / math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
      else {
        val s = math.sin(phiC)
        val mc = math.cos(phiC) / math.sqrt(1 - e2 * s * s)
        a * mc / t(phiC)
      }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phiN = math.toRadians(if (south) -latDeg else latDeg)
      val dLam = math.toRadians(lonDeg - lon0Deg)
      val rho = rhoK * t(phiN)
      val x = rho * math.sin(dLam)
      val y = if (south) rho * math.cos(dLam) else -rho * math.cos(dLam)
      (x0 + x, y0 + y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - x0
      val dy = y - y0
      val rho = math.hypot(dx, dy)
      val dLam =
        if (rho == 0) 0.0
        else if (south) math.atan2(dx, dy)
        else math.atan2(dx, -dy)
      val tv = rho / rhoK
      var phi = math.Pi / 2 - 2 * math.atan(tv)
      var i = 0
      while (i < 10) {
        val esin = e * math.sin(phi)
        val next = math.Pi / 2 -
          2 * math.atan(tv * math.pow((1 - esin) / (1 + esin), e / 2))
        if (math.abs(next - phi) < 1e-13) i = 10 else i += 1
        phi = next
      }
      val lat = math.toDegrees(if (south) -phi else phi)
      (lon0Deg + math.toDegrees(dLam), lat)
    }
  }

  /** Lambert Azimuthal Equal-Area on an ellipsoid (Snyder 24-17..24-20
    * oblique forward, 24-26..24-29 inverse, authalic-latitude machinery
    * from 3-11..3-13 and the 3-16 iterative latitude) — continental
    * equal-area grids (EPSG:3035 Europe, EPSG:6933-adjacent uses). Polar
    * aspects (|lat0| = 90) use the exact 24-23/24-25 forms; the spherical
    * case falls out of e = 0 with q = 2 sin φ.
    */
  final case class LambertAzimuthalEqualArea(lon0Deg: Double, lat0Deg: Double,
                                             x0: Double = 0.0, y0: Double = 0.0,
                                             a: Double = 6378137.0,
                                             invF: Double = 298.257222101 /* GRS80 */)
      extends Projection {
    private val f = if (invF.isInfinity) 0.0 else 1.0 / invF
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)

    /** Snyder 3-12 (sphere limit: q = 2 sin φ). */
    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      if (e < 1e-12) 2 * s
      else (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private val qp = q(math.Pi / 2)
    private val rq = a * math.sqrt(qp / 2) // 3-13 authalic radius
    private val phi0 = math.toRadians(lat0Deg)
    private val northPolar = lat0Deg >= 90.0 - 1e-12
    private val southPolar = lat0Deg <= -90.0 + 1e-12
    // oblique constants (unused — and divergent — at the poles)
    private val beta1 = if (northPolar || southPolar) 0.0
      else math.asin(clamp1(q(phi0) / qp))
    private val sinB1 = math.sin(beta1)
    private val cosB1 = math.cos(beta1)
    private val d = if (northPolar || southPolar) 1.0 else {
      val s = math.sin(phi0)
      val m1 = math.cos(phi0) / math.sqrt(1 - e2 * s * s)
      a * m1 / (rq * cosB1) // 24-20
    }

    private def clamp1(v: Double): Double = math.max(-1.0, math.min(1.0, v))

    /** Snyder 3-16: latitude from the authalic q by iteration (exact in
      * one step on the sphere).
      */
    private def phiFromQ(qq: Double): Double = {
      if (e < 1e-12) return math.asin(clamp1(qq / 2))
      if (math.abs(qq) >= math.abs(qp) - 1e-14) return math.signum(qq) * math.Pi / 2
      var phi = math.asin(clamp1(qq / 2))
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val one = 1 - e2 * s * s
        val delta = (one * one) / (2 * math.cos(phi)) *
          (qq / (1 - e2) - s / one +
            math.log((1 - e * s) / (1 + e * s)) / (2 * e))
        phi += delta
        i += 1
      }
      phi
    }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dLam = math.toRadians(lonDeg - lon0Deg)
      val qv = q(phi)
      if (northPolar) {
        val rho = a * math.sqrt(math.max(0, qp - qv)) // 24-23
        (x0 + rho * math.sin(dLam), y0 - rho * math.cos(dLam))
      } else if (southPolar) {
        val rho = a * math.sqrt(math.max(0, qp + qv))
        (x0 + rho * math.sin(dLam), y0 + rho * math.cos(dLam))
      } else {
        val beta = math.asin(clamp1(qv / qp))
        val sinB = math.sin(beta); val cosB = math.cos(beta)
        val denom = 1 + sinB1 * sinB + cosB1 * cosB * math.cos(dLam)
        val b = rq * math.sqrt(2 / denom) // 24-19
        (x0 + b * d * cosB * math.sin(dLam), // 24-17
          y0 + (b / d) * (cosB1 * sinB - sinB1 * cosB * math.cos(dLam))) // 24-18
      }
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - x0
      val dy = y - y0
      if (northPolar || southPolar) {
        val rho = math.hypot(dx, dy)
        val qq0 = qp - (rho / a) * (rho / a)
        val qq = if (southPolar) -qq0 else qq0
        val dLam =
          if (rho == 0) 0.0
          else if (southPolar) math.atan2(dx, dy)
          else math.atan2(dx, -dy)
        (lon0Deg + math.toDegrees(dLam), math.toDegrees(phiFromQ(qq)))
      } else {
        val rho = math.hypot(dx / d, d * dy) // 24-28
        if (rho < 1e-12) return (lon0Deg, lat0Deg)
        val ce = 2 * math.asin(clamp1(rho / (2 * rq))) // 24-29
        val sinCe = math.sin(ce); val cosCe = math.cos(ce)
        val qq = qp * (cosCe * sinB1 + d * dy * sinCe * cosB1 / rho) // 24-27
        val lam = math.atan2(dx * sinCe, // 24-26
          d * rho * cosB1 * cosCe - d * d * dy * sinB1 * sinCe)
        (lon0Deg + math.toDegrees(lam), math.toDegrees(phiFromQ(qq)))
      }
    }
  }

  /** UTM zone (1-60), northern or southern variant, on WGS84. */
  def utm(zone: Int, south: Boolean): Projection = {
    require(zone >= 1 && zone <= 60, s"UTM zone out of range: $zone")
    TransverseMercator(lon0Deg = zone * 6.0 - 183.0,
      y0 = if (south) 10000000.0 else 0.0)
  }

  private val UtmName = "utm([0-9]{1,2})([ns])".r

  /** Ellipsoidal stereographic, oblique/equatorial aspect (Snyder PP1395
    * 21-27..21-39 over the conformal latitude, 3-1/3-4): the aspect for
    * mid-latitude regional CRSs with a +lat_0 off the poles. `invF =
    * Infinity` gives the spherical form (conformal latitude degenerates
    * to the geodetic). Polar centers belong to [[PolarStereographic]]
    * (this form divides by cos χ₁).
    */
  final case class ObliqueStereographic(lon0Deg: Double, lat0Deg: Double,
                                        k0: Double = 1.0,
                                        x0: Double = 0.0, y0: Double = 0.0,
                                        a: Double = 6378137.0,
                                        invF: Double = 298.257223563 /* WGS84 */)
      extends Projection {
    require(math.abs(lat0Deg) < 90 - 1e-9,
      s"oblique stereographic needs a non-polar center, got lat_0=$lat0Deg")
    private val f = if (invF.isInfinity) 0.0 else 1.0 / invF
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)

    /** Conformal latitude χ(φ) (Snyder 3-1). */
    private def chiOf(phi: Double): Double = {
      val esin = e * math.sin(phi)
      2 * math.atan(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1 - esin) / (1 + esin), e / 2)) - math.Pi / 2
    }
    private val phi1 = math.toRadians(lat0Deg)
    private val chi1 = chiOf(phi1)
    private val sinChi1 = math.sin(chi1)
    private val cosChi1 = math.cos(chi1)
    private val m1 = math.cos(phi1) / math.sqrt(1 - e2 * math.sin(phi1) * math.sin(phi1))
    private val ak = 2 * a * k0 * m1

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val chi = chiOf(math.toRadians(latDeg))
      val dLam = math.toRadians(lonDeg - lon0Deg)
      val aa = ak / (cosChi1 * (1 + sinChi1 * math.sin(chi)
        + cosChi1 * math.cos(chi) * math.cos(dLam)))
      (x0 + aa * math.cos(chi) * math.sin(dLam),
       y0 + aa * (cosChi1 * math.sin(chi) - sinChi1 * math.cos(chi) * math.cos(dLam)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - x0
      val dy = y - y0
      val rho = math.hypot(dx, dy)
      if (rho == 0) return (lon0Deg, lat0Deg)
      val ce = 2 * math.atan2(rho * cosChi1, ak)
      val chi = math.asin(math.cos(ce) * sinChi1 + dy * math.sin(ce) * cosChi1 / rho)
      val dLam = math.atan2(dx * math.sin(ce),
        rho * cosChi1 * math.cos(ce) - dy * sinChi1 * math.sin(ce))
      // inverse conformal latitude (Snyder 3-4), iterated to convergence
      val tanHalf = math.tan(math.Pi / 4 + chi / 2)
      var phi = chi
      var i = 0
      while (i < 10) {
        val esin = e * math.sin(phi)
        val next = 2 * math.atan(tanHalf *
          math.pow((1 + esin) / (1 - esin), e / 2)) - math.Pi / 2
        if (math.abs(next - phi) < 1e-13) i = 10 else i += 1
        phi = next
      }
      (lon0Deg + math.toDegrees(dLam), math.toDegrees(phi))
    }
  }

  /** Named reference ellipsoids: (semi-major a, inverse flattening rf).
    * `rf = Infinity` marks a sphere. Values are the standard published
    * constants (EPSG / Snyder PP1395 table 1).
    */
  private val Ellipsoids: Map[String, (Double, Double)] = Map(
    "wgs84" -> (6378137.0, 298.257223563),
    "grs80" -> (6378137.0, 298.257222101),
    "clrk66" -> (6378206.4, 294.9786982),
    "intl" -> (6378388.0, 297.0),
    "sphere" -> (6370997.0, Double.PositiveInfinity))

  /** Parse a proj4 string (`"+proj=utm +zone=23 +south +datum=WGS84"`)
    * into a [[Projection]]. Covers the families this engine implements —
    * longlat, sinu, aea, lcc, tmerc, utm, merc, stere (polar aspects),
    * laea — with +ellps/+datum/+a/+b/+rf/+R ellipsoid resolution,
    * +lat_ts for Mercator and polar stereographic, 3-/7-parameter
    * `+towgs84` datum shifts (position-vector convention, composed via
    * [[Datum.DatumShifted]] so lon/lat at the API surface is always
    * WGS84), and GDAL's leniency toward irrelevant keys (+units,
    * +no_defs …).
    * Projections outside the set fail with a typed message naming the
    * +proj value, mirroring how unsupported JP2 payloads are reported
    * (reference accepts any CRS through rasterio/GDAL:
    * cube_builder/grids.py:92-99, utils/processing.py:223-231).
    */
  def fromProj4(proj4: String): Projection = {
    val kv: Map[String, String] = proj4.trim.split("\\s+").toSeq
      .filter(_.startsWith("+"))
      .map { tok =>
        tok.stripPrefix("+").split("=", 2) match {
          case Array(k, v) => k.toLowerCase -> v
          case Array(k) => k.toLowerCase -> ""
        }
      }.toMap
    def num(k: String): Option[Double] = kv.get(k).map(_.toDouble)

    // Ellipsoid: explicit +a/+b/+rf/+R beats +ellps beats +datum; WGS84
    // when nothing is named (proj's own default). A NAMED ellipsoid we
    // don't know is a typed error, not a silent WGS84 swap — the axes
    // differ by hundreds of meters.
    val namedKey = kv.get("ellps").orElse(kv.get("datum")).map(_.toLowerCase)
    val named = namedKey.map(n => Ellipsoids.getOrElse(n,
      throw new IllegalArgumentException(
        s"unknown ellipsoid/datum '$n' " +
          s"(supported: ${Ellipsoids.keys.toSeq.sorted.mkString(" ")}): $proj4")))
    val base = named.getOrElse(Ellipsoids("wgs84"))
    val aAxis = num("r").orElse(num("a")).getOrElse(base._1)
    val rf = num("rf").getOrElse {
      num("b").orElse(num("r")) match {
        case Some(b) if b == aAxis => Double.PositiveInfinity
        case Some(b) => aAxis / (aAxis - b)
        case None => base._2
      }
    }

    val lon0 = num("lon_0").getOrElse(0.0)
    val lat0 = num("lat_0").getOrElse(0.0)
    val x0 = num("x_0").getOrElse(0.0)
    val y0 = num("y_0").getOrElse(0.0)
    val k = num("k").orElse(num("k_0"))

    // +towgs84=dx,dy,dz[,rx,ry,rz,s] — datum-shift leg, wrapped around
    // the projection below. All-zero params are the common "this IS
    // WGS84" declaration and stay a no-op.
    val towgs84: Option[Datum.Helmert] = kv.get("towgs84").map { v =>
      val ps = v.split(",").map(_.trim.toDouble)
      require(ps.length == 3 || ps.length == 7,
        s"+towgs84 needs 3 or 7 comma-separated values, got ${ps.length}: $proj4")
      if (ps.length == 3) Datum.Helmert(ps(0), ps(1), ps(2))
      else Datum.Helmert(ps(0), ps(1), ps(2), ps(3), ps(4), ps(5), ps(6))
    }.filter(!_.isIdentity)

    // The ellipsoid the datum leg converts geodetic<->geocentric on;
    // spherical sinusoidal overrides it with its resolved radius.
    var datumA = aAxis
    var datumInvF = rf
    val baseProj: Projection = kv.getOrElse("proj", "") match {
      case "longlat" | "latlong" | "lonlat" => LongLat
      case "sinu" =>
        // The implementation is SPHERICAL sinusoidal: an explicit radius
        // (+R, or +a — with +b it must equal +a) or a named sphere sets
        // it; the MODIS authalic sphere is the default. An ellipsoidal
        // request must fail typed, not silently reproject on a sphere.
        val explicitR = num("r").orElse(num("a"))
        if (explicitR.exists(r0 => num("b").exists(_ != r0)))
          throw new IllegalArgumentException(
            s"ellipsoidal sinusoidal (+a != +b) is not supported: $proj4")
        val r = explicitR.getOrElse {
          if (namedKey.isDefined) {
            if (rf.isInfinity) aAxis
            else throw new IllegalArgumentException(
              s"ellipsoidal sinusoidal (+ellps/+datum '${namedKey.get}') " +
                s"is not supported; pass a sphere (+R / +a=+b): $proj4")
          } else 6371007.181
        }
        datumA = r; datumInvF = Double.PositiveInfinity
        Sinusoidal(lon0, x0, y0, r)
      case "aea" =>
        val lat1 = num("lat_1").getOrElse(throw new IllegalArgumentException(
          s"proj4 +proj=aea requires +lat_1: $proj4"))
        AlbersEqualArea(lon0Deg = lon0, lat0Deg = lat0,
          lat1Deg = lat1, lat2Deg = num("lat_2").getOrElse(lat1),
          x0 = x0, y0 = y0, a = aAxis, invF = rf)
      case "lcc" =>
        val lat1 = num("lat_1").getOrElse(throw new IllegalArgumentException(
          s"proj4 +proj=lcc requires +lat_1: $proj4"))
        LambertConformal(lon0Deg = lon0, lat0Deg = lat0,
          lat1Deg = lat1, lat2Deg = num("lat_2").getOrElse(lat1),
          x0 = x0, y0 = y0, a = aAxis, invF = rf)
      case "tmerc" =>
        TransverseMercator(lon0Deg = lon0, k0 = k.getOrElse(1.0),
          x0 = x0, y0 = y0, a = aAxis, invF = rf, lat0Deg = lat0)
      case "utm" =>
        val zone = num("zone").map(_.toInt).getOrElse(throw new IllegalArgumentException(
          s"proj4 +proj=utm requires +zone: $proj4"))
        require(zone >= 1 && zone <= 60, s"UTM zone out of range: $zone")
        TransverseMercator(lon0Deg = zone * 6.0 - 183.0, k0 = 0.9996,
          x0 = 500000.0, y0 = if (kv.contains("south")) 10000000.0 else 0.0,
          a = aAxis, invF = rf)
      case "merc" =>
        // +lat_ts sets the latitude of true scale: k0 = cos φts / √(1 −
        // e² sin² φts) (Snyder 7-?: scale along a parallel); explicit +k
        // wins when both appear.
        val k0 = k.getOrElse(num("lat_ts") match {
          case Some(ts) =>
            val phi = math.toRadians(ts)
            val f = if (rf.isInfinity) 0.0 else 1.0 / rf
            val e2 = f * (2 - f)
            math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
          case None => 1.0
        })
        Mercator(lon0Deg = lon0, k0 = k0, x0 = x0, y0 = y0,
          a = aAxis, invF = rf)
      case "stere" =>
        if (math.abs(math.abs(lat0) - 90) > 1e-9) {
          // oblique/equatorial aspect (Snyder 21 over conformal latitude);
          // +lat_ts is a polar-aspect parameter and is rejected here
          if (num("lat_ts").exists(ts => math.abs(ts - lat0) > 1e-12))
            throw new IllegalArgumentException(
              s"+lat_ts is only meaningful for polar stereographic: $proj4")
          ObliqueStereographic(lon0Deg = lon0, lat0Deg = lat0,
            k0 = k.getOrElse(1.0), x0 = x0, y0 = y0, a = aAxis, invF = rf)
        } else {
          // EPSG polar CRSs carry both +lat_ts and a vestigial +k=1: a
          // standard parallel off the pole defines the scale and wins
          val latTs = num("lat_ts").getOrElse(lat0)
          PolarStereographic(lon0Deg = lon0, south = lat0 < 0,
            latTsDeg = latTs, k0 = k.getOrElse(1.0),
            x0 = x0, y0 = y0, a = aAxis, invF = rf)
        }
      case "laea" =>
        LambertAzimuthalEqualArea(lon0Deg = lon0, lat0Deg = lat0,
          x0 = x0, y0 = y0, a = aAxis, invF = rf)
      case "" => throw new IllegalArgumentException(s"proj4 string has no +proj: $proj4")
      case other => throw new IllegalArgumentException(
        s"unsupported proj4 projection '+proj=$other' " +
          s"(supported: longlat sinu aea lcc tmerc utm merc stere laea): $proj4")
    }
    towgs84 match {
      case Some(h) => Datum.DatumShifted(baseProj, datumA, datumInvF, h)
      case None => baseProj
    }
  }

  /** Reference projections by name ("aea" | "sinu" | "longlat"), plus
    * "tmerc" (central meridian = `meridian`) and "utm<zone><n|s>"
    * (e.g. "utm23s") for Sentinel-2's native UTM grids. A name starting
    * with "+" is parsed as a full proj4 string via [[fromProj4]].
    */
  def projectionFor(name: String, meridian: Double): Projection = name match {
    case p4 if p4.startsWith("+") => fromProj4(p4)
    case "aea" =>
      AlbersEqualArea(lon0Deg = meridian, lat0Deg = -12, lat1Deg = -2, lat2Deg = -22,
        x0 = 5000000, y0 = 10000000)
    case "sinu" => Sinusoidal(meridian)
    case "longlat" => LongLat
    case "tmerc" => TransverseMercator(lon0Deg = meridian)
    case UtmName(zone, hemi) => utm(zone.toInt, hemi == "s")
    case other => throw new IllegalArgumentException(s"unsupported projection: $other")
  }

  /** Tessellate `bbox` (projected coords, (xl, xr, yb, yu)) into tiles of
    * `tileSize`, anchored to the grid origin (gridXMin, gridYMax).
    */
  def createTiles(grid: String,
                  tileSizeX: Double, tileSizeY: Double,
                  gridXMin: Double, gridYMax: Double,
                  xl: Double, xr: Double, yb: Double, yu: Double,
                  srid: Int): Seq[Tile] = {
    val hMin = ((xl - gridXMin) / tileSizeX).toInt
    val hMax = ((xr - gridXMin) / tileSizeX).toInt
    val vMin = ((gridYMax - yu) / tileSizeY).toInt
    val vMax = ((gridYMax - yb) / tileSizeY).toInt
    for {
      ih <- hMin to hMax
      iv <- vMin to vMax
    } yield {
      val x1 = gridXMin + ih * tileSizeX
      val y1 = gridYMax - iv * tileSizeY
      Tile(grid, f"$ih%03d$iv%03d", x1, y1 - tileSizeY, x1 + tileSizeX, y1, srid)
    }
  }

  /** Hierarchical grid creation: one entry per (name, factor) pair, all
    * anchored to the finest grid's origin so coarse tiles nest exactly.
    *
    * @param tileFactors resolution factors per grid, finest first
    * @param shape       pivot tile shape in pixels (width, height)
    * @param bbox        WGS84 lon/lat (w, s, e, n)
    */
  def createGrids(names: Seq[String], projection: String, meridian: Double,
                  tileFactors: Seq[(Int, Int)], shape: (Int, Int),
                  bbox: (Double, Double, Double, Double),
                  srid: Int = 100001): Map[String, Seq[Tile]] = {
    val proj = projectionFor(projection, meridian)
    val (w, s, e, n) = bbox
    val (tileW, tileH) = shape
    val (refResX, refResY) = tileFactors.head

    // Center tile around the meridian at the projection's reference latitude.
    val (mx, my) = proj.forward(meridian, -12)
    val xminCenter = mx - (tileW / 2.0) * refResX
    val xmaxCenter = mx + (tileW / 2.0) * refResX
    val yminCenter = my - (tileH / 2.0) * refResY
    val ymaxCenter = my + (tileH / 2.0) * refResY
    val tileSizeX = xmaxCenter - xminCenter
    val tileSizeY = ymaxCenter - yminCenter

    // Envelope of the projected bbox (sampled along edges: projected edges
    // curve, so corners alone under-cover).
    val samples = for {
      i <- 0 to 32
      (lon, lat) <- Seq(
        (w + (e - w) * i / 32.0, s), (w + (e - w) * i / 32.0, n),
        (w, s + (n - s) * i / 32.0), (e, s + (n - s) * i / 32.0))
    } yield proj.forward(lon, lat)
    val envXMin = samples.map(_._1).min
    val envYMax = samples.map(_._2).max

    val tilesLeft = math.ceil(math.abs(xminCenter - envXMin) / tileSizeX)
    val tilesUpper = math.ceil(math.abs(ymaxCenter - envYMax) / tileSizeY) + 1
    val gridXMin = xminCenter - tilesLeft * tileSizeX
    val gridYMax = ymaxCenter + tilesUpper * tileSizeY

    // Working bbox in projected coordinates (corner points, per reference).
    val (xlP, _) = proj.forward(w, 0)
    val (xrP, _) = proj.forward(e, 0)
    val (_, yuP) = proj.forward(meridian, n)
    val (_, ybP) = proj.forward(meridian, s)

    names.zip(tileFactors).map { case (name, (fx, fy)) =>
      val gx = tileSizeX * (fx.toDouble / refResX)
      val gy = tileSizeY * (fy.toDouble / refResY)
      name -> createTiles(name, gx, gy, gridXMin, gridYMax, xlP, xrP, ybP, yuP, srid)
    }.toMap
  }
}
