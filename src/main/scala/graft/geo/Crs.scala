package graft.geo

/** Minimal CRS registry with real projection math — the environment has no
  * GDAL/proj (SURVEY §7.0), so the CRSs exercised by the reference's tests
  * and docs are implemented directly: EPSG:4326, EPSG:3857 (web mercator)
  * and the UTM zones EPSG:326xx/327xx (e.g. 32735/32606 in the reference
  * fixtures). Formulas are the standard Snyder/Krüger series (public).
  *
  * `forward`: (lon, lat) degrees -> projected (x, y).
  * `inverse`: projected (x, y) -> (lon, lat) degrees.
  */
sealed trait Crs extends Serializable {
  def code: String
  def forward(lon: Double, lat: Double): (Double, Double)
  def inverse(x: Double, y: Double): (Double, Double)
  def isGeographic: Boolean = false
  override def toString: String = code
}

object Crs {
  // WGS84 ellipsoid
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F)
  private val E = math.sqrt(E2)

  case object LonLat extends Crs {
    val code = "EPSG:4326"
    override def isGeographic = true
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  case object WebMercator extends Crs {
    val code = "EPSG:3857"
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val x = A * math.toRadians(lon)
      val y = A * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val lon = math.toDegrees(x / A)
      val lat = math.toDegrees(2 * math.atan(math.exp(y / A)) - math.Pi / 2)
      (lon, lat)
    }
  }

  /** UTM zone (Transverse Mercator, k0=0.9996), Snyder 1987 eq. 8-9..8-25. */
  final case class Utm(zone: Int, south: Boolean) extends Crs {
    val code: String = s"EPSG:${if (south) 32700 + zone else 32600 + zone}"
    private val k0 = 0.9996
    private val lon0 = math.toRadians(zone * 6.0 - 183.0)
    private val falseNorthing = if (south) 10000000.0 else 0.0
    private val ep2 = E2 / (1 - E2)

    private def meridianArc(lat: Double): Double =
      A * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * lat
        - (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * math.sin(2 * lat)
        + (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * math.sin(4 * lat)
        - (35 * E2 * E2 * E2 / 3072) * math.sin(6 * lat))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.toRadians(latDeg)
      val lon = math.toRadians(lonDeg)
      val n = A / math.sqrt(1 - E2 * math.sin(lat) * math.sin(lat))
      val t = math.tan(lat) * math.tan(lat)
      val c = ep2 * math.cos(lat) * math.cos(lat)
      val aa = (lon - lon0) * math.cos(lat)
      val m = meridianArc(lat)
      val x = k0 * n * (aa + (1 - t + c) * aa * aa * aa / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aa, 5) / 120) + 500000.0
      val y = k0 * (m + n * math.tan(lat) * (aa * aa / 2
        + (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24
        + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aa, 6) / 720)) +
        falseNorthing
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
      val m = (y - falseNorthing) / k0
      val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
      val phi1 = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sin1 = math.sin(phi1); val cos1 = math.cos(phi1); val tan1 = math.tan(phi1)
      val c1 = ep2 * cos1 * cos1
      val t1 = tan1 * tan1
      val n1 = A / math.sqrt(1 - E2 * sin1 * sin1)
      val r1 = A * (1 - E2) / math.pow(1 - E2 * sin1 * sin1, 1.5)
      val d = (x - 500000.0) / (n1 * k0)
      val lat = phi1 - (n1 * tan1 / r1) * (d * d / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) *
          math.pow(d, 6) / 720)
      val lon = lon0 + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) *
          math.pow(d, 5) / 120) / cos1
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  // ---- Authalic-latitude machinery shared by the equal-area family ----
  // Snyder 1987: q (eq. 3-12) maps geodetic latitude to an equal-area
  // ordinate; the inverse series (eq. 3-18) recovers geodetic latitude
  // from authalic latitude beta = asin(q/Qp).
  private def qFor(sinLat: Double): Double =
    (1 - E2) * (sinLat / (1 - E2 * sinLat * sinLat)
      - (1 / (2 * E)) * math.log((1 - E * sinLat) / (1 + E * sinLat)))
  private val Qp = qFor(1.0)
  private def betaToPhi(beta: Double): Double =
    beta +
      (E2 / 3 + 31 * E2 * E2 / 180 + 517 * E2 * E2 * E2 / 5040) * math.sin(2 * beta) +
      (23 * E2 * E2 / 360 + 251 * E2 * E2 * E2 / 3780) * math.sin(4 * beta) +
      (761 * E2 * E2 * E2 / 45360) * math.sin(6 * beta)
  /** Clamped asin: q/Qp can exceed 1 by a few ulp at the poles. */
  private def asinSafe(v: Double): Double =
    math.asin(math.max(-1.0, math.min(1.0, v)))

  /** Cylindrical equal-area, ellipsoidal form (Snyder eq. 10-1..10-8).
    * e.g. EPSG:6933 = EASE-Grid 2.0 Global (WGS84, standard parallel
    * 30N, lon0 = 0) — the grid real products (e.g. soil-moisture)
    * publish on. Reference accepts any such CRS via rasterio/proj
    * (`_mdtools.py:63`). */
  final case class CylindricalEqualArea(code: String, latTs: Double,
                                        lon0Deg: Double = 0.0) extends Crs {
    private val sinTs = math.sin(math.toRadians(latTs))
    private val k0 = math.cos(math.toRadians(latTs)) / math.sqrt(1 - E2 * sinTs * sinTs)
    /** Wrap into [-180, 180]: a non-zero lon0 must not push points past
      * the antimeridian off the map. Identity on in-range values, so
      * lon0 = 0 codes (6933, 54034) keep their published ±180 corners. */
    @inline private def wrap(d: Double): Double =
      if (d > 180.0) d - 360.0 * math.ceil((d - 180.0) / 360.0)
      else if (d < -180.0) d + 360.0 * math.ceil((-d - 180.0) / 360.0)
      else d
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val x = A * k0 * math.toRadians(wrap(lonDeg - lon0Deg))
      val y = A * qFor(math.sin(math.toRadians(latDeg))) / (2 * k0)
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val beta = asinSafe(2 * y * k0 / (A * Qp))
      (wrap(lon0Deg + math.toDegrees(x / (A * k0))),
        math.toDegrees(betaToPhi(beta)))
    }
  }

  /** Albers equal-area conic, ellipsoidal form (Snyder eq. 14-1..14-12).
    * e.g. EPSG:5070 = CONUS Albers (NAD83; GRS80 differs from the WGS84
    * constants above by <0.1 mm — treated as identical here) or
    * EPSG:3577 = Australian Albers (GDA94). */
  final case class AlbersEqualArea(code: String, lat0: Double, lon0Deg: Double,
                                   lat1: Double, lat2: Double,
                                   falseE: Double = 0.0,
                                   falseN: Double = 0.0) extends Crs {
    private val lon0 = math.toRadians(lon0Deg)
    private def m(latRad: Double): Double = {
      val s = math.sin(latRad)
      math.cos(latRad) / math.sqrt(1 - E2 * s * s)
    }
    private val (m1, m2) = (m(math.toRadians(lat1)), m(math.toRadians(lat2)))
    private val (q1, q2) = (qFor(math.sin(math.toRadians(lat1))),
      qFor(math.sin(math.toRadians(lat2))))
    private val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    private val c = m1 * m1 + n * q1
    private def rho(q: Double): Double = A * math.sqrt(c - n * q) / n
    private val rho0 = rho(qFor(math.sin(math.toRadians(lat0))))
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val theta = n * (math.toRadians(lonDeg) - lon0)
      val r = rho(qFor(math.sin(math.toRadians(latDeg))))
      (falseE + r * math.sin(theta), falseN + rho0 - r * math.cos(theta))
    }
    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - falseE
      // n > 0 for northern standard parallels; atan2 signs follow Snyder
      val dy = rho0 - (y0 - falseN)
      val r = math.hypot(x, dy) * (if (n < 0) -1 else 1)
      val theta = math.atan2(x * (if (n < 0) -1 else 1), dy * (if (n < 0) -1 else 1))
      val q = (c - (r * n / A) * (r * n / A)) / n
      val lat = betaToPhi(asinSafe(q / Qp))
      (math.toDegrees(lon0 + theta / n), math.toDegrees(lat))
    }
  }

  /** Lambert azimuthal equal-area, polar aspect, ellipsoidal form
    * (Snyder eq. 24-3..24-14). EPSG:6931/6932 = EASE-Grid 2.0 North /
    * South (WGS84, lon0 = 0). The south aspect is the mirrored north:
    * q is odd in latitude, so south(lon,lat) = flipY(north(lon,-lat)). */
  final case class LambertAzimuthalEqualArea(epsg: Int, south: Boolean) extends Crs {
    val code: String = s"EPSG:$epsg"
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = if (south) -latDeg else latDeg
      val lon = math.toRadians(lonDeg)
      val r = A * math.sqrt(math.max(0.0, Qp - qFor(math.sin(math.toRadians(lat)))))
      val (x, y) = (r * math.sin(lon), -r * math.cos(lon))
      (x, if (south) -y else y)
    }
    def inverse(x: Double, y0: Double): (Double, Double) = {
      val y = if (south) -y0 else y0
      val r = math.hypot(x, y)
      val q = Qp - (r / A) * (r / A)
      val lat = math.toDegrees(betaToPhi(asinSafe(q / Qp)))
      val lon = if (r == 0) 0.0 else math.toDegrees(math.atan2(x, -y))
      (lon, if (south) -lat else lat)
    }
  }

  /** Authority-code -> (projection family, parameter row). The long
    * tail of equal-area codes is parameter rows over the three
    * implemented families, not new math (the reference accepts any proj
    * CRS via rasterio, `_mdtools.py:63`) — one line per code. Datum
    * note: GDA94/GDA2020/NAD83 ellipsoids differ from WGS84 by < 0.1 mm
    * in the constants used here. */
  private val EqualAreaRegistry: Map[String, Crs] = Seq[Crs](
    // cylindrical equal-area
    CylindricalEqualArea("EPSG:6933", latTs = 30.0), // EASE-Grid 2.0 Global
    CylindricalEqualArea("ESRI:54034", latTs = 0.0), // World Cylindrical Equal Area
    // Albers equal-area conic
    AlbersEqualArea("EPSG:5070", lat0 = 23.0, lon0Deg = -96.0,
      lat1 = 29.5, lat2 = 45.5), // CONUS Albers (NAD83)
    AlbersEqualArea("EPSG:3577", lat0 = 0.0, lon0Deg = 132.0,
      lat1 = -18.0, lat2 = -36.0), // Australian Albers (GDA94)
    AlbersEqualArea("EPSG:9473", lat0 = 0.0, lon0Deg = 132.0,
      lat1 = -18.0, lat2 = -36.0), // Australian Albers (GDA2020)
    AlbersEqualArea("EPSG:3083", lat0 = 18.0, lon0Deg = -100.0,
      lat1 = 27.5, lat2 = 35.0,
      falseE = 1500000.0, falseN = 5000000.0), // Texas Centric Albers (NAD83)
    // polar Lambert azimuthal equal-area
    LambertAzimuthalEqualArea(6931, south = false), // EASE-Grid 2.0 North
    LambertAzimuthalEqualArea(6932, south = true)   // EASE-Grid 2.0 South
  ).map(c => c.code -> c).toMap

  /** Parse "EPSG:4326" / "epsg:32735" / equal-area codes / "utm" auto. */
  def parse(s: String): Crs = s.trim.toUpperCase match {
    case "EPSG:4326" | "WGS84" => LonLat
    case "EPSG:3857" => WebMercator
    case c if EqualAreaRegistry.contains(c) => EqualAreaRegistry(c)
    case c if c.startsWith("EPSG:326") && c.length == 10 =>
      Utm(c.drop(8).toInt, south = false)
    case c if c.startsWith("EPSG:327") && c.length == 10 =>
      Utm(c.drop(8).toInt, south = true)
    case other => throw new IllegalArgumentException(s"Unsupported CRS: $other")
  }

  /** Auto-UTM from a lon/lat point (the reference's `crs="utm"`,
    * `_stac_load.py:220-222`). */
  def utmFor(lon: Double, lat: Double): Crs = {
    val zone = math.min(60, math.max(1, ((lon + 180) / 6).toInt + 1))
    Utm(zone, south = lat < 0)
  }

  /** Transform a point between CRSs via lon/lat. */
  def transform(from: Crs, to: Crs, x: Double, y: Double): (Double, Double) = {
    if (from == to) (x, y)
    else {
      val (lon, lat) = from.inverse(x, y)
      to.forward(lon, lat)
    }
  }
}
