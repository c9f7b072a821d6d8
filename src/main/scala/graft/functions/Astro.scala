package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Astronomy-flavored scalar surface of the reference, re-expressed as
  * pure Column compositions (whole-stage-codegen friendly; no UDFs).
  *
  * References: sphdist ezdata/simpletable.py:1337–1363; conesearch
  * 1365–1415; hms/dms converters 1107–1214; Aitoff projection
  * ezdata/astro/astro.py:215–261; gaia healpix expression
  * ezdata/astro/astro.py:53–79.
  */
object Astro {

  /** Haversine angular separation in degrees between two points given in
    * degrees (ezdata/simpletable.py:1337–1363). */
  def sphdist(ra1: Column, dec1: Column, ra2: Column, dec2: Column): Column = {
    val dLat = radians(dec2 - dec1)
    val dLon = radians(ra2 - ra1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(dec1)) * cos(radians(dec2)) * pow(sin(dLon / 2), 2)
    // clamp against the near-antipodal a > 1 rounding case (asin of
    // 1 + ulp is NaN, and NaN orders above every double in Spark — see
    // SphDist.sphdistDeg).  when/otherwise, NOT least(): least skips
    // nulls and orders NaN greatest, which would turn a null/NaN
    // coordinate into a fabricated 180° separation; here null
    // propagates and NaN stays NaN, matching the scalar kernel
    val sq = sqrt(a)
    degrees(lit(2) * asin(when(sq > lit(1.0) && !isnan(sq), lit(1.0)).otherwise(sq)))
  }

  /** Cone-search predicate: separation from (ra0, dec0) ≤ r degrees
    * (ezdata/simpletable.py:3056–3097).  Compose with `.filter`; pair
    * with [[sphdist]] to carry the separation column like the
    * reference's `selectWhere` blobs (simpletable.py:3216).
    *
    * Built on the [[SphDist]] scalar (same arithmetic to the last
    * ULP-or-so as the Column composition) so the predicate is ONE
    * recognizable node — a session with
    * [[graft.plans.ConeZonePushdown]] installed rewrites it into
    * scan-prunable zone bands automatically. */
  def coneSearch(ra: Column, dec: Column, ra0: Double, dec0: Double, radiusDeg: Double): Column =
    SphDist.sphdist(ra, dec, lit(ra0), lit(dec0)) <= lit(radiusDeg)

  /** Cone search through a HEALPix cell cover: the cap's guaranteed-
    * superset cell set ([[Healpix.coneCells]]) becomes an IN-set
    * pre-filter ahead of the exact haversine residual — the Q3C/LSST
    * production pattern for sky catalogs.  With the cells computed on
    * the fly the IN-set only saves trig; the real win is the overload
    * below on a STORED cell column, where the IN-set is a partition /
    * row-group pruning predicate on a cell-partitioned 100 TB catalog
    * (cells are the natural partition key the zone rule can't see).
    * Results are identical to [[coneSearch]] by construction. */
  def healpixConeSearch(ra: Column, dec: Column, order: Int,
                        ra0: Double, dec0: Double, radiusDeg: Double): Column =
    healpixConeSearchOnCell(Healpix.ang2pix(order, ra, dec), ra, dec, order, ra0, dec0, radiusDeg)

  /** [[healpixConeSearch]] against a pre-computed cell column (the
    * partition key of a cell-partitioned catalog). */
  def healpixConeSearchOnCell(cell: Column, ra: Column, dec: Column, order: Int,
                              ra0: Double, dec0: Double, radiusDeg: Double): Column = {
    val cover = Healpix.coneCells(order, ra0, dec0, radiusDeg)
    cell.isInCollection(cover.toSeq) && coneSearch(ra, dec, ra0, dec0, radiusDeg)
  }

  /** Zone (box) search predicate (ezdata/simpletable.py:3099–3137).
    * A conjunctive range filter — Parquet min/max pruning applies. */
  def zoneSearch(ra: Column, dec: Column,
                 ramin: Double, ramax: Double, decmin: Double, decmax: Double): Column =
    ra >= lit(ramin) && ra <= lit(ramax) && dec >= lit(decmin) && dec <= lit(decmax)

  /** Sexagesimal "hh:mm:ss[.s]" → degrees (ezdata/simpletable.py:1107–1133).
    * Sign is carried by the hour field. */
  def hms2deg(hms: Column, delimiter: String = ":"): Column = {
    // split() takes a REGEX; quote so '.', '|', '+' delimiters split
    // literally instead of silently nulling the whole column
    val parts = split(hms, java.util.regex.Pattern.quote(delimiter))
    val sign = when(parts.getItem(0).startsWith("-"), lit(-1.0)).otherwise(lit(1.0))
    val h = abs(parts.getItem(0).cast(DoubleType))
    val m = coalesce(parts.getItem(1).cast(DoubleType), lit(0.0))
    val s = coalesce(parts.getItem(2).cast(DoubleType), lit(0.0))
    sign * (h + m / 60.0 + s / 3600.0) * 15.0
  }

  /** Sexagesimal "[+-]dd:mm:ss[.s]" → degrees (ezdata/simpletable.py:1189–1214). */
  def dms2deg(dms: Column, delimiter: String = ":"): Column = {
    val parts = split(dms, java.util.regex.Pattern.quote(delimiter)) // regex-quoted, see hms2deg
    val sign = when(parts.getItem(0).startsWith("-"), lit(-1.0)).otherwise(lit(1.0))
    val d = abs(parts.getItem(0).cast(DoubleType))
    val m = coalesce(parts.getItem(1).cast(DoubleType), lit(0.0))
    val s = coalesce(parts.getItem(2).cast(DoubleType), lit(0.0))
    sign * (d + m / 60.0 + s / 3600.0)
  }

  /** Zero-pad an integral field to AT LEAST two digits, never
    * truncating (a plain `lpad(s, 2, "0")` cuts "123" to "12").
    * Conditional concat keeps the whole formatter inside codegen'd
    * string ops — format_string("%02d") measured ~2× the full deg2hms
    * query at sf0.1 via java.util.Formatter. */
  private def pad2(v: Column): Column = {
    val s = v.cast(IntegerType).cast(StringType)
    when(length(s) === 1, concat(lit("0"), s)).otherwise(s)
  }

  /** Degrees → "hh:mm:ss.ss" (ezdata/simpletable.py:1135–1160).
    * Decomposed from the TOTAL seconds rounded to the rendered
    * precision — rounding the seconds remainder after flooring the
    * minutes could render the invalid "…:00:60.00" when the remainder
    * rounds up (the reference prints the raw float and cannot hit
    * this; the engine's fixed 2-decimal rendering can).
    *
    * NO INPUT CANONICALIZATION (same as the reference): deg is not
    * folded into [0, 360), so |deg| >= 360 — or a value that ROUNDS to
    * it at display precision, e.g. 359.9999999 — renders an hour field
    * >= 24 ("24:00:00.00").  That is the faithful rendering of the
    * given angle: [[hms2deg]] round-trips it exactly, whereas wrapping
    * the top unit mod 24 would silently map 360° to 0°.  Callers
    * needing canonical fields must fold the angle first. */
  def deg2hms(deg: Column): Column = {
    val ts = round(abs(deg) * 240.0, 2) // total seconds of time, display precision
    val h = floor(ts / 3600.0)
    val m = floor((ts - h * 3600.0) / 60.0)
    val s = ts - h * 3600.0 - m * 60.0
    concat(
      when(deg < 0, lit("-")).otherwise(lit("")),
      // pad2 pads WITHOUT truncating — lpad truncates a 3-digit field
      // to 2, silently corrupting the faithful out-of-range rendering
      // this contract promises (and format_string's java.util.Formatter
      // costs ~2x the whole query; a conditional concat stays cheap)
      pad2(h), lit(":"), pad2(m), lit(":"),
      lpad(format_number(s, 2), 5, "0")) // s < 60 by construction: never truncates
  }

  /** Degrees → "[+-]dd:mm:ss.ss" (ezdata/simpletable.py:1162–1187).
    * Same rounded-total decomposition — and same no-canonicalization
    * contract — as [[deg2hms]]: out-of-range input renders an
    * out-of-range degree field rather than silently wrapping. */
  def deg2dms(deg: Column): Column = {
    val ts = round(abs(deg) * 3600.0, 2) // total arcseconds, display precision
    val d = floor(ts / 3600.0)
    val m = floor((ts - d * 3600.0) / 60.0)
    val s = ts - d * 3600.0 - m * 60.0
    concat(
      when(deg < 0, lit("-")).otherwise(lit("+")),
      pad2(d), lit(":"), pad2(m), lit(":"), // no-truncate pad, see deg2hms
      lpad(format_number(s, 2), 5, "0"))
  }

  /** Aitoff projection (x, y) in degrees, x ∈ [-180, 180], y ∈ [-90, 90]
    * (ezdata/astro/astro.py:215–261).  `sinc` is the normalized sinc. */
  def projectAitoff(lon: Column, lat: Column): (Column, Column) = {
    // fold lon into [-180, 180)
    val l = ((lon + lit(180.0)) - floor((lon + lit(180.0)) / 360.0) * 360.0) - lit(180.0)
    val alpha2 = radians(l / 2)
    val delta = radians(lat)
    val r2 = sqrt(lit(2.0))
    val f = lit(2.0) * r2 / lit(math.Pi)
    val cdec = cos(delta)
    val denom = sqrt(lit(1.0) + cdec * cos(alpha2))
    val xr = cdec * sin(alpha2) * lit(2.0) * r2 / denom / f
    val yr = sin(delta) * r2 / denom / f
    (degrees(xr), degrees(yr))
  }

  /** Combined astro selection (ezdata/simpletable.py:3139–3224
    * `AstroTable.where/selectWhere`): conjunction of an optional
    * NumPy-expression predicate, an optional cone, and an optional
    * zone, with the cone separation carried as a column (the
    * reference's "blobs", simpletable.py:3216).  One filter → one
    * scan; all three predicates push toward the source together. */
  def combinedWhere(ez: graft.core.EzFrame, raCol: String, decCol: String,
                    condition: Option[String] = None,
                    cone: Option[(Double, Double, Double)] = None,
                    zone: Option[(Double, Double, Double, Double)] = None): graft.core.EzFrame = {
    val ra = ez.get(raCol); val dec = ez.get(decCol)
    val preds = Seq(
      condition.map(c => ez.evalexpr(c)),
      cone.map { case (ra0, dec0, r) => coneSearch(ra, dec, ra0, dec0, r) },
      zone.map { case (rmin, rmax, dmin, dmax) => zoneSearch(ra, dec, rmin, rmax, dmin, dmax) }
    ).flatten
    val filtered = if (preds.isEmpty) ez.df else ez.df.filter(preds.reduce(_ && _))
    val withSep = cone match {
      case Some((ra0, dec0, _)) =>
        filtered.withColumn("separation", sphdist(ra, dec, lit(ra0), lit(dec0)))
      case None => filtered
    }
    graft.core.EzFrame(withSep, ez.meta)
  }

  /** Gaia source_id → healpix cell at a coarser level via integer
    * division (ezdata/astro/astro.py:53–79): level-12 cells are
    * source_id / 34359738368; each step up divides by 4. */
  def gaiaHealpix(sourceId: Column, level: Int = 12): Column = {
    require(level >= 0 && level <= 12, "gaia healpix level in [0, 12]")
    // divisor = 2^35 * 4^(12-level) is a power of two; a shift keeps
    // the arithmetic exact for real source_ids > 2^53, where a double
    // division would round the quotient at cell boundaries
    shiftright(sourceId.cast(LongType), 35 + 2 * (12 - level))
  }

  def nside2npix(nside: Int): Long = 12L * nside * nside

  /** Galactic/celestial/ecliptic frame transform, the reference's
    * `euler` (ezdata/simpletable.py:1216–1335).
    * select ∈ 1..6: 1 RA-Dec→Gal, 2 Gal→RA-Dec, 3 RA-Dec→Ecl,
    * 4 Ecl→RA-Dec, 5 Ecl→Gal, 6 Gal→Ecl.  `b1950 = true` switches the
    * constant tables from J2000 (Hipparcos) to the FK4/B1950 equinox
    * (simpletable.py:1291–1300).  Pure trig Columns. */
  def euler(aiDeg: Column, biDeg: Column, select: Int,
            b1950: Boolean = false): (Column, Column) = {
    require(select >= 1 && select <= 6, "euler select in 1..6")
    val twopi = 2.0 * math.Pi
    // psi/stheta/ctheta/phi tables (simpletable.py:1289–1322)
    val (psiT, sthetaT, cthetaT, phiT) =
      if (b1950) (
        Array(0.57595865315, 4.9261918136, 0.00000000000, 0.0000000000, 0.11129056012, 4.7005372834),
        Array(0.88781538514, -0.88781538514, 0.39788119938, -0.39788119938, 0.86766174755, -0.86766174755),
        Array(0.46019978478, 0.46019978478, 0.91743694670, 0.91743694670, 0.49715499774, 0.49715499774),
        Array(4.9261918136, 0.57595865315, 0.0000000000, 0.00000000000, 4.7005372834, 0.11129056012))
      else (
        Array(0.57477043300, 4.9368292465, 0.00000000000, 0.0000000000, 0.11142137093, 4.71279419371),
        Array(0.88998808748, -0.88998808748, 0.39777715593, -0.39777715593, 0.86766622025, -0.86766622025),
        Array(0.45598377618, 0.45598377618, 0.91748206207, 0.91748206207, 0.49714719172, 0.49714719172),
        Array(4.9368292465, 0.57477043300, 0.0000000000, 0.00000000000, 4.71279419371, 0.11142137093))
    val i = select - 1
    val (psi, stheta, ctheta, phi) = (psiT(i), sthetaT(i), cthetaT(i), phiT(i))
    val a = radians(aiDeg) - lit(phi)
    val b = radians(biDeg)
    val sb = sin(b); val cb = cos(b)
    val cbsa = cb * sin(a)
    val bOut = -lit(stheta) * cbsa + lit(ctheta) * sb
    // symmetric, null/NaN-preserving clamp: the former least(bOut, 1.0)
    // missed the south-pole −1 − ulp case (asin → NaN) and turned a
    // NULL latitude into +90° (least skips nulls)
    val bClamped = when(bOut > lit(1.0) && !isnan(bOut), lit(1.0))
      .when(bOut < lit(-1.0), lit(-1.0))
      .otherwise(bOut)
    val bo = asin(bClamped)
    val aTmp = atan2(lit(ctheta) * cbsa + lit(stheta) * sb, cb * cos(a))
    val aoRad = aTmp + lit(psi + twopi)
    val ao = aoRad - floor(aoRad / lit(twopi)) * lit(twopi)
    (degrees(ao), degrees(bo))
  }
}
