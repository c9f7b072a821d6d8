package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.sql.functions.{col, lit}

/** HEALPix NESTED-scheme `ang2pix` (the reference calls healpy's
  * `ang2pix(order2nside(level), θ, φ, nest=True)`,
  * ezdata/astro/astro.py:178–211).  No Spark builtin exists, so this is
  * the engine's custom Catalyst `Expression` (SURVEY.md §4.3): ~60
  * lines of bit math, implemented from the published HEALPix geometry
  * (Górski et al. 2005, ApJ 622, 759) — z-longitude face mapping plus
  * bit interleave.  `doGenCode` emits a static call so the expression
  * participates in whole-stage codegen.
  */
object Healpix {

  /** Interleave the low 32 bits of v into even bit positions. */
  def spreadBits(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** (face, ix, iy) → nested pixel index. */
  def xyf2nest(nside: Long, ix: Long, iy: Long, face: Long): Long =
    face * nside * nside + spreadBits(ix) + (spreadBits(iy) << 1)

  /** Nested ang2pix from z = sin(lat) and φ = lon in radians. */
  def ang2pixNestZPhi(order: Int, z: Double, phi: Double): Long = {
    val nside = 1L << order
    val za = math.abs(z)
    val twoPi = 2.0 * math.Pi
    val phiN = {
      val p = phi % twoPi
      if (p < 0) p + twoPi else p
    }
    val tt = phiN / (0.5 * math.Pi) // in [0, 4)
    if (za <= 2.0 / 3.0) {
      // equatorial region
      val temp1 = nside * (0.5 + tt)
      val temp2 = nside * (z * 0.75)
      val jp = (temp1 - temp2).toLong // ascending edge line index
      val jm = (temp1 + temp2).toLong // descending edge line index
      val ifp = jp >> order
      val ifm = jm >> order
      val face =
        if (ifp == ifm) (ifp & 3) + 4
        else if (ifp < ifm) ifp & 3
        else (ifm & 3) + 8
      val ix = jm & (nside - 1)
      val iy = nside - (jp & (nside - 1)) - 1
      xyf2nest(nside, ix, iy, face)
    } else {
      // polar caps
      val nttRaw = tt.toLong
      val ntt = if (nttRaw >= 4) 3L else nttRaw
      val tp = tt - ntt
      val tmp = nside * math.sqrt(3.0 * (1.0 - za))
      val jpRaw = (tp * tmp).toLong
      val jmRaw = ((1.0 - tp) * tmp).toLong
      val jp = math.min(jpRaw, nside - 1)
      val jm = math.min(jmRaw, nside - 1)
      if (z >= 0)
        xyf2nest(nside, nside - jm - 1, nside - jp - 1, ntt)
      else
        xyf2nest(nside, jp, jm, ntt + 8)
    }
  }

  /** Astronomy convention entry: lon/lat (ra/dec) in degrees. */
  def ang2pixNestLonLat(order: Int, lonDeg: Double, latDeg: Double): Long =
    ang2pixNestZPhi(order, math.sin(math.toRadians(latDeg)), math.toRadians(lonDeg))

  /** Column surface: `healpix(order, lon, lat)` in degrees. */
  def ang2pix(order: Int, lonDeg: Column, latDeg: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(HealpixAng2Pix(order,
      GraftBridge.expression(lonDeg.cast(DoubleType)),
      GraftBridge.expression(latDeg.cast(DoubleType))))
  }

  /** Register `healpix_ang2pix(order, lon, lat)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "healpix_ang2pix",
      exprs => {
        require(exprs.length == 3, "healpix_ang2pix(order, lon_deg, lat_deg)")
        val order = exprs.head.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(s"order must be a literal int, got $other")
        }
        import org.apache.spark.sql.catalyst.expressions.Cast
        HealpixAng2Pix(order, Cast(exprs(1), DoubleType), Cast(exprs(2), DoubleType))
      },
      "scala_udf")
}

/** Codegen-friendly nested ang2pix over (lonDeg, latDeg). */
case class HealpixAng2Pix(order: Int, left: Expression, right: Expression)
    extends BinaryExpression {
  require(order >= 0 && order <= 29, s"healpix order $order out of [0, 29]")

  override def dataType: DataType = LongType
  override def prettyName: String = "healpix_ang2pix"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    Healpix.ang2pixNestLonLat(order, lon.asInstanceOf[Double], lat.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat) =>
      s"${ev.value} = graft.functions.Healpix.ang2pixNestLonLat($order, $lon, $lat);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
