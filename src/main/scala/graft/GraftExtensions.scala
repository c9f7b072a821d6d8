package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType
import graft.functions.HealpixAng2Pix

/** SparkSessionExtensions entry point: install the engine's custom
  * Catalyst surface into any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  *
  * Currently registers `healpix_ang2pix(order, lon_deg, lat_deg)` —
  * the one scalar the reference needs that Spark lacks as a builtin
  * (SURVEY.md §4.3).  Alias/caseless resolution and NumPy-expression
  * translation intentionally live *above* the plan (they rewrite
  * names/strings before Catalyst sees them), so no custom Rule or
  * Strategy is required for reference parity (SURVEY.md §4.1–4.2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("healpix_ang2pix"),
      new ExpressionInfo(classOf[HealpixAng2Pix].getName, "healpix_ang2pix"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "healpix_ang2pix(order, lon_deg, lat_deg)")
        val order = exprs.head.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(s"order must be a literal int, got $other")
        }
        HealpixAng2Pix(order, Cast(exprs(1), DoubleType), Cast(exprs(2), DoubleType))
      }))
  }
}
