package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value→color encoding (the reference's `colorify`,
  * ezdata/plotter.py:1875–1912: normalize a quantity to [0,1] and map
  * through a colormap to RGBA).  Here the mapping is a pure Column
  * expression — linear interpolation between colormap anchor points —
  * so color assignment runs distributed and codegen'd instead of
  * driver-side per point.
  *
  * Palettes are small anchor tables (public colormap definitions);
  * intermediate values interpolate linearly, exactly like matplotlib's
  * `Normalize` + LUT lookup at the anchor resolution.
  */
object Colors {

  /** (r, g, b) anchors, evenly spaced over [0, 1]. */
  type Palette = Seq[(Double, Double, Double)]

  /** A compact Spectral-like diverging palette (the reference's default
    * cmap is plt.cm.Spectral): red → orange → yellow → green → blue. */
  val spectral: Palette = Seq(
    (0.620, 0.004, 0.259), (0.835, 0.243, 0.310), (0.957, 0.427, 0.263),
    (0.992, 0.682, 0.380), (0.996, 0.878, 0.545), (1.000, 1.000, 0.749),
    (0.902, 0.961, 0.596), (0.671, 0.867, 0.643), (0.400, 0.761, 0.647),
    (0.196, 0.533, 0.741), (0.369, 0.310, 0.635))

  /** Viridis anchors (perceptually uniform; public definition). */
  val viridis: Palette = Seq(
    (0.267, 0.005, 0.329), (0.283, 0.141, 0.458), (0.254, 0.265, 0.530),
    (0.207, 0.372, 0.553), (0.164, 0.471, 0.558), (0.128, 0.567, 0.551),
    (0.135, 0.659, 0.518), (0.267, 0.749, 0.441), (0.478, 0.821, 0.318),
    (0.741, 0.873, 0.150), (0.993, 0.906, 0.144))

  /** Normalize `c` over [vmin, vmax] (clamped) — matplotlib Normalize. */
  def normalize(c: Column, vmin: Column, vmax: Column): Column = {
    val span = vmax - vmin
    val t = when(span === 0.0, lit(0.5)).otherwise((c - vmin) / span)
    greatest(lit(0.0), least(lit(1.0), t))
  }

  /** RGBA array column for `c` normalized over [vmin, vmax].
    * Linear interpolation between palette anchors; alpha fixed 1.0.
    * Null input → null color. */
  def colorify(c: Column, vmin: Column, vmax: Column,
               palette: Palette = spectral): Column = {
    val n = palette.length
    val t = normalize(c.cast("double"), vmin.cast("double"), vmax.cast("double"))
    val pos = t * (n - 1)
    // clamp i0 to n-2 so t=1.0 interpolates inside the last segment
    val i0 = least(floor(pos).cast("int"), lit(n - 2))
    val frac = pos - i0.cast("double")
    def channel(get: ((Double, Double, Double)) => Double): Column = {
      val anchors = array(palette.map(p => lit(get(p))): _*)
      val a = element_at(anchors, i0 + 1)
      val b = element_at(anchors, i0 + 2)
      a + (b - a) * frac
    }
    when(c.isNull, lit(null)).otherwise(
      array(channel(_._1), channel(_._2), channel(_._3), lit(1.0)))
  }

  /** Convenience: vmin/vmax from the data in one bounded agg pass
    * (ezdata colorify defaults vmin/vmax to data extremes). */
  def colorify(df: org.apache.spark.sql.DataFrame, c: Column): Column = {
    val r = df.agg(min(c).cast("double"), max(c).cast("double")).head()
    require(!r.isNullAt(0) && !r.isNullAt(1),
      "colorify: column has no non-null values to derive vmin/vmax from " +
        "(empty frame or all-null column) — pass vmin/vmax explicitly")
    colorify(c, lit(r.getDouble(0)), lit(r.getDouble(1)))
  }
}
