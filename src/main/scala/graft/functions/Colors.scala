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
    // NaN maps to null like null input — matplotlib routes NaN to the
    // 'bad' (transparent) color; the unguarded clamp ordered NaN
    // greatest and silently painted it as vmax
    when(c.isNull || isnan(c.cast("double")), lit(null)).otherwise(
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

  // ── named colors + user palettes (ezdata/matplotlib/colors.py) ────

  /** Web color names → hex (colors.py:10–87 COLOR_LOOKUP — the CSS3
    * extended color keywords, a published standard table). */
  val colorLookup: Map[String, String] = Map(
    "aliceblue" -> "#F0F8FF", "antiquewhite" -> "#FAEBD7", "aqua" -> "#00FFFF",
    "aquamarine" -> "#7FFFD4", "azure" -> "#F0FFFF", "beige" -> "#F5F5DC",
    "bisque" -> "#FFE4C4", "black" -> "#000000", "blanchedalmond" -> "#FFEBCD",
    "blue" -> "#0000FF", "blueviolet" -> "#8A2BE2", "brown" -> "#A52A2A",
    "burlywood" -> "#DEB887", "cadetblue" -> "#5F9EA0", "chartreuse" -> "#7FFF00",
    "chocolate" -> "#D2691E", "coral" -> "#FF7F50", "cornflowerblue" -> "#6495ED",
    "cornsilk" -> "#FFF8DC", "crimson" -> "#DC143C", "cyan" -> "#00FFFF",
    "darkblue" -> "#00008B", "darkcyan" -> "#008B8B", "darkgoldenrod" -> "#B8860B",
    "darkgray" -> "#A9A9A9", "darkgreen" -> "#006400", "darkgrey" -> "#A9A9A9",
    "darkkhaki" -> "#BDB76B", "darkmagenta" -> "#8B008B", "darkolivegreen" -> "#556B2F",
    "darkorange" -> "#FF8C00", "darkorchid" -> "#9932CC", "darkred" -> "#8B0000",
    "darksage" -> "#598556", "darksalmon" -> "#E9967A", "darkseagreen" -> "#8FBC8F",
    "darkslateblue" -> "#483D8B", "darkslategray" -> "#2F4F4F", "darkslategrey" -> "#2F4F4F",
    "darkturquoise" -> "#00CED1", "darkviolet" -> "#9400D3", "deeppink" -> "#FF1493",
    "deepskyblue" -> "#00BFFF", "dimgray" -> "#696969", "dimgrey" -> "#696969",
    "dodgerblue" -> "#1E90FF", "firebrick" -> "#B22222", "floralwhite" -> "#FFFAF0",
    "forestgreen" -> "#228B22", "fuchsia" -> "#FF00FF", "gainsboro" -> "#DCDCDC",
    "ghostwhite" -> "#F8F8FF", "gold" -> "#FFD700", "goldenrod" -> "#DAA520",
    "gray" -> "#808080", "green" -> "#008000", "greenyellow" -> "#ADFF2F",
    "grey" -> "#808080", "honeydew" -> "#F0FFF0", "hotpink" -> "#FF69B4",
    "indianred" -> "#CD5C5C", "indigo" -> "#4B0082", "ivory" -> "#FFFFF0",
    "khaki" -> "#F0E68C", "lavender" -> "#E6E6FA", "lavenderblush" -> "#FFF0F5",
    "lawngreen" -> "#7CFC00", "lemonchiffon" -> "#FFFACD", "lightblue" -> "#ADD8E6",
    "lightcoral" -> "#F08080", "lightcyan" -> "#E0FFFF", "lightgoldenrodyellow" -> "#FAFAD2",
    "lightgray" -> "#D3D3D3", "lightgreen" -> "#90EE90", "lightgrey" -> "#D3D3D3",
    "lightpink" -> "#FFB6C1", "lightsage" -> "#BCECAC", "lightsalmon" -> "#FFA07A",
    "lightseagreen" -> "#20B2AA", "lightskyblue" -> "#87CEFA", "lightslategray" -> "#778899",
    "lightslategrey" -> "#778899", "lightsteelblue" -> "#B0C4DE", "lightyellow" -> "#FFFFE0",
    "lime" -> "#00FF00", "limegreen" -> "#32CD32", "linen" -> "#FAF0E6",
    "magenta" -> "#FF00FF", "maroon" -> "#800000", "mediumaquamarine" -> "#66CDAA",
    "mediumblue" -> "#0000CD", "mediumorchid" -> "#BA55D3", "mediumpurple" -> "#9370DB",
    "mediumseagreen" -> "#3CB371", "mediumslateblue" -> "#7B68EE",
    "mediumspringgreen" -> "#00FA9A", "mediumturquoise" -> "#48D1CC",
    "mediumvioletred" -> "#C71585", "midnightblue" -> "#191970", "mintcream" -> "#F5FFFA",
    "mistyrose" -> "#FFE4E1", "moccasin" -> "#FFE4B5", "navajowhite" -> "#FFDEAD",
    "navy" -> "#000080", "oldlace" -> "#FDF5E6", "olive" -> "#808000",
    "olivedrab" -> "#6B8E23", "orange" -> "#FFA500", "orangered" -> "#FF4500",
    "orchid" -> "#DA70D6", "palegoldenrod" -> "#EEE8AA", "palegreen" -> "#98FB98",
    "paleturquoise" -> "#AFEEEE", "palevioletred" -> "#DB7093", "papayawhip" -> "#FFEFD5",
    "peachpuff" -> "#FFDAB9", "peru" -> "#CD853F", "pink" -> "#FFC0CB",
    "plum" -> "#DDA0DD", "powderblue" -> "#B0E0E6", "purple" -> "#800080",
    "red" -> "#FF0000", "rosybrown" -> "#BC8F8F", "royalblue" -> "#4169E1",
    "saddlebrown" -> "#8B4513", "sage" -> "#87AE73", "salmon" -> "#FA8072",
    "sandybrown" -> "#FAA460", "seagreen" -> "#2E8B57", "seashell" -> "#FFF5EE",
    "sienna" -> "#A0522D", "silver" -> "#C0C0C0", "skyblue" -> "#87CEEB",
    "slateblue" -> "#6A5ACD", "slategray" -> "#708090", "slategrey" -> "#708090",
    "snow" -> "#FFFAFA", "springgreen" -> "#00FF7F", "steelblue" -> "#4682B4",
    "tan" -> "#D2B48C", "teal" -> "#008080", "thistle" -> "#D8BFD8",
    "tomato" -> "#FF6347", "turquoise" -> "#40E0D0", "violet" -> "#EE82EE",
    "wheat" -> "#F5DEB3", "white" -> "#FFFFFF", "whitesmoke" -> "#F5F5F5",
    "yellow" -> "#FFFF00", "yellowgreen" -> "#9ACD32")

  /** `'#RRGGBB'` → (r, g, b) in 0–255 (colors.py:91–103 hex_to_rgb);
    * throws IllegalArgumentException on malformed input, like the
    * reference raises ValueError. */
  def hexToRgb(hex: String): (Int, Int, Int) = {
    require(hex.startsWith("#") && hex.length == 7, s"Invalid hex color: $hex")
    try ((Integer.parseInt(hex.substring(1, 3), 16),
          Integer.parseInt(hex.substring(3, 5), 16),
          Integer.parseInt(hex.substring(5, 7), 16)))
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"Invalid hex color: $hex") }
  }

  /** Name or hex → (r, g, b) (colors.py:106–137 rgb). */
  def rgbOf(color: String): (Int, Int, Int) =
    if (color.startsWith("#")) hexToRgb(color)
    else hexToRgb(colorLookup.getOrElse(color.toLowerCase,
      throw new IllegalArgumentException(s"Unknown color: '$color'")))

  /** (r, g, b) normalized to [0, 1) by /256 — colors.py:140–144
    * normed_rgb (the reference divides by 256, not 255; mirrored). */
  def normedRgb(color: String): (Double, Double, Double) = {
    val (r, g, b) = rgbOf(color)
    (r / 256.0, g / 256.0, b / 256.0)
  }

  /** Example palettes shipped with the reference (colors.py:146–157):
    * bokeh Greys9, an adjusted `hot`, and a terrestrial elevation ramp. */
  val greys9: Seq[String] = Seq("#000000", "#252525", "#525252", "#737373",
    "#969696", "#bdbdbd", "#d9d9d9", "#f0f0f0", "#ffffff")
  val hot: Seq[String] = Seq("black", "maroon", "darkred", "red", "orangered",
    "darkorange", "orange", "gold", "yellow", "white")
  val elevation: Seq[String] = Seq("aqua", "sandybrown", "limegreen", "green",
    "green", "darkgreen", "saddlebrown", "gray", "white")

  /** Build an interpolating [[Palette]] from named/hex color anchors —
    * the colors.py:160–167 generate_cmap_from_colors equivalent (a
    * LinearSegmentedColormap IS its anchor list here; [[colorify]]
    * interpolates between anchors at eval time). */
  def paletteFromColors(seq: Seq[String]): Palette = {
    require(seq.size >= 2, "palette needs at least 2 anchor colors")
    seq.map(normedRgb)
  }
}
