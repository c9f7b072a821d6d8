package graft.plot

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Colors

/** Theme tier (reference per-backend themes re-expressed for the SVG
  * renderer) + the colors.py lookup/palette helpers. */
class ThemeSpec extends AnyFunSuite {

  private val enc = Map("x" -> Map("field" -> "x"), "y" -> Map("field" -> "y"))
  private val histSpec = PlotSpec("bar",
    (0 until 10).map(i => Map[String, Any]("x" -> i.toDouble, "y" -> (i * 3 % 7).toDouble)),
    enc, title = Some("demo"))

  test("classic theme is byte-identical to the themeless render (goldens stay valid)") {
    assert(SvgRender.render(histSpec) == SvgRender.render(histSpec, theme = Theme.classic))
    val facets = FacetSpec(Seq("a" -> histSpec, "b" -> histSpec))
    assert(SvgRender.renderFacets(facets) ==
      SvgRender.renderFacets(facets, theme = Theme.classic))
    val corner = CornerSpec(Seq((("x", "x"), histSpec)), Map("x" -> (1.0, 2.0, 3.0)))
    assert(SvgRender.renderCorner(corner) ==
      SvgRender.renderCorner(corner, theme = Theme.classic))
  }

  test("fivethirtyeight: gridlines, no frame, its colorway, white canvas, 538 font scale") {
    val svg = SvgRender.render(histSpec, theme = Theme.fivethirtyeight)
    assert(svg.contains("""fill="#ffffff""""), "white background rect")
    assert(svg.contains("""stroke="#cbcbcb""""), "gridlines in #cbcbcb")
    assert(!svg.contains("""fill="none" stroke="#cbcbcb""""), "no frame box")
    assert(svg.contains("""fill="#008fd5""""), "first colorway color drives bars")
    assert(svg.contains("""font-size="14"""") && svg.contains("""font-size="20""""),
      "tick 14 / title 20 (plotly template sizes)")
    assert(svg.contains("""fill="#808080""""), "gray tick labels")
    // ticklen 0: no outward tick marks below the axis line
    assert(!svg.contains("""y2="334""""), "no 4px tick stubs (330+4) under the plot")
  }

  test("light-minimal: serif, left+bottom spines only, #666666, outward 5px ticks") {
    val svg = SvgRender.render(histSpec, theme = Theme.lightMinimal)
    assert(svg.contains("""font-family="serif""""))
    assert(svg.contains("""stroke="#666666""""), "spine/tick color")
    assert(!svg.contains("""<rect x="38" y="22" width""""), "no full frame box")
    // two spine lines: left (x=38 vertical) and bottom (y=330 horizontal)
    assert(svg.contains("""<line x1="38" y1="22" x2="38" y2="330" stroke="#666666"/>"""))
    assert(svg.contains("""<line x1="38" y1="330" x2="472" y2="330" stroke="#666666"/>"""))
    assert(svg.contains("""y2="335""""), "5px outward x-tick marks")
    assert(svg.contains("""font-size="9"""") && svg.contains("""font-size="17""""),
      "12pt ladder: small=9 ticks, x-large=17 titles")
  }

  test("themes render deterministically and byName resolves aliases") {
    for (t <- Seq(Theme.classic, Theme.fivethirtyeight, Theme.lightMinimal))
      assert(SvgRender.render(histSpec, theme = t) == SvgRender.render(histSpec, theme = t))
    assert(Theme.byName("538") == Theme.fivethirtyeight)
    assert(Theme.byName("light_minimal") == Theme.lightMinimal)
    assert(Theme.byName("classic") == Theme.classic)
    intercept[IllegalArgumentException](Theme.byName("dark-mode"))
  }

  test("facet cycle honors the theme palette") {
    val f = FacetSpec(Seq("a" -> histSpec, "b" -> histSpec, "c" -> histSpec))
    val svg = SvgRender.renderFacets(f, theme = Theme.fivethirtyeight)
    for (c <- Seq("#008fd5", "#fc4f30", "#e5ae38"))
      assert(svg.contains(s"""fill="$c""""), s"colorway $c cycles through facets")
    assert(!svg.contains("#1f77b4"), "tab10 must not leak into a themed render")
  }

  test("PNG backend: classic theme byte-identical, themed renders differ deterministically") {
    assert(java.util.Arrays.equals(PngRender.render(histSpec),
      PngRender.render(histSpec, theme = Theme.classic)),
      "classic PNG must match the themeless render (goldens stay valid)")
    for (t <- Seq(Theme.fivethirtyeight, Theme.lightMinimal)) {
      val a = PngRender.render(histSpec, theme = t)
      assert(java.util.Arrays.equals(a, PngRender.render(histSpec, theme = t)),
        s"${t.name} PNG must be deterministic")
      assert(!java.util.Arrays.equals(a, PngRender.render(histSpec)),
        s"${t.name} PNG must differ from classic")
    }
    // 538 bars carry its colorway, not tab10
    val px538 = graft.functions.MediaCodecs.pngDecodeRgb(
      PngRender.render(histSpec, theme = Theme.fivethirtyeight)).get._3
    def has(rgb: Array[Byte], r: Int, g: Int, b: Int): Boolean =
      rgb.grouped(3).exists(p => (p(0) & 0xff) == r && (p(1) & 0xff) == g && (p(2) & 0xff) == b)
    // bars draw at alpha 0.75 over white: 255 + (c-255)*0.75 per channel
    // for #008fd5 -> (64, 171, 224)
    assert(has(px538, 64, 171, 224), "538 blue (0.75 alpha over white) in the raster")
    assert(has(px538, 0xcb, 0xcb, 0xcb), "gridline gray present")
  }

  test("hexColor expands 3-digit hex (classic #999 frame keeps its gray)") {
    assert(PngRender.hexColor("#999") == 0x999999)
    assert(PngRender.hexColor("#1f77b4") == 0x1f77b4)
  }

  test("colors.py helpers: lookup, hex parse, normed rgb, palette-from-colors") {
    assert(Colors.rgbOf("plum") == ((221, 160, 221)))
    assert(Colors.rgbOf("#FFFFFF") == ((255, 255, 255)))
    assert(Colors.hexToRgb("#000000") == ((0, 0, 0)))
    intercept[IllegalArgumentException](Colors.hexToRgb("FFFFFF"))
    intercept[IllegalArgumentException](Colors.hexToRgb("#GGGGGG"))
    intercept[IllegalArgumentException](Colors.rgbOf("notacolor"))
    val (r, g, b) = Colors.normedRgb("white")
    assert(math.abs(r - 255 / 256.0) < 1e-12 && r == g && g == b)
    val hotP = Colors.paletteFromColors(Colors.hot)
    assert(hotP.size == 10 && hotP.head == ((0.0, 0.0, 0.0)))
    assert(Colors.paletteFromColors(Colors.greys9).size == 9)
    assert(Colors.paletteFromColors(Colors.elevation).size == 9)
    intercept[IllegalArgumentException](Colors.paletteFromColors(Seq("red")))
  }
}
