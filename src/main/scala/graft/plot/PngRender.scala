package graft.plot

import graft.functions.MediaCodecs

/** Raster (PNG) rendering of [[PlotSpec]]s — the bitmap half of the
  * presentation tier (the reference renders through matplotlib's Agg
  * backend, ezdata/plotter.py:829–1711; here a pure-Scala scanline
  * rasterizer feeds the repo's own standards-valid PNG encoder,
  * [[MediaCodecs.pngEncodeRgb]]).
  *
  * Deterministic by construction: integer/IEEE-double math only, no
  * java2d, no fonts from the OS (text uses the embedded [[Font5x7]]
  * bitmap face), no antialiasing — so output bytes are golden-pinnable
  * across JVMs exactly like the SVG tier.  Geometry (margins, scales,
  * ticks, mark placement) is shared with [[SvgRender]] so the two
  * backends draw the same picture.
  *
  * Marks covered match SvgRender: `bar`, `point` (circle/square/
  * triangle/diamond glyphs), `rect` (sequential ramp), `area`
  * (violin density outlines), plus the composed facet overlay with
  * style cycling and the corner grid with percentile annotations.
  */
object PngRender {

  import SvgRender.{Scale, extent, fieldOf, num, ticks, fmt}

  private val White = 0xffffff
  private val AxisGray = 0x999999
  private val TextBlack = 0x000000
  private val AnnGray = 0x555555

  private[plot] def hexColor(s: String): Int = {
    val h = s.stripPrefix("#")
    val full = if (h.length == 3) h.flatMap(c => s"$c$c") else h // #999 → #999999
    Integer.parseInt(full, 16)
  }

  /** Render one spec to PNG bytes. */
  def render(spec: PlotSpec, width: Int = 480, height: Int = 360,
             color: String = null, theme: Theme = Theme.classic): Array[Byte] = {
    val r = themedRaster(width, height, theme)
    body(r, spec, 0, 0, width, height,
      hexColor(Option(color).getOrElse(theme.palette(0))), title = spec.title,
      theme = theme)
    r.png
  }

  private def themedRaster(w: Int, h: Int, theme: Theme): Raster = {
    val r = new Raster(w, h)
    // canvas is white already; a non-white themed background would fill here
    theme.background.map(hexColor).filter(_ != White)
      .foreach(bg => r.fillRect(0, 0, w - 1, h - 1, bg, 1.0))
    r
  }

  /** Overlay facets on shared axes with the deterministic style cycle
    * (plotter.py:394–408) — raster twin of [[SvgRender.renderFacets]]. */
  def renderFacets(f: FacetSpec, width: Int = 480, height: Int = 360,
                   theme: Theme = Theme.classic): Array[Byte] = {
    val r = themedRaster(width, height, theme)
    val all = f.facets.map(_._2)
    val merged = all.headOption.map(h => h.copy(data = all.flatMap(_.data))).toSeq
    f.facets.zipWithIndex.foreach { case ((label, spec), i) =>
      val st = theme.styleFor(i)
      body(r, spec, 0, 0, width, height, hexColor(st.color),
        axesFrom = merged.headOption, drawAxes = i == 0, dash = st.dash,
        marker = st.marker, title = None, theme = theme)
      val lx = width - 110; val ly = 18 + 16 * i
      r.fillRect(lx, ly - 9, lx + 10, ly + 1, hexColor(st.color), 1.0)
      r.text(lx + 14, ly, label, TextBlack, Anchor.Start)
    }
    r.png
  }

  /** Corner grid with annotated diagonals — raster twin of
    * [[SvgRender.renderCorner]] (plotter.py:1615–1711). */
  def renderCorner(c: CornerSpec, panel: Int = 220,
                   theme: Theme = Theme.classic): Array[Byte] = {
    val cols = c.panels.collect { case ((x, y), _) if x == y => x }
    val idx = cols.zipWithIndex.toMap
    val k = cols.size
    val r = themedRaster(panel * k, panel * k, theme)
    c.panels.foreach { case ((x, y), spec) =>
      val (ix, iy) = (idx(x), idx(y))
      val title = if (ix == iy) c.quantiles.get(x).map { case (p16, p50, p84) =>
        // U+2212 minus, same string as SvgRender.renderCorner — Font5x7
        // maps it onto the ASCII hyphen glyph so the pixels are stable.
        s"$x = ${fmt(p50)} (+${fmt(p84 - p50)} / −${fmt(p50 - p16)})"
      } else None
      body(r, spec, ix * panel, iy * panel, panel, panel,
        hexColor(theme.palette(0)), title = title, theme = theme)
      if (ix == iy) c.quantiles.get(x).foreach { case (p16, p50, p84) =>
        val xs = spec.data.map(row => num(row(fieldOf(spec, "x").getOrElse(x))))
        val (lo, hi) = extent(xs, 0.02)
        val sx = Scale(lo, hi, ix * panel + 38.0, ix * panel + panel - 8.0)
        Seq(p16, p50, p84).foreach { q =>
          r.dashedVLine(math.round(sx(q)).toInt, iy * panel + 22,
            iy * panel + panel - 30, AnnGray, on = 4, off = 3)
        }
      }
    }
    r.png
  }

  /** One panel's marks + (optionally) axes inside the given rect —
    * same layout constants and scale math as [[SvgRender]]'s body. */
  private[plot] def body(r: Raster, spec: PlotSpec, x0: Int, y0: Int, w: Int, h: Int,
                   color: Int, axesFrom: Option[PlotSpec] = None,
                   drawAxes: Boolean = true, dash: String = "",
                   marker: String = "circle", title: Option[String],
                   theme: Theme = Theme.classic): Unit = {
    if (spec.mark == "boxplot") { boxBody(r, spec, x0, y0, w, h, color, title, theme); return }
    val ml = 38; val mr = 8; val mt = 22; val mb = 30
    val xf = fieldOf(spec, "x").getOrElse(
      throw new IllegalArgumentException(s"PngRender: mark '${spec.mark}' needs an x field"))
    val yf = fieldOf(spec, "y").getOrElse(xf)
    val cf = fieldOf(spec, "color")
    val base = axesFrom.getOrElse(spec)
    // log axes: position in log10 space, mirroring SvgRender.body
    val xlog = SvgRender.isLogChannel(base, "x")
    val ylog = SvgRender.isLogChannel(base, "y")
    def tx(v: Double): Double = if (xlog) SvgRender.log10pos(v) else v
    def ty(v: Double): Double = if (ylog) SvgRender.log10pos(v) else v
    val xs = base.data.map(row => tx(num(row(xf))))
    val ys = base.data.map(row => ty(num(row(yf))))
    val pad = if (spec.mark == "point") 0.03 else 0.02
    val (xlo, xhi) = extent(xs, pad)
    val (ylo0, yhi) = extent(ys, pad)
    val ylo = if (spec.mark == "bar" && !ylog) math.min(0.0, ylo0) else ylo0
    val sx = Scale(xlo, xhi, x0 + ml.toDouble, x0 + w - mr.toDouble)
    val sy = Scale(ylo, yhi, y0 + h - mb.toDouble, y0 + mt.toDouble)
    if (drawAxes) {
      val ac = hexColor(theme.axisColor)
      val tickFill = theme.tickLabelColor.map(hexColor).getOrElse(TextBlack)
      theme.spines match {
        case "box" => r.strokeRect(x0 + ml, y0 + mt, x0 + w - mr, y0 + h - mb, ac)
        case "lb" =>
          r.vLine(x0 + ml, y0 + mt, y0 + h - mb, ac)
          r.hLine(x0 + ml, x0 + w - mr, y0 + h - mb, ac)
        case _ => ()
      }
      val xticks = SvgRender.axisTicks(xlo, xhi, xlog)
      val yticks = SvgRender.axisTicks(ylo, yhi, ylog)
      theme.gridColor.map(hexColor).foreach { gc => // majors only
        xticks.filterNot(_._3).foreach { case (t, _, _) =>
          r.vLine(math.round(sx(t)).toInt, y0 + mt, y0 + h - mb, gc) }
        yticks.filterNot(_._3).foreach { case (t, _, _) =>
          r.hLine(x0 + ml, x0 + w - mr, math.round(sy(t)).toInt, gc) }
      }
      xticks.foreach { case (t, label, minor) =>
        val px = math.round(sx(t)).toInt
        val len = if (minor) math.max(theme.tickLen - 2, 2) else theme.tickLen
        if (theme.tickLen > 0) r.vLine(px, y0 + h - mb, y0 + h - mb + len, ac)
        if (label.nonEmpty) r.text(px, y0 + h - mb + 15, label, tickFill, Anchor.Middle)
      }
      yticks.foreach { case (t, label, minor) =>
        val py = math.round(sy(t)).toInt
        val len = if (minor) math.max(theme.tickLen - 2, 2) else theme.tickLen
        if (theme.tickLen > 0) r.hLine(x0 + ml - len, x0 + ml, py, ac)
        if (label.nonEmpty) r.text(x0 + ml - 6, py + 3, label, tickFill, Anchor.End)
      }
      r.text(x0 + (ml + w - mr) / 2, y0 + h - 4, xf, TextBlack, Anchor.Middle)
    }
    title.foreach(t => r.text(x0 + w / 2, y0 + 14, t, TextBlack, Anchor.Middle))
    spec.mark match {
      case "bar" =>
        val centers = spec.data.map(row => tx(num(row(xf)))).filterNot(_.isNaN).sorted
        val bw = if (centers.size >= 2) centers.sliding(2).map(p => p(1) - p(0)).min
                 else math.max(xhi - xlo, 1.0)
        spec.data.foreach { row =>
          val cx = tx(num(row(xf))); val cy = ty(num(row(yf)))
          if (!cx.isNaN && !cy.isNaN) {
            // SvgRender clamps height to max(ph, 0): a bar whose value
            // sits below the axis floor renders as nothing, not as a
            // flipped rect (Raster.fillRect would silently swap y0/y1).
            val yTop = math.round(sy(cy)).toInt
            val yBot = math.round(sy(ylo)).toInt
            if (yBot >= yTop)
              r.fillRect(math.round(sx(cx - bw / 2)).toInt, yTop,
                math.round(sx(cx + bw / 2)).toInt, yBot, color, 0.75)
          }
        }
      case "point" =>
        val sizeF = fieldOf(spec, "size")
        val cs = spec.data.map(row => cf.map(f => num(row(f))).getOrElse(Double.NaN))
        val (clo, chi) = extent(cs.filterNot(_.isNaN))
        spec.data.foreach { row =>
          val px = tx(num(row(xf))); val py = ty(num(row(yf)))
          if (!px.isNaN && !py.isNaN) {
            val rad = sizeF.map(f => 1.5 + 2.5 * math.sqrt(math.max(num(row(f)), 0.0) /
              math.max(spec.data.map(q => num(q(f))).filterNot(_.isNaN).max, 1.0))).getOrElse(2.5)
            val fill = cf.map(f => hexColor(SvgRender.ramp(
              (num(row(f)) - clo) / math.max(chi - clo, 1e-300)))).getOrElse(color)
            r.glyph(marker, sx(px), sy(py), rad, fill, 0.8)
          }
        }
      case "rect" =>
        val cvs = spec.data.map(row => num(row(cf.getOrElse(yf))))
        val (clo, chi) = extent(cvs.filterNot(_.isNaN))
        val cxs = spec.data.map(row => tx(num(row(xf)))).filterNot(_.isNaN).distinct.sorted
        val cys = spec.data.map(row => ty(num(row(yf)))).filterNot(_.isNaN).distinct.sorted
        def spacing(cs: Seq[Double], fallback: Double) =
          if (cs.size >= 2) cs.sliding(2).map(p => p(1) - p(0)).min else fallback
        val bwx = spacing(cxs, math.max(xhi - xlo, 1.0))
        val bwy = spacing(cys, math.max(yhi - ylo, 1.0))
        spec.data.foreach { row =>
          val px = tx(num(row(xf))); val py = ty(num(row(yf))); val cv = num(row(cf.getOrElse(yf)))
          if (!px.isNaN && !py.isNaN && !cv.isNaN) {
            r.fillRect(math.round(sx(px - bwx / 2)).toInt, math.round(sy(py + bwy / 2)).toInt,
              math.round(sx(px + bwx / 2)).toInt, math.round(sy(py - bwy / 2)).toInt,
              hexColor(SvgRender.ramp((cv - clo) / math.max(chi - clo, 1e-300))), 1.0)
          }
        }
      case "area" =>
        val varF = fieldOf(spec, "color").orElse(fieldOf(spec, "detail"))
        val series = varF match {
          case Some(f) => spec.data.groupBy(row => String.valueOf(row(f))).toSeq.sortBy(_._1)
          case None => Seq("" -> spec.data)
        }
        series.zipWithIndex.foreach { case ((_, rows), i) =>
          val pts = rows.map(row => (tx(num(row(xf))), ty(num(row(yf)))))
            .filterNot(p => p._1.isNaN || p._2.isNaN).sortBy(_._1)
            .map(p => (sx(p._1), sy(p._2)))
          val st = theme.styleFor(i)
          val c = hexColor(st.color)
          r.fillPolygon(pts, c, 0.25)
          val (on, off) = st.dash match {
            case "" => (Int.MaxValue, 0)
            case d => val p = d.split(","); (p(0).toInt, p(1).toInt)
          }
          pts.sliding(2).foreach {
            case Seq(a, b) => r.dashedLine(a._1, a._2, b._1, b._2, c, on, off)
            case _ => ()
          }
        }
      case other =>
        throw new IllegalArgumentException(
          s"PngRender: mark '$other' has no raster backend (bar/point/rect/area/boxplot)")
    }
  }

  /** Boxplot panel — raster twin of SvgRender's boxBody (whisker +
    * interquartile box + median bar per variable, categorical x). */
  private def boxBody(r: Raster, spec: PlotSpec, x0: Int, y0: Int, w: Int, h: Int,
                      color: Int, title: Option[String],
                      theme: Theme = Theme.classic): Unit = {
    val ml = 38; val mr = 8; val mt = 22; val mb = 30
    val rows = spec.data
    val k = math.max(rows.size, 1)
    val los = rows.map(row => num(row("min"))); val his = rows.map(row => num(row("max")))
    val (ylo, yhi) = extent(los ++ his, 0.02)
    val sy = Scale(ylo, yhi, y0 + h - mb.toDouble, y0 + mt.toDouble)
    val sx = Scale(0.0, k.toDouble, x0 + ml.toDouble, x0 + w - mr.toDouble)
    val ac = hexColor(theme.axisColor)
    val tickFill = theme.tickLabelColor.map(hexColor).getOrElse(TextBlack)
    theme.spines match {
      case "box" => r.strokeRect(x0 + ml, y0 + mt, x0 + w - mr, y0 + h - mb, ac)
      case "lb" =>
        r.vLine(x0 + ml, y0 + mt, y0 + h - mb, ac)
        r.hLine(x0 + ml, x0 + w - mr, y0 + h - mb, ac)
      case _ => ()
    }
    ticks(ylo, yhi).foreach { t =>
      val py = math.round(sy(t)).toInt
      theme.gridColor.map(hexColor).foreach(gc => r.hLine(x0 + ml, x0 + w - mr, py, gc))
      if (theme.tickLen > 0) r.hLine(x0 + ml - theme.tickLen, x0 + ml, py, ac)
      r.text(x0 + ml - 6, py + 3, fmt(t), tickFill, Anchor.End)
    }
    title.foreach(t => r.text(x0 + w / 2, y0 + 14, t, TextBlack, Anchor.Middle))
    rows.zipWithIndex.foreach { case (row, i) =>
      val cx = sx(i + 0.5); val half = sx(0.8) - sx(0.5)
      val (mn, q1, med, q3, mx) =
        (num(row("min")), num(row("q1")), num(row("median")), num(row("q3")), num(row("max")))
      val cxi = math.round(cx).toInt
      r.vLine(cxi, math.round(sy(mx)).toInt, math.round(sy(mn)).toInt, AnnGray)
      Seq(mn, mx).foreach(v => r.hLine(math.round(cx - half / 2).toInt,
        math.round(cx + half / 2).toInt, math.round(sy(v)).toInt, AnnGray))
      val (bx0, bx1) = (math.round(cx - half).toInt, math.round(cx + half).toInt)
      val (by0, by1) = (math.round(sy(q3)).toInt, math.round(sy(q1)).toInt)
      r.fillRect(bx0, by0, bx1, by1, color, 0.6)
      r.strokeRect(bx0, by0, bx1, by1, AnnGray)
      r.hLine(bx0, bx1, math.round(sy(med)).toInt, TextBlack)
      r.text(cxi, y0 + h - mb + 15, String.valueOf(row("variable")), TextBlack, Anchor.Middle)
    }
  }

  private[plot] object Anchor extends Enumeration { val Start, Middle, End = Value }

  /** Minimal deterministic RGB24 scanline rasterizer: white canvas,
    * integer alpha blending, no antialiasing, bounds-checked writes. */
  private[plot] final class Raster(val w: Int, val h: Int) {
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 24),
      s"PngRender: canvas ${w}x$h exceeds the 2^24-pixel cap")
    private val buf = Array.fill[Byte](w * h * 3)(0xff.toByte)

    private def blend(x: Int, y: Int, rgb: Int, a: Double): Unit =
      if (x >= 0 && x < w && y >= 0 && y < h) {
        val p = (y * w + x) * 3
        def mix(old: Int, nw: Int) = math.round(old + (nw - old) * a).toInt
        buf(p) = mix(buf(p) & 0xff, (rgb >> 16) & 0xff).toByte
        buf(p + 1) = mix(buf(p + 1) & 0xff, (rgb >> 8) & 0xff).toByte
        buf(p + 2) = mix(buf(p + 2) & 0xff, rgb & 0xff).toByte
      }

    def hLine(x0: Int, x1: Int, y: Int, rgb: Int, a: Double = 1.0): Unit = {
      var x = math.min(x0, x1); val xe = math.max(x0, x1)
      while (x <= xe) { blend(x, y, rgb, a); x += 1 }
    }
    def vLine(x: Int, y0: Int, y1: Int, rgb: Int, a: Double = 1.0): Unit = {
      var y = math.min(y0, y1); val ye = math.max(y0, y1)
      while (y <= ye) { blend(x, y, rgb, a); y += 1 }
    }
    def dashedVLine(x: Int, y0: Int, y1: Int, rgb: Int, on: Int, off: Int): Unit = {
      var y = math.min(y0, y1); val ye = math.max(y0, y1); var k = 0
      while (y <= ye) { if (k % (on + off) < on) blend(x, y, rgb, 1.0); y += 1; k += 1 }
    }
    def strokeRect(x0: Int, y0: Int, x1: Int, y1: Int, rgb: Int): Unit = {
      hLine(x0, x1, y0, rgb); hLine(x0, x1, y1, rgb)
      vLine(x0, y0, y1, rgb); vLine(x1, y0, y1, rgb)
    }
    def fillRect(x0: Int, y0: Int, x1: Int, y1: Int, rgb: Int, a: Double): Unit = {
      var y = math.min(y0, y1); val ye = math.max(y0, y1)
      while (y <= ye) { hLine(x0, x1, y, rgb, a); y += 1 }
    }
    def fillCircle(cx: Double, cy: Double, rad: Double, rgb: Int, a: Double): Unit = {
      var y = math.ceil(cy - rad).toInt; val ye = math.floor(cy + rad).toInt
      while (y <= ye) {
        val dy = y - cy
        val half = math.sqrt(math.max(rad * rad - dy * dy, 0.0))
        hLine(math.ceil(cx - half).toInt, math.floor(cx + half).toInt, y, rgb, a)
        y += 1
      }
    }
    /** Even-odd scanline polygon fill (closed implicitly). */
    def fillPolygon(pts: Seq[(Double, Double)], rgb: Int, a: Double): Unit = {
      if (pts.size < 3) return
      val ymin = math.ceil(pts.map(_._2).min).toInt
      val ymax = math.floor(pts.map(_._2).max).toInt
      var y = ymin
      while (y <= ymax) {
        val yc = y + 0.5
        val crossings = pts.indices.flatMap { i =>
          val (xa, ya) = pts(i); val (xb, yb) = pts((i + 1) % pts.size)
          if ((ya <= yc && yb > yc) || (yb <= yc && ya > yc))
            Some(xa + (yc - ya) / (yb - ya) * (xb - xa))
          else None
        }.sorted
        crossings.grouped(2).foreach {
          case Seq(l, rr) => hLine(math.ceil(l).toInt, math.floor(rr).toInt, y, rgb, a)
          case _ => ()
        }
        y += 1
      }
    }
    /** DDA line with an on/off dash counter — deterministic stepping. */
    def dashedLine(x0: Double, y0: Double, x1: Double, y1: Double,
                   rgb: Int, on: Int, off: Int): Unit = {
      val steps = math.max(math.abs(x1 - x0), math.abs(y1 - y0)).toInt + 1
      var i = 0
      while (i <= steps) {
        if (off == 0 || i % (on + off) < on) {
          val t = if (steps == 0) 0.0 else i.toDouble / steps
          blend(math.round(x0 + (x1 - x0) * t).toInt,
            math.round(y0 + (y1 - y0) * t).toInt, rgb, 1.0)
        }
        i += 1
      }
    }
    def glyph(marker: String, x: Double, y: Double, rad: Double, rgb: Int, a: Double): Unit =
      marker match {
        case "square" =>
          fillRect(math.round(x - rad).toInt, math.round(y - rad).toInt,
            math.round(x + rad).toInt, math.round(y + rad).toInt, rgb, a)
        case "triangle" =>
          fillPolygon(Seq((x, y - rad), (x - rad, y + rad), (x + rad, y + rad)), rgb, a)
        case "diamond" =>
          fillPolygon(Seq((x, y - rad), (x + rad, y), (x, y + rad), (x - rad, y)), rgb, a)
        case _ => fillCircle(x, y, rad, rgb, a)
      }
    /** Draw `s` with the embedded 5×7 face, `y` = text baseline. */
    def text(x: Int, y: Int, s: String, rgb: Int, anchor: Anchor.Value): Unit = {
      val width = if (s.isEmpty) 0 else s.length * 6 - 1
      val x0 = anchor match {
        case Anchor.Middle => x - width / 2
        case Anchor.End => x - width
        case _ => x
      }
      var i = 0
      while (i < s.length) {
        Font5x7.draw(this, x0 + i * 6, y - 7, s.charAt(i), rgb)
        i += 1
      }
    }
    private[PngRender] def put(x: Int, y: Int, rgb: Int): Unit = blend(x, y, rgb, 1.0)

    def png: Array[Byte] = MediaCodecs.pngEncodeRgb(w, h, buf)
  }

  /** Classic 5×7 dot-matrix face (the public-domain LCD/HD44780
    * lineage), 5 column bytes per glyph, LSB = top row, 6-px advance.
    * Covers printable ASCII 0x20–0x7e; anything else renders blank. */
  private[plot] object Font5x7 {
    private val cols: Array[Int] = Array(
      0x00,0x00,0x00,0x00,0x00,  0x00,0x00,0x5f,0x00,0x00,  0x00,0x07,0x00,0x07,0x00,
      0x14,0x7f,0x14,0x7f,0x14,  0x24,0x2a,0x7f,0x2a,0x12,  0x23,0x13,0x08,0x64,0x62,
      0x36,0x49,0x55,0x22,0x50,  0x00,0x05,0x03,0x00,0x00,  0x00,0x1c,0x22,0x41,0x00,
      0x00,0x41,0x22,0x1c,0x00,  0x08,0x2a,0x1c,0x2a,0x08,  0x08,0x08,0x3e,0x08,0x08,
      0x00,0x50,0x30,0x00,0x00,  0x08,0x08,0x08,0x08,0x08,  0x00,0x60,0x60,0x00,0x00,
      0x20,0x10,0x08,0x04,0x02,  0x3e,0x51,0x49,0x45,0x3e,  0x00,0x42,0x7f,0x40,0x00,
      0x42,0x61,0x51,0x49,0x46,  0x21,0x41,0x45,0x4b,0x31,  0x18,0x14,0x12,0x7f,0x10,
      0x27,0x45,0x45,0x45,0x39,  0x3c,0x4a,0x49,0x49,0x30,  0x01,0x71,0x09,0x05,0x03,
      0x36,0x49,0x49,0x49,0x36,  0x06,0x49,0x49,0x29,0x1e,  0x00,0x36,0x36,0x00,0x00,
      0x00,0x56,0x36,0x00,0x00,  0x00,0x08,0x14,0x22,0x41,  0x14,0x14,0x14,0x14,0x14,
      0x41,0x22,0x14,0x08,0x00,  0x02,0x01,0x51,0x09,0x06,  0x32,0x49,0x79,0x41,0x3e,
      0x7e,0x11,0x11,0x11,0x7e,  0x7f,0x49,0x49,0x49,0x36,  0x3e,0x41,0x41,0x41,0x22,
      0x7f,0x41,0x41,0x22,0x1c,  0x7f,0x49,0x49,0x49,0x41,  0x7f,0x09,0x09,0x09,0x01,
      0x3e,0x41,0x41,0x51,0x32,  0x7f,0x08,0x08,0x08,0x7f,  0x00,0x41,0x7f,0x41,0x00,
      0x20,0x40,0x41,0x3f,0x01,  0x7f,0x08,0x14,0x22,0x41,  0x7f,0x40,0x40,0x40,0x40,
      0x7f,0x02,0x0c,0x02,0x7f,  0x7f,0x04,0x08,0x10,0x7f,  0x3e,0x41,0x41,0x41,0x3e,
      0x7f,0x09,0x09,0x09,0x06,  0x3e,0x41,0x51,0x21,0x5e,  0x7f,0x09,0x19,0x29,0x46,
      0x46,0x49,0x49,0x49,0x31,  0x01,0x01,0x7f,0x01,0x01,  0x3f,0x40,0x40,0x40,0x3f,
      0x1f,0x20,0x40,0x20,0x1f,  0x3f,0x40,0x38,0x40,0x3f,  0x63,0x14,0x08,0x14,0x63,
      0x03,0x04,0x78,0x04,0x03,  0x61,0x51,0x49,0x45,0x43,  0x00,0x7f,0x41,0x41,0x00,
      0x02,0x04,0x08,0x10,0x20,  0x00,0x41,0x41,0x7f,0x00,  0x04,0x02,0x01,0x02,0x04,
      0x40,0x40,0x40,0x40,0x40,  0x00,0x01,0x02,0x04,0x00,  0x20,0x54,0x54,0x54,0x78,
      0x7f,0x48,0x44,0x44,0x38,  0x38,0x44,0x44,0x44,0x20,  0x38,0x44,0x44,0x48,0x7f,
      0x38,0x54,0x54,0x54,0x18,  0x08,0x7e,0x09,0x01,0x02,  0x08,0x14,0x54,0x54,0x3c,
      0x7f,0x08,0x04,0x04,0x78,  0x00,0x44,0x7d,0x40,0x00,  0x20,0x40,0x44,0x3d,0x00,
      0x00,0x7f,0x10,0x28,0x44,  0x00,0x41,0x7f,0x40,0x00,  0x7c,0x04,0x18,0x04,0x78,
      0x7c,0x08,0x04,0x04,0x78,  0x38,0x44,0x44,0x44,0x38,  0x7c,0x14,0x14,0x14,0x08,
      0x08,0x14,0x14,0x18,0x7c,  0x7c,0x08,0x04,0x04,0x08,  0x48,0x54,0x54,0x54,0x20,
      0x04,0x3f,0x44,0x40,0x20,  0x3c,0x40,0x40,0x20,0x7c,  0x1c,0x20,0x40,0x20,0x1c,
      0x3c,0x40,0x30,0x40,0x3c,  0x44,0x28,0x10,0x28,0x44,  0x0c,0x50,0x50,0x50,0x3c,
      0x44,0x64,0x54,0x4c,0x44,  0x00,0x08,0x36,0x41,0x00,  0x00,0x00,0x7f,0x00,0x00,
      0x00,0x41,0x36,0x08,0x00,  0x08,0x08,0x2a,0x1c,0x08)

    /** Draw one glyph with its top-left at (x, y).  A few common
      * typographic codepoints fold onto their ASCII twins (U+2212
      * minus → '-', so SvgRender/PngRender can share annotation
      * strings with identical pixels); any other non-ASCII char draws
      * a hollow-box fallback instead of silently vanishing. */
    def draw(r: PngRender.Raster, x: Int, y: Int, ch: Char, rgb: Int): Unit = {
      val code = ch.toInt match {
        case 0x2212 => '-'.toInt // MINUS SIGN
        case 0x2013 | 0x2014 => '-'.toInt // en/em dash
        case 0x2018 | 0x2019 => '\''.toInt
        case 0x201c | 0x201d => '"'.toInt
        case c => c
      }
      if (code < 0x20 || code > 0x7e) { // fallback: 5×7 hollow box
        var c = 0
        while (c < 5) {
          r.put(x + c, y, rgb); r.put(x + c, y + 6, rgb)
          if (c == 0 || c == 4) { var row = 1; while (row < 6) { r.put(x + c, y + row, rgb); row += 1 } }
          c += 1
        }
        return
      }
      val base = (code - 0x20) * 5
      var c = 0
      while (c < 5) {
        val bits = cols(base + c)
        var row = 0
        while (row < 7) {
          if ((bits & (1 << row)) != 0) r.put(x + c, y + row, rgb)
          row += 1
        }
        c += 1
      }
    }
  }
}
