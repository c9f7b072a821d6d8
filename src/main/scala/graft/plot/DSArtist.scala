package graft.plot

import graft.operators.Binned

/** Interactive datashader session (ezdata/datashader.py:183–219
  * `DSArtist.make_image`): holds the CURRENT viewport and re-issues
  * the raster aggregation on every interaction — zoom and pan build a
  * new session with a transformed viewport, and [[frame]] runs the
  * cluster-side pixel-grid aggregation for exactly that range.
  *
  * The 100 TB posture is the whole point of the re-issue design: the
  * viewport is a FILTER on the raw columns, so every interaction's
  * query pushes its range predicates into the parquet scan (plan-gated
  * in PlanSpec) and reads only the visible slice's row groups; the
  * collected result is never larger than widthPx × heightPx cells no
  * matter how deep the zoom.  Sessions are immutable — an interaction
  * returns a NEW session, so a UI can keep a history stack for free.
  */
final class DSArtist private (p: Plotter, x: String, y: String,
                              widthPx: Int, heightPx: Int, what: String,
                              home: (Double, Double, Double, Double),
                              val viewport: (Double, Double, Double, Double)) {

  private def at(vp: (Double, Double, Double, Double)): DSArtist =
    new DSArtist(p, x, y, widthPx, heightPx, what, home, vp)

  /** Aggregate the current viewport (datashader.py's make_image —
    * one cluster query per interaction, pixel-grid-sized result). */
  def frame(): PlotSpec = {
    val (xlo, xhi, ylo, yhi) = viewport
    p.raster(x, y, xlo, xhi, ylo, yhi, widthPx, heightPx, what)
  }

  /** Zoom by `factor` (> 1 zooms IN) about the viewport center (or an
    * explicit focus point in data coordinates). */
  def zoom(factor: Double, focus: Option[(Double, Double)] = None): DSArtist = {
    require(factor > 0, s"zoom factor must be > 0, got $factor")
    val (xlo, xhi, ylo, yhi) = viewport
    val (fx, fy) = focus.getOrElse(((xlo + xhi) / 2, (ylo + yhi) / 2))
    val (hw, hh) = ((xhi - xlo) / (2 * factor), (yhi - ylo) / (2 * factor))
    at((fx - hw, fx + hw, fy - hh, fy + hh))
  }

  /** Pan by a fraction of the current viewport size (+x right, +y up). */
  def pan(fracX: Double, fracY: Double): DSArtist = {
    val (xlo, xhi, ylo, yhi) = viewport
    val (dx, dy) = ((xhi - xlo) * fracX, (yhi - ylo) * fracY)
    at((xlo + dx, xhi + dx, ylo + dy, yhi + dy))
  }

  /** Back to the full-extent home viewport. */
  def reset(): DSArtist = at(home)
}

object DSArtist {

  /** Open a session at the data's full extent (one extent aggregate,
    * like datashader.py's initial canvas bounds). */
  def apply(p: Plotter, x: String, y: String,
            widthPx: Int = 256, heightPx: Int = 256,
            what: String = "count(*)"): DSArtist = {
    // data-derived extents: pad a degenerate (constant-column) range
    // like Plotter.hist/hist2d — Axis fails loudly on hi == lo, and a
    // session opened on constant data should render one hot pixel, not
    // throw (an EXPLICIT degenerate viewport from zoom() still fails
    // loudly in Axis, which is correct: the UI asked for zero width)
    val (xlo, xhi) = { val (l, h) = Binned.extent(p.ez.df, p.ez.get(x)); Binned.padDegenerate(l, h) }
    val (ylo, yhi) = { val (l, h) = Binned.extent(p.ez.df, p.ez.get(y)); Binned.padDegenerate(l, h) }
    val home = (xlo, xhi, ylo, yhi)
    new DSArtist(p, x, y, widthPx, heightPx, what, home, home)
  }
}
