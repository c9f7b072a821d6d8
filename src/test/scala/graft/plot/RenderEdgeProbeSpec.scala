package graft.plot

import org.scalatest.funsuite.AnyFunSuite

/** Renderer edge contract: a spec with NO data rows (an empty corpus
  * slice, a facet whose predicate matched nothing) and a spec whose
  * only row is all-null must both render a valid empty-axes frame —
  * never throw.  A UI composing facets cannot pre-screen for empties. */
class RenderEdgeProbeSpec extends AnyFunSuite {
  private val enc = Map(
    "x" -> Map("field" -> "a", "type" -> "quantitative"),
    "y" -> Map("field" -> "b", "type" -> "quantitative"))

  test("empty spec renders a valid frame in all three backends") {
    val empty = PlotSpec("bar", Seq.empty, enc)
    val svg = empty.toSvg()
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>\n") || svg.contains("</svg>"))
    val png = empty.toPng()
    // PNG magic bytes
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    assert(empty.toVegaLite.contains("\"values\": []"))
  }

  test("all-null data row renders like an empty frame, never throws") {
    val oneNull = PlotSpec("point", Seq(Map("a" -> null, "b" -> null)), enc)
    assert(oneNull.toSvg().contains("</svg>"))
    assert(oneNull.toPng().take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
  }
}
