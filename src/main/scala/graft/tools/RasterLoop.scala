package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.EzFrame
import graft.plot.{DSArtist, Plotter}

/** The interactive raster EVENT LOOP (ezdata/datashader.py:183–219):
  * datashader's `DSArtist` hangs off a running matplotlib event loop
  * and re-aggregates on every zoom/pan callback; this is the same
  * loop with stdin as the event source — each command transforms the
  * immutable [[graft.plot.DSArtist]] session and immediately re-issues
  * the viewport-predicated aggregation, proving the re-query path
  * end-to-end OUTSIDE a test.
  *
  * Every interaction is one cluster query: the viewport is a filter
  * on the raw columns (predicate-pushdown plan-gated in PlanSpec), and
  * the result is never larger than the pixel grid regardless of zoom
  * depth — the 100 TB posture of the re-issue design.
  *
  * Usage: runMain graft.tools.RasterLoop [sfDir] [outDir] [x] [y]
  * then commands on stdin, one per line:
  *   zoom F [fx fy]   zoom by factor F (>1 in), optional focus point
  *   pan DX DY        pan by viewport fractions (+x right, +y up)
  *   reset            back to the full-extent home viewport
  *   back             pop the history stack (undo one interaction)
  *   png              write the CURRENT frame to outDir/frame_NNN.png
  *   quit / EOF       exit
  * Each viewport-changing command re-aggregates and prints one status
  * line: viewport, non-empty cells, value range, query wall ms. */
object RasterLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_raster_loop"
    val xCol = if (args.length > 2) args(2) else "n_chars"
    val yCol = if (args.length > 3) args(3) else "doc_id"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").appName("graft-raster-loop").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      new java.io.File(outDir).mkdirs()
      val docs = EzFrame(spark.read.parquet(s"$sfDir/documents.parquet"))
      var session = DSArtist(Plotter(docs), xCol, yCol, widthPx = 64, heightPx = 64)
      var history = List.empty[DSArtist]
      var frameNo = 0

      def show(tag: String): Unit = {
        val t0 = System.nanoTime
        val spec = session.frame() // the re-issued aggregation
        val ms = (System.nanoTime - t0) / 1e6
        val vals = spec.data.flatMap(r => Option(r("value")).map {
          case n: Number => n.doubleValue(); case o => o.toString.toDouble
        })
        val (xlo, xhi, ylo, yhi) = session.viewport
        println(f"[$tag] viewport x=[$xlo%.3g, $xhi%.3g] y=[$ylo%.3g, $yhi%.3g] " +
          f"cells=${spec.data.size} value=[${if (vals.isEmpty) 0.0 else vals.min}%.3g, " +
          f"${if (vals.isEmpty) 0.0 else vals.max}%.3g] query=${ms}%.0f ms")
      }

      show("open")
      println("commands: zoom F [fx fy] | pan DX DY | reset | back | png | quit")
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
      var line = in.readLine()
      while (line != null && line.trim != "quit") {
        val tok = line.trim.split("\\s+").toSeq
        try tok match {
          case Seq("zoom", f) =>
            history ::= session; session = session.zoom(f.toDouble); show(s"zoom $f")
          case Seq("zoom", f, fx, fy) =>
            history ::= session
            session = session.zoom(f.toDouble, Some((fx.toDouble, fy.toDouble)))
            show(s"zoom $f @($fx,$fy)")
          case Seq("pan", dx, dy) =>
            history ::= session; session = session.pan(dx.toDouble, dy.toDouble)
            show(s"pan $dx $dy")
          case Seq("reset") =>
            history ::= session; session = session.reset(); show("reset")
          case Seq("back") =>
            history match {
              case h :: t => session = h; history = t; show("back")
              case Nil => println("[back] history empty")
            }
          case Seq("png") =>
            val p = java.nio.file.Paths.get(outDir, f"frame_$frameNo%03d.png")
            java.nio.file.Files.write(p, session.frame().toPng())
            println(s"[png] wrote $p"); frameNo += 1
          case Seq("") => // blank line
          case other => println(s"[?] unknown command: ${other.mkString(" ")}")
        } catch {
          case e: Exception => println(s"[error] ${e.getMessage}")
        }
        line = in.readLine()
      }
      println("[quit] session closed")
    } finally spark.stop()
  }
}
