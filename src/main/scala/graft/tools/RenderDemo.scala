package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.EzFrame
import graft.plot.Plotter

/** Render the flagship plots of a documents table to PNG/SVG files —
  * a smoke harness for the presentation tier (the pictures the
  * reference produces through matplotlib, ezdata/plotter.py:829–1711).
  *
  * Usage: runMain graft.tools.RenderDemo [sfDir] [outDir]
  */
object RenderDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_render"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").appName("graft-render-demo").getOrCreate()
    try {
      new java.io.File(outDir).mkdirs()
      def write(name: String, bytes: Array[Byte]): Unit = {
        val p = java.nio.file.Paths.get(outDir, name)
        java.nio.file.Files.write(p, bytes)
        println(s"wrote $p (${bytes.length} bytes)")
      }
      val docs = EzFrame(spark.read.parquet(s"$sfDir/documents.parquet"))
      val plt = Plotter(docs)
      write("hist_n_chars.png", plt.hist("n_chars", bins = 12).toPng())
      write("hist_n_chars.svg", plt.hist("n_chars", bins = 12).toSvg().getBytes("UTF-8"))
      write("scatter.png", plt.scatter("n_chars", "doc_id", maxPoints = 200).toPng())
      write("hist2d.png", plt.hist2d("n_chars", "doc_id", bins = 12).toPng())
      write("corner.png", plt.corner(Seq("n_chars", "doc_id"), bins = 8).toPng())
      write("box.png", plt.box("n_chars", "doc_id").toPng())
    } finally spark.stop()
  }
}
