package graft.sources

import org.apache.spark.sql.SparkSession
import graft.core.EzFrame

/** Extension-based format dispatch — the reference's `SimpleTable(fname)`
  * constructor routes on file extension (ezdata/simpletable.py:1500–1560
  * `_extensions` mapping); this is the same surface for the Spark build.
  *
  * Read:  csv, tsv/dat/txt (whitespace-run), ecsv, fits, vot/votable/xml,
  *        hd5/hdf5/h5, parquet.
  * Write: csv, tsv/dat/txt, ecsv, fits, hd5/hdf5/h5 (compound layout;
  *        use [[Hdf5Write.writeColumns]] directly for the vaex layout),
  *        tex (LaTeX table), parquet.
  */
object Io {

  private def ext(path: String): String = {
    val name = path.split('/').last
    val i = name.lastIndexOf('.')
    if (i < 0) "" else name.substring(i + 1).toLowerCase
  }

  def read(spark: SparkSession, path: String): EzFrame = ext(path) match {
    case "csv" => CommentedCsv.read(spark, path)
    case "tsv" => CommentedCsv.read(spark, path, delimiter = "\t")
    case "dat" | "txt" => CommentedCsv.readWhitespace(spark, path)
    case "ecsv" => Ecsv.read(spark, path)
    case "fits" | "fit" => Fits.read(spark, path)
    case "vot" | "votable" | "xml" => VoTable.read(spark, path)
    case "hd5" | "hdf5" | "h5" => Hdf5.read(spark, path)
    case "arrow" | "feather" | "ipc" => ArrowIpc.read(spark, path)
    case "parquet" | "pq" => EzFrame.readParquet(spark, path)
    case e => throw new IllegalArgumentException(
      s"unknown table extension '$e' (path: $path)")
  }

  /** `append = true` mirrors the reference's `write(append=True)`:
    * supported for FITS (adds a BINTABLE HDU, readable via
    * `Fits.read(..., hdu = n)`); other formats reject it loudly. */
  def write(ez: EzFrame, path: String, append: Boolean = false): Unit = ext(path) match {
    case "fits" | "fit" if append => Fits.append(ez, path)
    case e if append => throw new IllegalArgumentException(
      s"append is only supported for FITS, not '$e' (path: $path)")
    case "csv" => CommentedCsv.write(ez, path)
    case "tsv" => CommentedCsv.write(ez, path, delimiter = "\t")
    case "dat" | "txt" => CommentedCsv.write(ez, path, delimiter = " ")
    case "ecsv" => Ecsv.write(ez, path)
    case "fits" | "fit" => Fits.write(ez, path)
    case "hd5" | "hdf5" | "h5" => Hdf5Write.write(ez, path)
    case "arrow" | "feather" | "ipc" => ArrowIpc.write(ez, path)
    case "tex" =>
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        CommentedCsv.toLatex(ez).getBytes("UTF-8"))
    case "parquet" | "pq" => graft.core.EzFrame.writeParquet(ez, path)
    case e => throw new IllegalArgumentException(
      s"unknown table extension '$e' (path: $path)")
  }
}
