package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap
import graft.core.{EzFrame, EzMeta}

/** VOTable (IVOA XML table format) reader/writer for the TABLEDATA
  * serialization — the reference reads VOTables via astropy
  * (ezdata/simpletable.py:1551–1565).  Implemented against the public
  * IVOA VOTable 1.4 spec with the JDK DOM parser (no external deps).
  *
  * VOTables are small-catalog interchange files; the parse is
  * driver-side, then the rows become a normal distributed DataFrame.
  * (Large tables in the VO world ship as FITS — see [[Fits]].)
  */
object VoTable {

  private def sparkType(datatype: String): DataType = datatype match {
    case "boolean" => BooleanType
    case "short" | "unsignedByte" => ShortType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "char" | "unicodeChar" => StringType
    case other => throw new IllegalArgumentException(s"unsupported VOTable datatype '$other'")
  }

  private def voType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ShortType => "short"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "char"
    case other => throw new IllegalArgumentException(s"cannot write $other to VOTable")
  }

  def read(spark: SparkSession, path: String): EzFrame = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(new java.io.File(path))
    def elems(parent: org.w3c.dom.Node, tag: String): Seq[org.w3c.dom.Element] = {
      val out = scala.collection.mutable.ListBuffer.empty[org.w3c.dom.Element]
      val kids = parent.getChildNodes
      (0 until kids.getLength).foreach { i =>
        kids.item(i) match {
          case e: org.w3c.dom.Element if e.getTagName == tag => out += e
          case _ =>
        }
      }
      out.toSeq
    }
    val votable = doc.getDocumentElement
    val resource = elems(votable, "RESOURCE").headOption
      .getOrElse(throw new IllegalArgumentException(s"$path: no RESOURCE element"))
    val table = elems(resource, "TABLE").headOption
      .getOrElse(throw new IllegalArgumentException(s"$path: no TABLE element"))

    val fields = elems(table, "FIELD").map { f =>
      (f.getAttribute("name"),
        sparkType(f.getAttribute("datatype")),
        Option(f.getAttribute("unit")).filter(_.nonEmpty))
    }
    val schema = StructType(fields.map { case (n, t, _) => StructField(n, t) })
    val header = (elems(votable, "DESCRIPTION") ++ elems(table, "DESCRIPTION"))
      .headOption.map(d => ListMap("DESCRIPTION" -> d.getTextContent.trim)).getOrElse(ListMap.empty)

    val data = elems(table, "DATA").headOption
    val tabledata = data.toSeq.flatMap(elems(_, "TABLEDATA"))
    val rows = tabledata.flatMap(elems(_, "TR")).map { tr =>
      val tds = elems(tr, "TD").map(_.getTextContent)
      Row(fields.zip(tds.padTo(fields.length, "")).map { case ((_, t, _), text) =>
        if (text.isEmpty) null
        else t match {
          case BooleanType => text.trim.toLowerCase.startsWith("t") || text.trim == "1"
          case ShortType => text.trim.toShort
          case IntegerType => text.trim.toInt
          case LongType => text.trim.toLong
          case FloatType => text.trim.toFloat
          case DoubleType => text.trim.toDouble
          case StringType => text
          case other => throw new IllegalStateException(other.toString)
        }
      }: _*)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.length / 10000)), schema)
    val meta = EzMeta(header = header,
      units = fields.flatMap { case (n, _, u) => u.map(n -> _) }.toMap)
    EzFrame(CommentedCsv.withFieldMetadata(df, meta), meta)
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  /** Streamed write: rows flow through `toLocalIterator` straight into
    * the file writer, so driver memory stays O(one partition) — never
    * O(table) (the sink is inherently single-file XML, same posture as
    * Fits.write). */
  def write(ez: EzFrame, path: String): Unit = {
    val out = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path))
    try {
      out.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      out.write("<VOTABLE version=\"1.4\" xmlns=\"http://www.ivoa.net/xml/VOTable/v1.3\">\n")
      ez.meta.header.get("DESCRIPTION").foreach(d => out.write(s"  <DESCRIPTION>${esc(d)}</DESCRIPTION>\n"))
      out.write("  <RESOURCE>\n    <TABLE>\n")
      ez.schema.fields.foreach { f =>
        val unit = ez.meta.units.get(f.name).map(u => s""" unit="${esc(u)}"""").getOrElse("")
        val arr = if (f.dataType == StringType) """ arraysize="*"""" else ""
        out.write(s"""      <FIELD name="${esc(f.name)}" datatype="${voType(f.dataType)}"$unit$arr/>\n""")
      }
      out.write("      <DATA>\n        <TABLEDATA>\n")
      val it = ez.df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        out.write("          <TR>")
        ez.schema.fields.indices.foreach { i =>
          val cell = if (r.isNullAt(i)) "" else esc(r.get(i).toString)
          out.write(s"<TD>$cell</TD>")
        }
        out.write("</TR>\n")
      }
      out.write("        </TABLEDATA>\n      </DATA>\n    </TABLE>\n  </RESOURCE>\n</VOTABLE>\n")
    } finally out.close()
  }
}
