package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap
import graft.core.{EzFrame, EzMeta}

/** VOTable (IVOA XML table format) reader/writer — the reference reads
  * VOTables via astropy (ezdata/simpletable.py:1551–1565).  Implemented
  * against the public IVOA VOTable 1.4 spec with the JDK DOM parser
  * (no external deps).  Reads all three row serializations the spec
  * defines — TABLEDATA (XML cells), BINARY (base64 stream of
  * big-endian records), and BINARY2 (BINARY + per-row null mask);
  * writes TABLEDATA.
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

    val fieldElems = elems(table, "FIELD")
    val fields = fieldElems.map { f =>
      (f.getAttribute("name"),
        sparkType(f.getAttribute("datatype")),
        Option(f.getAttribute("unit")).filter(_.nonEmpty))
    }
    // (datatype, arraysize) drive the BINARY record layout
    val binTypes = fieldElems.map { f =>
      (f.getAttribute("datatype"),
        Option(f.getAttribute("arraysize")).filter(_.nonEmpty))
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
    // BINARY / BINARY2: base64 STREAM of big-endian records (spec §5.5
    // and §5.6; BINARY2 rows lead with a ceil(nFields/8)-byte null mask)
    val binRows = data.toSeq.flatMap { d =>
      elems(d, "BINARY").map(_ -> false) ++ elems(d, "BINARY2").map(_ -> true)
    }.flatMap { case (bin, withMask) =>
      val stream = elems(bin, "STREAM").headOption.getOrElse(
        throw new IllegalArgumentException(s"$path: BINARY without STREAM"))
      val enc = Option(stream.getAttribute("encoding")).filter(_.nonEmpty).getOrElse("base64")
      require(enc == "base64", s"$path: unsupported STREAM encoding '$enc'")
      val bytes = java.util.Base64.getMimeDecoder.decode(stream.getTextContent.trim)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
      val maskBytes = if (withMask) (binTypes.length + 7) / 8 else 0
      val out = scala.collection.mutable.ListBuffer.empty[Row]
      while (bb.remaining() > 0) {
        val mask = new Array[Byte](maskBytes); bb.get(mask)
        def isNull(i: Int): Boolean =
          withMask && ((mask(i / 8) >> (7 - i % 8)) & 1) == 1
        out += Row(binTypes.zipWithIndex.map { case ((dt, arraysize), i) =>
          val v = readBinaryCell(bb, dt, arraysize, path)
          if (isNull(i)) null else v
        }: _*)
      }
      out.toSeq
    }
    val allRows = rows ++ binRows
    val df = spark.createDataFrame(spark.sparkContext.parallelize(allRows.toSeq, math.max(1, allRows.length / 10000)), schema)
    val meta = EzMeta(header = header,
      units = fields.flatMap { case (n, _, u) => u.map(n -> _) }.toMap)
    EzFrame(CommentedCsv.withFieldMetadata(df, meta), meta)
  }

  /** One BINARY-serialization cell, big-endian (spec §5.5): scalars by
    * datatype width; char/unicodeChar strings with `arraysize` fixed
    * length or "*" (4-byte count prefix); booleans as the ASCII
    * 'T'/'F'/'?' byte.  The value must always be CONSUMED (even when a
    * BINARY2 mask nulls it) to keep the record aligned. */
  private def readBinaryCell(bb: java.nio.ByteBuffer, datatype: String,
                             arraysize: Option[String], path: String): Any = {
    def strLen(charBytes: Int): Int = arraysize match {
      case None => charBytes // scalar char = one character
      case Some("*") => bb.getInt
      case Some(s) if s.forall(_.isDigit) => s.toInt * charBytes
      case Some(other) => throw new IllegalArgumentException(
        s"$path: unsupported arraysize '$other' for $datatype")
    }
    datatype match {
      case "boolean" =>
        (bb.get().toChar: @unchecked) match {
          case 'T' | 't' | '1' => true
          case 'F' | 'f' | '0' => false
          case _ => null // '?', ' ', \0 = unknown
        }
      case "unsignedByte" => (bb.get() & 0xff).toShort
      case "short" => bb.getShort
      case "int" => bb.getInt
      case "long" => bb.getLong
      case "float" => bb.getFloat
      case "double" => bb.getDouble
      case "char" =>
        val n = strLen(1)
        val raw = new Array[Byte](n); bb.get(raw)
        new String(raw, "US-ASCII").replaceAll("[\\u0000 ]+$", "")
      case "unicodeChar" =>
        val n = strLen(2)
        val raw = new Array[Byte](n); bb.get(raw)
        new String(raw, "UTF-16BE").replaceAll("[\\u0000 ]+$", "")
      case other => throw new IllegalArgumentException(
        s"$path: unsupported BINARY datatype '$other'")
    }
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
