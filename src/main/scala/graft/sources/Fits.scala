package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap
import graft.core.{EzFrame, EzMeta}

/** FITS binary-table (BINTABLE) reader/writer, from the published FITS
  * 4.0 standard (Pence et al. 2010, A&A 524, A42): 2880-byte blocks,
  * 80-char ASCII header cards, big-endian fixed-width rows.  The
  * reference reads/writes FITS via astropy/pyfits
  * (ezdata/simpletable.py:1523–1538 read, 1756–1766 write, header
  * handling 160–409); here the format is implemented directly.
  *
  * Scale design: the header parse is a bounded driver-side read; the
  * data payload is fixed-width rows, so the distributed read is
  * offset-partitioned — `spark.range(nrows, parts)` hands each task a
  * contiguous row range which it reads sequentially from the shared
  * filesystem.  No driver materialization.
  */
object Fits {

  private val Block = 2880

  final case class Col(name: String, tform: String, unit: Option[String]) {
    val (repeat, code): (Int, Char) = {
      val m = "([0-9]*)([LBIJKEDA])".r.findFirstMatchIn(tform.trim)
        .getOrElse(throw new IllegalArgumentException(s"unsupported TFORM '$tform'"))
      (if (m.group(1).isEmpty) 1 else m.group(1).toInt, m.group(2).head)
    }
    def byteWidth: Int = code match {
      case 'L' | 'B' | 'A' => repeat
      case 'I' => 2 * repeat
      case 'J' | 'E' => 4 * repeat
      case 'K' | 'D' => 8 * repeat
    }
    def sparkType: DataType = code match {
      case 'L' => BooleanType
      case 'B' => ShortType // FITS B is unsigned byte
      case 'I' => ShortType
      case 'J' => IntegerType
      case 'K' => LongType
      case 'E' => FloatType
      case 'D' => DoubleType
      case 'A' => StringType
    }
  }

  // ------------------------------------------------------------- header
  private def card(key: String, value: String, comment: String = ""): String = {
    val base = f"${key.take(8)}%-8s= $value%20s"
    val full = if (comment.nonEmpty) s"$base / $comment" else base
    f"$full%-80s".take(80)
  }
  private def cardStr(key: String, value: String): String =
    card(key, "'" + value.padTo(8, ' ') + "'")

  private def pad(n: Long): Int = ((Block - (n % Block)) % Block).toInt

  /** ASCII-table (XTENSION='TABLE') column: fixed-width character
    * field at 1-based start column `tbcol`, format like A10 / I8 /
    * F12.4 / E15.7 / D25.17 (FITS 4.0 §7.2). */
  final case class AsciiCol(name: String, tform: String, unit: Option[String], tbcol: Int) {
    val (code, width): (Char, Int) = {
      // anchored full match (a Regex extractor matches the WHOLE
      // string) — an unanchored find would accept malformed TFORMs
      // like 'XA10' via their valid substring.  FITS 4.0 §7.2 allows
      // a fraction ONLY on the F/E/D forms (F12.4 / E15.7 / D25.17);
      // 'A10.2' or 'I8.3' are malformed and rejected loudly.
      val re = "([AIFED])([0-9]+)(\\.[0-9]+)?".r
      tform.trim match {
        case re(c, w, frac) if frac == null || c != "A" && c != "I" =>
          (c.head, w.toInt)
        case _ => throw new IllegalArgumentException(s"unsupported ASCII TFORM '$tform'")
      }
    }
    def sparkType: DataType = code match {
      case 'A' => StringType
      case 'I' => LongType
      case _   => DoubleType // F, E, D — all fixed/floating decimal text
    }
  }

  final case class TableHeader(cols: Seq[Col], nRows: Long, rowBytes: Int,
                               dataStart: Long, header: ListMap[String, String],
                               asciiCols: Seq[AsciiCol] = Nil) {
    def isAscii: Boolean = asciiCols.nonEmpty
  }

  /** Driver-side header scan: walk HDUs until the `hdu`-th BINTABLE
    * (1-based — appended tables are addressed as hdu = 2, 3, …). */
  def readHeader(path: String, hdu: Int = 1): TableHeader = {
    require(hdu >= 1, s"hdu is 1-based, got $hdu")
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      var offset = 0L
      var seen = 0
      var result: Option[TableHeader] = None
      while (result.isEmpty) {
        // read cards block by block until END
        val cards = scala.collection.mutable.ListBuffer.empty[String]
        var done = false
        var hdrBlocks = 0
        while (!done) {
          val buf = new Array[Byte](Block)
          raf.seek(offset + hdrBlocks.toLong * Block)
          raf.readFully(buf)
          hdrBlocks += 1
          val text = new String(buf, "US-ASCII")
          (0 until Block by 80).foreach { i =>
            val c = text.substring(i, i + 80)
            if (c.startsWith("END     ")) done = true
            else if (!done && c.trim.nonEmpty) cards += c
          }
        }
        // the '/' comment separator only counts OUTSIDE a quoted value —
        // a blind split would truncate units like 'km/s'
        def rawValue(key: String): Option[String] =
          cards.find(_.startsWith(f"$key%-8s= ")).map { c =>
            val body = c.drop(10)
            if (body.trim.startsWith("'")) {
              val start = body.indexOf('\'')
              val end = body.indexOf('\'', start + 1)
              if (end > start) body.substring(start, end + 1) else body.trim
            } else body.split("/")(0).trim
          }
        def value(key: String): Option[String] = rawValue(key)
        def strValue(key: String): Option[String] =
          rawValue(key).map(_.stripPrefix("'").stripSuffix("'").reverse.dropWhile(_ == ' ').reverse.trim)
        val dataStart = offset + hdrBlocks.toLong * Block
        val isBintable = strValue("XTENSION").contains("BINTABLE")
        // ASCII tables (XTENSION='TABLE') count as table HDUs too —
        // astropy reads both transparently, so the hdu index must see
        // them (a file whose first table is ASCII would otherwise be
        // unaddressable)
        val isAsciiTable = strValue("XTENSION").contains("TABLE") && !isBintable
        val naxis1 = value("NAXIS1").map(_.toInt).getOrElse(0)
        val naxis2 = value("NAXIS2").map(_.toLong).getOrElse(0L)
        if ((isBintable || isAsciiTable) && { seen += 1; seen == hdu }) {
          val nFields = value("TFIELDS").map(_.toInt).getOrElse(0)
          val meta = cards
            .filter(c => !c.startsWith("TTYPE") && !c.startsWith("TFORM") &&
              !c.startsWith("TUNIT") && !c.startsWith("TBCOL"))
            .flatMap { c =>
              val key = c.take(8).trim
              if (Set("XTENSION", "BITPIX", "NAXIS", "NAXIS1", "NAXIS2", "PCOUNT",
                "GCOUNT", "TFIELDS", "SIMPLE", "EXTEND", "COMMENT", "").contains(key)) None
              else strValue(key).orElse(Some(c.drop(10).split("/")(0).trim)).map(key -> _)
            }
          if (isAsciiTable) {
            val acols = (1 to nFields).map { i =>
              AsciiCol(
                strValue(s"TTYPE$i").getOrElse(s"col$i"),
                strValue(s"TFORM$i").getOrElse(throw new IllegalArgumentException(s"missing TFORM$i")),
                strValue(s"TUNIT$i"),
                value(s"TBCOL$i").map(_.toInt)
                  .getOrElse(throw new IllegalArgumentException(s"missing TBCOL$i")))
            }
            result = Some(TableHeader(Nil, naxis2, naxis1, dataStart,
              ListMap(meta.toSeq: _*), asciiCols = acols))
          } else {
            val cols = (1 to nFields).map { i =>
              Col(
                strValue(s"TTYPE$i").getOrElse(s"col$i"),
                strValue(s"TFORM$i").getOrElse(throw new IllegalArgumentException(s"missing TFORM$i")),
                strValue(s"TUNIT$i"))
            }
            result = Some(TableHeader(cols, naxis2, naxis1, dataStart, ListMap(meta.toSeq: _*)))
          }
        } else {
          // skip this HDU's data: a passed-over table spans
          // NAXIS1*NAXIS2 (+ PCOUNT heap) bytes; other HDUs span
          // BITPIX*prod(NAXIS)/8 (primary: usually 0)
          val dataBytes = if (isBintable || isAsciiTable) {
            naxis1.toLong * naxis2 + value("PCOUNT").map(_.toLong).getOrElse(0L)
          } else {
            val bitpix = math.abs(value("BITPIX").map(_.toInt).getOrElse(8))
            val naxis = value("NAXIS").map(_.toInt).getOrElse(0)
            val dims = (1 to naxis).map(i => value(s"NAXIS$i").map(_.toLong).getOrElse(0L))
            if (naxis == 0 || dims.contains(0L)) 0L
            else dims.product * bitpix / 8
          }
          offset = dataStart + dataBytes + pad(dataBytes)
          if (offset >= raf.length())
            throw new IllegalArgumentException(
              s"$path has no table extension #$hdu (found $seen)")
        }
      }
      result.get
    } finally raf.close()
  }

  /** Distributed read: contiguous row ranges per partition, sequential
    * big-endian decode.  `hdu` selects the n-th BINTABLE (appended
    * tables live at hdu = 2, 3, …). */
  def read(spark: SparkSession, path: String, partitions: Int = 0, hdu: Int = 1): EzFrame = {
    val h = readHeader(path, hdu)
    if (h.isAscii) return readAsciiData(spark, path, h, partitions)
    val schema = StructType(h.cols.map(c =>
      StructField(c.name, if (c.code != 'A' && c.repeat > 1) ArrayType(c.sparkType) else c.sparkType)))
    val nParts = if (partitions > 0) partitions
      else math.max(1, math.min(64, h.nRows / 65536)).toInt
    val cols = h.cols
    val rowBytes = h.rowBytes
    val dataStart = h.dataStart
    val rowsRdd = spark.sparkContext.range(0L, h.nRows, 1L, nParts)
      .mapPartitions { it =>
        val idx = it.toArray
        if (idx.isEmpty) Iterator.empty
        else {
          val raf = new java.io.RandomAccessFile(path, "r")
          // close on task completion, not on iterator exhaustion — a
          // limit() or task failure would otherwise leak the handle
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
          val buf = new Array[Byte](rowBytes)
          idx.iterator.map { i =>
            raf.seek(dataStart + i * rowBytes)
            raf.readFully(buf)
            decodeRow(buf, cols)
          }
        }
      }
    val df = spark.createDataFrame(rowsRdd.map(identity), schema)
    val meta = EzMeta(
      header = h.header,
      units = h.cols.flatMap(c => c.unit.map(c.name -> _)).toMap)
    EzFrame(CommentedCsv.withFieldMetadata(df, meta), meta)
  }

  /** ASCII-table data read: the same offset-partitioned shape as the
    * binary path (fixed NAXIS1-char rows), decoded by TBCOL/TFORM
    * substring + parse.  Blank fields read as null; Fortran 'D'
    * exponents parse as doubles. */
  private def readAsciiData(spark: SparkSession, path: String, h: TableHeader,
                            partitions: Int): EzFrame = {
    val schema = StructType(h.asciiCols.map(c => StructField(c.name, c.sparkType)))
    val nParts = if (partitions > 0) partitions
      else math.max(1, math.min(64, h.nRows / 65536)).toInt
    val cols = h.asciiCols
    val rowBytes = h.rowBytes
    val dataStart = h.dataStart
    val rowsRdd = spark.sparkContext.range(0L, h.nRows, 1L, nParts)
      .mapPartitions { it =>
        val idx = it.toArray
        if (idx.isEmpty) Iterator.empty
        else {
          val raf = new java.io.RandomAccessFile(path, "r")
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
          val buf = new Array[Byte](rowBytes)
          idx.iterator.map { i =>
            raf.seek(dataStart + i * rowBytes)
            raf.readFully(buf)
            decodeAsciiRow(new String(buf, "US-ASCII"), cols)
          }
        }
      }
    val df = spark.createDataFrame(rowsRdd.map(identity), schema)
    val meta = EzMeta(
      header = h.header,
      units = cols.flatMap(c => c.unit.map(c.name -> _)).toMap)
    EzFrame(CommentedCsv.withFieldMetadata(df, meta), meta)
  }

  private[sources] def decodeAsciiRow(line: String, cols: Seq[AsciiCol]): Row = {
    val values = cols.map { c =>
      val start = c.tbcol - 1
      val end = math.min(start + c.width, line.length)
      val raw = if (start >= line.length) "" else line.substring(start, end)
      val field = raw.trim
      if (field.isEmpty) null
      else c.code match {
        // strings keep leading spaces inside the field, strip trailing
        // pad (the astropy read convention)
        case 'A' => raw.reverse.dropWhile(_ == ' ').reverse
        case 'I' => java.lang.Long.parseLong(field)
        case _   => java.lang.Double.parseDouble(field.replace('D', 'E').replace('d', 'e'))
      }
    }
    Row(values: _*)
  }

  private def decodeRow(buf: Array[Byte], cols: Seq[Col]): Row = {
    val bb = java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.BIG_ENDIAN)
    val values = cols.map { c =>
      def one(): Any = c.code match {
        case 'L' => bb.get() == 'T'.toByte
        case 'B' => (bb.get() & 0xff).toShort
        case 'I' => bb.getShort
        case 'J' => bb.getInt
        case 'K' => bb.getLong
        case 'E' => bb.getFloat
        case 'D' => bb.getDouble
      }
      c.code match {
        case 'A' =>
          val bytes = new Array[Byte](c.repeat)
          bb.get(bytes)
          new String(bytes, "US-ASCII").reverse.dropWhile(ch => ch == ' ' || ch == '\u0000').reverse
        case _ if c.repeat > 1 => (0 until c.repeat).map(_ => one())
        case _ => one()
      }
    }
    Row(values: _*)
  }

  // ------------------------------------------------------------- write
  private def tformOf(dt: DataType, maxStr: Int): String = dt match {
    case BooleanType => "L"
    case ShortType => "I"
    case IntegerType => "J"
    case LongType => "K"
    case FloatType => "E"
    case DoubleType => "D"
    case StringType => s"${maxStr}A"
    case other => throw new IllegalArgumentException(s"cannot write $other to FITS")
  }

  /** Write a single-BINTABLE FITS file (empty primary HDU + table).
    * Column order, units, and table header round-trip.
    *
    * NAXIS2 and the string column widths are needed up front, so one
    * aggregate pass computes them; the rows then stream through
    * `toLocalIterator` — the sink is inherently single-file, but driver
    * memory stays O(one partition), never O(table). */
  def write(ez: EzFrame, path: String): Unit = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    try {
      // primary HDU
      val primary = Seq(
        card("SIMPLE", f"${"T"}%20s"), card("BITPIX", f"${8}%20d"),
        card("NAXIS", f"${0}%20d"), card("EXTEND", f"${"T"}%20s"),
        f"${"END"}%-80s")
      writeCards(out, primary)
      writeBintableHdu(out, ez)
    } finally out.close()
  }

  /** Append a new BINTABLE HDU to an existing FITS file; creates the
    * file (primary + table) if it doesn't exist or is empty
    * (ezdata/simpletable.py:1756–1766 write(append=True) →
    * _fits_append, 344–409).  HDUs are self-delimiting 2880-byte-
    * aligned units, so appending is a plain end-of-file stream; the
    * appended table is read back with `read(..., hdu = n)`. */
  def append(ez: EzFrame, path: String): Unit = {
    val f = new java.io.File(path)
    if (!f.exists() || f.length() == 0L) write(ez, path)
    else {
      require(f.length() % Block == 0,
        s"$path is not block-aligned (${f.length()} bytes) — not a valid FITS file")
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path, true))
      try writeBintableHdu(out, ez) finally out.close()
    }
  }

  /** One BINTABLE HDU (header + streamed rows + padding).  NAXIS2 and
    * the string column widths are needed up front, so one aggregate
    * pass computes them; rows then stream through `toLocalIterator` —
    * driver memory stays O(one partition), never O(table). */
  private def writeBintableHdu(out: java.io.OutputStream, ez: EzFrame): Unit = {
    import org.apache.spark.sql.functions.{coalesce, count, length, lit, max}
    val df = ez.df
    val widthAggs = df.schema.fields.collect {
      case f if f.dataType == StringType =>
        coalesce(max(length(df(f.name))), lit(1)).as(s"w_${f.name}")
    }
    val head = df.agg(count(lit(1)).as("n"), widthAggs.toIndexedSeq: _*).head()
    val nRows = head.getLong(head.fieldIndex("n"))
    val maxStr = df.schema.fields.map { f =>
      f.dataType match {
        case StringType => math.max(1, head.getAs[Number](s"w_${f.name}").intValue())
        case _ => 0
      }
    }
    val tforms = df.schema.fields.zipWithIndex.map { case (f, i) => tformOf(f.dataType, maxStr(i)) }
    val colWidths = df.schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case BooleanType => 1; case ShortType => 2; case IntegerType => 4
        case LongType => 8; case FloatType => 4; case DoubleType => 8
        case StringType => maxStr(i)
        case other => throw new IllegalArgumentException(other.toString)
      }
    }
    val rowBytes = colWidths.sum
    locally {
      // bintable header
      val hdr = scala.collection.mutable.ListBuffer(
        cardStr("XTENSION", "BINTABLE"), card("BITPIX", f"${8}%20d"),
        card("NAXIS", f"${2}%20d"), card("NAXIS1", f"$rowBytes%20d"),
        card("NAXIS2", f"$nRows%20d"), card("PCOUNT", f"${0}%20d"),
        card("GCOUNT", f"${1}%20d"), card("TFIELDS", f"${df.schema.length}%20d"))
      df.schema.fields.zipWithIndex.foreach { case (f, i) =>
        hdr += cardStr(s"TTYPE${i + 1}", f.name)
        hdr += cardStr(s"TFORM${i + 1}", tforms(i))
        ez.meta.units.get(f.name).foreach(u => hdr += cardStr(s"TUNIT${i + 1}", u))
      }
      ez.meta.header.take(50).foreach { case (k, v) =>
        if (k.length <= 8 && k.matches("[A-Z0-9_-]+")) hdr += cardStr(k, v.take(60))
      }
      hdr += f"${"END"}%-80s"
      writeCards(out, hdr.toSeq)
      // data
      var written = 0L
      val bb = java.nio.ByteBuffer.allocate(rowBytes).order(java.nio.ByteOrder.BIG_ENDIAN)
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        bb.clear()
        df.schema.fields.zipWithIndex.foreach { case (f, i) =>
          f.dataType match {
            case BooleanType => bb.put(if (!r.isNullAt(i) && r.getBoolean(i)) 'T'.toByte else 'F'.toByte)
            case ShortType => bb.putShort(if (r.isNullAt(i)) 0 else r.getShort(i))
            case IntegerType => bb.putInt(if (r.isNullAt(i)) 0 else r.getInt(i))
            case LongType => bb.putLong(if (r.isNullAt(i)) 0L else r.getLong(i))
            case FloatType => bb.putFloat(if (r.isNullAt(i)) Float.NaN else r.getFloat(i))
            case DoubleType => bb.putDouble(if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
            case StringType =>
              val s = if (r.isNullAt(i)) "" else r.getString(i)
              bb.put(s.padTo(maxStr(i), ' ').take(maxStr(i)).getBytes("US-ASCII"))
            case other => throw new IllegalArgumentException(other.toString)
          }
        }
        out.write(bb.array(), 0, rowBytes)
        written += rowBytes
      }
      require(written == nRows * rowBytes,
        s"row count changed between the header pass and the data pass: " +
          s"expected $nRows rows, wrote ${written / rowBytes}")
      out.write(new Array[Byte](pad(written)))
    }
  }

  private def writeCards(out: java.io.OutputStream, cards: Seq[String]): Unit = {
    val text = cards.mkString
    out.write(text.getBytes("US-ASCII"))
    val padChars = pad(text.length.toLong)
    out.write(" " * padChars getBytes "US-ASCII")
  }
}
