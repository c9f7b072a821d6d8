package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap
import scala.collection.mutable
import graft.core.{EzFrame, EzMeta}

/** HDF5 reader: a direct implementation of the public HDF5 file format
  * specification (HDF Group, "HDF5 File Format Specification Version
  * 3.0") — the reference reads HDF5 via h5py/pytables
  * (ezdata/simpletable.py:1539–1550 read, 659–726 schema mapping;
  * dask/hdf5.py:199–283 partitioned scan).  No HDF5 native library is
  * used; the format is parsed from bytes.
  *
  * Supported subset (covers what h5py/pytables/vaex write for tables):
  *  - superblock v0/v1 (symbol-table root) and v2/v3 (direct root OH)
  *  - object headers v1 and v2 ("OHDR"), incl. continuation blocks
  *  - groups via v1 symbol tables (B-tree + local heap), v2 Link
  *    messages (hard links), and dense storage (fractal heap + v2
  *    B-tree name index, one indirect level — h5py past the compact
  *    threshold or with track_order; deeper nesting raises a
  *    descriptive error)
  *  - datatypes: fixed-point, IEEE float, fixed-length strings,
  *    vlen strings (global heap), compound (v1–v3 member encodings),
  *    array (class 10)
  *  - data layouts: compact, contiguous, chunked (v1 B-tree index),
  *    layout messages v1/v2/v3
  *  - filters: deflate (via java.util.zip), shuffle, fletcher32 (crc
  *    stripped; verification skipped)
  *
  * Scale design mirrors [[Fits]]: all metadata (object headers, chunk
  * B-trees) is a bounded driver-side read; row payload is read by
  * executors — contiguous datasets are offset-partitioned by row
  * range, chunked datasets are partitioned by chunk.  No driver
  * materialization of data.
  */
object Hdf5 {

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF parsed as signed

  // ============================================================ datatypes

  sealed trait Dtype extends Serializable {
    def size: Int
    def sparkType: DataType
  }
  final case class FixedPoint(size: Int, signed: Boolean, le: Boolean) extends Dtype {
    def sparkType: DataType = size match {
      case 1 => if (signed) ByteType else ShortType
      case 2 => if (signed) ShortType else IntegerType
      case 4 => if (signed) IntegerType else LongType
      case 8 => LongType // unsigned 64-bit maps to long (values < 2^63 in practice)
      case n => throw new IllegalArgumentException(s"fixed-point size $n")
    }
  }
  final case class FloatPoint(size: Int, le: Boolean) extends Dtype {
    def sparkType: DataType = if (size == 4) FloatType else DoubleType
  }
  final case class FixedString(size: Int) extends Dtype {
    def sparkType: DataType = StringType
  }
  /** Variable-length string (HDF5 datatype class 9, type 1 — what h5py
    * writes for `str` columns by default).  The in-dataset element is a
    * (length u4, global-heap collection address, object index u4)
    * reference; the bytes live in GCOL collections resolved at decode
    * time via [[GlobalHeap]]. */
  final case class VlenString(size: Int) extends Dtype {
    def sparkType: DataType = StringType
  }
  /** Enumeration (HDF5 datatype class 8): fixed-point codes → names.
    * Read as the decoded STRING column — the Spark-native equivalent of
    * the reference restoring a pandas Categorical from the codes
    * (dask/hdf5.py:58–72, 102–107; pytables writes these for
    * categorical columns).  Codes absent from the map decode to null. */
  final case class EnumOf(base: FixedPoint, mapping: Map[Long, String]) extends Dtype {
    val size: Int = base.size
    def sparkType: DataType = StringType
  }
  final case class ArrayOf(base: Dtype, dims: Seq[Int]) extends Dtype {
    val size: Int = base.size * dims.product
    // enum elements decode unknown codes to null — the array schema
    // must admit that, or row conversion throws on the first bad code
    def sparkType: DataType =
      ArrayType(base.sparkType, containsNull = base.isInstanceOf[EnumOf])
  }
  final case class Member(name: String, offset: Int, dtype: Dtype)
  final case class Compound(members: Seq[Member], size: Int) extends Dtype {
    def sparkType: DataType = StructType(members.map(m => StructField(m.name, m.dtype.sparkType)))
  }

  // ============================================================ layouts

  sealed trait Layout extends Serializable
  final case class Contiguous(addr: Long, size: Long) extends Layout
  /** chunkDims excludes the trailing element-size dimension. */
  final case class Chunked(chunkDims: Seq[Long], chunks: Seq[Chunk],
                           filters: Seq[Filter]) extends Layout
  final case class Compact(data: Array[Byte]) extends Layout
  final case class Chunk(offsets: Seq[Long], addr: Long, size: Long, filterMask: Int)
  final case class Filter(id: Int, clientData: Seq[Int])

  final case class DatasetInfo(path: String, dtype: Dtype, dims: Seq[Long], layout: Layout) {
    def nRows: Long = if (dims.isEmpty) 1L else dims.head
  }
  final case class GroupInfo(path: String, children: ListMap[String, Long]) // name -> OH addr

  // ============================================================ low-level file access

  /** Bounded random-access byte reader (driver side: metadata; executor
    * side: data ranges). All multi-byte metadata integers are little-endian
    * per the HDF5 spec. */
  private final class Reader(val raf: java.io.RandomAccessFile) {
    def length: Long = raf.length()
    def readAt(addr: Long, n: Int): java.nio.ByteBuffer = {
      val buf = new Array[Byte](n)
      raf.seek(addr)
      raf.readFully(buf)
      java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    }
  }

  private def u1(b: java.nio.ByteBuffer): Int = b.get() & 0xff
  private def u2(b: java.nio.ByteBuffer): Int = b.getShort() & 0xffff
  private def u4(b: java.nio.ByteBuffer): Long = b.getInt() & 0xffffffffL
  private def u8(b: java.nio.ByteBuffer): Long = b.getLong()

  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')

  private final case class Superblock(version: Int, rootOH: Long,
                                      rootBtree: Long, rootHeap: Long, base: Long)

  private def findSuperblock(r: Reader): Superblock = {
    // the superblock may start at offset 0 or any 512*2^n offset
    var off = 0L
    while (off + 8 <= r.length) {
      val sig = new Array[Byte](8)
      r.raf.seek(off); r.raf.readFully(sig)
      if (sig.sameElements(Signature)) {
        val b = r.readAt(off + 8, 90.min((r.length - off - 8).toInt))
        val version = u1(b)
        version match {
          case 0 | 1 =>
            u1(b); u1(b); u1(b) // freespace ver, root STE ver, reserved
            u1(b) // shared header msg ver
            val so = u1(b); val sl = u1(b)
            require(so == 8 && sl == 8, s"only 8-byte offsets/lengths supported (got $so/$sl)")
            u1(b); u2(b); u2(b) // reserved, leaf k, internal k
            u4(b) // consistency flags
            if (version == 1) { u2(b); u2(b) } // indexed storage k + reserved
            val base = u8(b)
            u8(b); u8(b); u8(b) // freespace, eof, driver info
            // root group symbol table entry
            u8(b) // link name offset
            val rootOH = u8(b)
            u4(b); u4(b) // cache type, reserved
            val btree = u8(b); val heap = u8(b)
            return Superblock(version, base + rootOH, btree, heap, base + off)
          case 2 | 3 =>
            val so = u1(b); val sl = u1(b)
            require(so == 8 && sl == 8, s"only 8-byte offsets/lengths supported (got $so/$sl)")
            u1(b) // consistency flags
            val base = u8(b)
            u8(b); u8(b) // superblock extension, eof
            val rootOH = u8(b)
            return Superblock(version, base + rootOH, Undef, Undef, base + off)
          case v => throw new IllegalArgumentException(s"unsupported superblock version $v")
        }
      }
      off = if (off == 0) 512 else off * 2
    }
    throw new IllegalArgumentException("not an HDF5 file (no superblock signature)")
  }

  // ============================================================ object headers

  private final case class Message(typ: Int, body: java.nio.ByteBuffer)

  /** Parse all messages of the object header at `addr` (v1 or v2). */
  private def readObjectHeader(r: Reader, addr: Long): Seq[Message] = {
    val sig = r.readAt(addr, 4)
    val magic = new Array[Byte](4); sig.get(magic)
    if (magic.sameElements("OHDR".getBytes("US-ASCII"))) readOHv2(r, addr)
    else readOHv1(r, addr)
  }

  private def readOHv1(r: Reader, addr: Long): Seq[Message] = {
    val pre = r.readAt(addr, 16)
    val ver = u1(pre)
    require(ver == 1, s"object header v$ver at $addr (expected 1)")
    u1(pre)
    val nMsgs = u2(pre)
    u4(pre) // ref count
    val hdrSize = u4(pre)
    // 4 bytes padding after the 12-byte prefix; messages are 8-aligned
    val msgs = mutable.ListBuffer.empty[Message]
    // (block address, block length) queue; continuation blocks are raw messages
    var blocks = List((addr + 16, hdrSize))
    var remaining = nMsgs
    while (remaining > 0 && blocks.nonEmpty) {
      val (bAddr, bLen) = blocks.head
      blocks = blocks.tail
      val buf = r.readAt(bAddr, bLen.toInt)
      while (remaining > 0 && buf.remaining() >= 8) {
        val typ = u2(buf)
        val size = u2(buf)
        u1(buf); u1(buf); u1(buf); u1(buf) // flags + reserved
        if (buf.remaining() < size) { remaining = 0 }
        else {
          val body = buf.slice().order(java.nio.ByteOrder.LITTLE_ENDIAN)
          body.limit(size)
          buf.position(buf.position() + size)
          if (typ == 0x0010) { // continuation
            val cAddr = u8(body); val cLen = u8(body)
            blocks = blocks :+ (cAddr, cLen)
          } else msgs += Message(typ, body)
          remaining -= 1
        }
      }
    }
    msgs.toSeq
  }

  private def readOHv2(r: Reader, addr: Long): Seq[Message] = {
    val head = r.readAt(addr, 16)
    val magic = new Array[Byte](4); head.get(magic)
    val ver = u1(head)
    require(ver == 2, s"OHDR version $ver")
    val flags = u1(head)
    var pos = addr + 6
    if ((flags & 0x20) != 0) pos += 8 // times (4 x u4)
    if ((flags & 0x10) != 0) pos += 4 // max compact / min dense
    val sizeLen = 1 << (flags & 0x03)
    val szBuf = r.readAt(pos, sizeLen)
    val chunk0 = sizeLen match {
      case 1 => u1(szBuf).toLong
      case 2 => u2(szBuf).toLong
      case 4 => u4(szBuf)
      case 8 => u8(szBuf)
    }
    pos += sizeLen
    val trackOrder = (flags & 0x04) != 0
    val msgs = mutable.ListBuffer.empty[Message]
    var blocks = List((pos, chunk0, false))
    while (blocks.nonEmpty) {
      val (bAddr, bLen, isCont) = blocks.head
      blocks = blocks.tail
      var start = bAddr
      var len = bLen
      if (isCont) {
        val m = r.readAt(bAddr, 4); val mm = new Array[Byte](4); m.get(mm)
        require(mm.sameElements("OCHK".getBytes("US-ASCII")), "bad continuation block")
        start += 4
        len -= 8 // signature + trailing checksum
      } else len -= 4 // trailing checksum
      val buf = r.readAt(start, len.toInt)
      // a v2 message header is ≥ 4 bytes (+2 creation order)
      while (buf.remaining() >= 4 + (if (trackOrder) 2 else 0) + 1) {
        val typ = u1(buf)
        val size = u2(buf)
        u1(buf) // flags
        if (trackOrder) u2(buf)
        if (buf.remaining() < size) buf.position(buf.limit())
        else {
          val body = buf.slice().order(java.nio.ByteOrder.LITTLE_ENDIAN)
          body.limit(size)
          buf.position(buf.position() + size)
          if (typ == 0x0010) {
            val cAddr = u8(body); val cLen = u8(body)
            blocks = blocks :+ ((cAddr, cLen, true))
          } else if (typ != 0x0000) msgs += Message(typ, body)
        }
      }
    }
    msgs.toSeq
  }

  // ============================================================ message decoding

  private def parseDataspace(b: java.nio.ByteBuffer): Seq[Long] = {
    val ver = u1(b)
    val rank = u1(b)
    u1(b) // flags (maxdims ignored)
    if (ver == 1) { u1(b); u4(b) } // reserved
    else u1(b) // v2: type
    (0 until rank).map(_ => u8(b))
  }

  private def parseDatatype(b: java.nio.ByteBuffer): Dtype = {
    val cv = u1(b)
    val version = cv >> 4
    val clazz = cv & 0x0f
    val bf0 = u1(b); val bf8 = u1(b); val bf16 = u1(b)
    val size = u4(b).toInt
    clazz match {
      case 0 => // fixed-point
        u2(b); u2(b) // bit offset, precision
        FixedPoint(size, signed = (bf0 & 0x08) != 0, le = (bf0 & 0x01) == 0)
      case 1 => // floating-point
        // properties must be consumed: compound members parse sequentially
        u2(b); u2(b) // bit offset, precision
        u1(b); u1(b); u1(b); u1(b) // exp loc/size, mantissa loc/size
        u4(b) // exponent bias
        FloatPoint(size, le = (bf0 & 0x01) == 0)
      case 3 => // string (fixed length)
        FixedString(size)
      case 6 => // compound
        val nMembers = bf0 | (bf8 << 8)
        val members = (0 until nMembers).map { _ =>
          val name = version match {
            case 3 => readCString(b, pad = 0)
            case _ => readCString(b, pad = 8)
          }
          val offset = version match {
            case 1 | 2 => u4(b).toInt
            case 3 =>
              // minimal number of bytes to hold the compound size
              var n = 1; var s = size.toLong
              while (s > 255) { n += 1; s >>= 8 }
              var v = 0L
              (0 until n).foreach(i => v |= (u1(b).toLong << (8 * i)))
              v.toInt
          }
          val memberDims: Seq[Int] = if (version == 1) {
            val rank = u1(b)
            u1(b); u1(b); u1(b) // reserved
            u4(b) // dim permutation
            u4(b) // reserved
            val ds = (0 until 4).map(_ => u4(b).toInt)
            ds.take(rank)
          } else Nil
          val base = parseDatatype(b)
          val dt = if (memberDims.nonEmpty && memberDims.product > 1) ArrayOf(base, memberDims) else base
          Member(name, offset, dt)
        }
        Compound(members, size)
      case 10 => // array
        val rank = u1(b)
        if (version == 2) { u1(b); u1(b); u1(b) } // reserved
        val dims = (0 until rank).map(_ => u4(b).toInt)
        if (version == 2) (0 until rank).foreach(_ => u4(b)) // permutations
        val base = parseDatatype(b)
        ArrayOf(base, dims)
      case 8 => // enumeration: base fixed-point codes -> member names
        val nMembers = bf0 | (bf8 << 8)
        val base = parseDatatype(b) match {
          case f: FixedPoint => f
          case other => throw new IllegalArgumentException(
            s"HDF5 enum base type must be fixed-point, got $other")
        }
        val names = (0 until nMembers).map { _ =>
          // v1/2 names are nul-terminated padded to 8; v3 unpadded
          readCString(b, pad = if (version == 3) 0 else 8)
        }
        val values = (0 until nMembers).map { _ =>
          val raw = new Array[Byte](base.size)
          (0 until base.size).foreach(i => raw(i) = u1(b).toByte)
          val be = if (base.le) raw.reverse else raw
          var v = 0L
          be.foreach(byte => v = (v << 8) | (byte & 0xffL))
          if (base.signed && base.size < 8) {
            val sh = 64 - 8 * base.size
            v = (v << sh) >> sh
          }
          v
        }
        EnumOf(base, values.zip(names).toMap)
      case 9 => // variable-length
        val vtype = bf0 & 0x0f
        parseDatatype(b) // base type: consume (compound members parse sequentially)
        if (vtype == 1) VlenString(size)
        else throw new IllegalArgumentException(
          "unsupported HDF5 variable-length SEQUENCE datatype (only vlen " +
            "strings are supported; re-write the column as a fixed-width array)")
      case c =>
        throw new IllegalArgumentException(
          s"unsupported HDF5 datatype class $c (v$version, size $size)")
    }
  }

  private def readCString(b: java.nio.ByteBuffer, pad: Int): String = {
    val sb = new StringBuilder
    var n = 0
    var ch = u1(b); n += 1
    while (ch != 0) { sb.append(ch.toChar); ch = u1(b); n += 1 }
    if (pad > 0) while (n % pad != 0) { u1(b); n += 1 }
    sb.toString
  }

  private def parseFilters(b: java.nio.ByteBuffer): Seq[Filter] = {
    val ver = u1(b)
    val n = u1(b)
    if (ver == 1) { u2(b); u4(b) } // reserved
    (0 until n).map { _ =>
      val id = u2(b)
      val nameLen = if (ver == 1 || id >= 256) u2(b) else 0
      u2(b) // flags
      val nValues = u2(b)
      if (nameLen > 0) {
        val raw = new Array[Byte](if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen)
        b.get(raw)
      }
      val vals = (0 until nValues).map(_ => u4(b).toInt)
      if (ver == 1 && nValues % 2 == 1) u4(b) // pad
      Filter(id, vals)
    }
  }

  /** Walk a v1 B-tree of raw-data chunks (node type 1). */
  private def readChunkBtree(r: Reader, addr: Long, rank: Int, elemSize: Int): Seq[Chunk] = {
    if (addr == Undef) return Nil
    // key: chunk size (4), filter mask (4), rank+1 offsets (8 each)
    val keySize = 8 + 8 * (rank + 1)
    val head = r.readAt(addr, 24)
    val magic = new Array[Byte](4); head.get(magic)
    require(magic.sameElements("TREE".getBytes("US-ASCII")), s"bad chunk B-tree node at $addr")
    val nodeType = u1(head); val level = u1(head); val used = u2(head)
    require(nodeType == 1, s"B-tree node type $nodeType (expected 1)")
    u8(head); u8(head) // siblings
    val body = r.readAt(addr + 24, (used + 1) * keySize + used * 8)
    val out = mutable.ListBuffer.empty[Chunk]
    (0 until used).foreach { _ =>
      val sz = u4(body)
      val mask = u4(body).toInt
      val offs = (0 until (rank + 1)).map(_ => u8(body))
      val child = u8(body)
      if (level == 0) out += Chunk(offs.dropRight(1), child, sz, mask)
      else out ++= readChunkBtree(r, child, rank, elemSize)
    }
    out.toSeq
  }

  // ============================================================ group traversal

  private def childLinks(r: Reader, msgs: Seq[Message]): ListMap[String, Long] = {
    val out = mutable.LinkedHashMap.empty[String, Long]
    msgs.foreach { m =>
      m.typ match {
        case 0x0011 => // symbol table: btree + heap
          val b = m.body
          val btree = u8(b); val heap = u8(b)
          symbolTableLinks(r, btree, heap).foreach { case (k, v) => out(k) = v }
        case 0x0006 => // link message
          parseLinkMessage(m.body).foreach { case (name, oh) => out(name) = oh }
        case 0x0002 => // link info: dense groups store links in a
          // fractal heap indexed by a v2 B-tree (h5py past the compact
          // threshold, or libver='latest' with track_order)
          val b = m.body
          u1(b)
          val flags = u1(b)
          if ((flags & 0x01) != 0) u8(b) // max creation index
          val fheap = u8(b)
          val nameIndex = u8(b)
          if (fheap != Undef)
            denseLinks(r, fheap, nameIndex).foreach { case (k, v) => out(k) = v }
        case _ =>
      }
    }
    ListMap(out.toSeq: _*)
  }

  /** Hard-link message body (spec IV.A.2.g) → name -> OH address; soft /
    * external links yield None. */
  private def parseLinkMessage(b: java.nio.ByteBuffer): Option[(String, Long)] = {
    val ver = u1(b); require(ver == 1, s"link message v$ver")
    val flags = u1(b)
    val linkType = if ((flags & 0x08) != 0) u1(b) else 0
    if ((flags & 0x04) != 0) u8(b) // creation order
    if ((flags & 0x10) != 0) u1(b) // charset
    val lenSize = 1 << (flags & 0x03)
    val nameLen = lenSize match {
      case 1 => u1(b).toLong
      case 2 => u2(b).toLong
      case 4 => u4(b)
      case 8 => u8(b)
    }
    val nameBytes = new Array[Byte](nameLen.toInt); b.get(nameBytes)
    val name = new String(nameBytes, "UTF-8")
    if (linkType == 0) Some(name -> u8(b)) else None
  }

  private def symbolTableLinks(r: Reader, btreeAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
    if (btreeAddr == Undef) return Nil
    // local heap data segment
    val hh = r.readAt(heapAddr, 32)
    val magic = new Array[Byte](4); hh.get(magic)
    require(magic.sameElements("HEAP".getBytes("US-ASCII")), "bad local heap")
    u1(hh); u1(hh); u1(hh); u1(hh)
    val dataSize = u8(hh); u8(hh)
    val dataAddr = u8(hh)
    val heapData = r.readAt(dataAddr, dataSize.toInt)
    def nameAt(off: Long): String = {
      val sb = new StringBuilder
      var i = off.toInt
      while (i < heapData.limit() && heapData.get(i) != 0) { sb.append((heapData.get(i) & 0xff).toChar); i += 1 }
      sb.toString
    }
    val out = mutable.ListBuffer.empty[(String, Long)]
    def walk(addr: Long): Unit = {
      val head = r.readAt(addr, 24)
      val m2 = new Array[Byte](4); head.get(m2)
      require(m2.sameElements("TREE".getBytes("US-ASCII")), "bad group B-tree")
      val nodeType = u1(head); val level = u1(head); val used = u2(head)
      require(nodeType == 0, s"group B-tree node type $nodeType")
      u8(head); u8(head)
      val body = r.readAt(addr + 24, (used + 1) * 8 + used * 8)
      (0 until used).foreach { _ =>
        u8(body) // key (heap offset)
        val child = u8(body)
        if (level == 0) {
          // SNOD
          val sh = r.readAt(child, 8)
          val sm = new Array[Byte](4); sh.get(sm)
          require(sm.sameElements("SNOD".getBytes("US-ASCII")), "bad symbol node")
          u1(sh); u1(sh)
          val nSyms = u2(sh)
          val entries = r.readAt(child + 8, nSyms * 40)
          (0 until nSyms).foreach { _ =>
            val nameOff = u8(entries)
            val oh = u8(entries)
            u4(entries); u4(entries)
            entries.position(entries.position() + 16)
            out += nameAt(nameOff) -> oh
          }
        } else walk(child)
      }
    }
    walk(btreeAddr)
    out.toSeq
  }

  // ===================================================== dense (fractal-heap) links

  /** Dense group links (spec III.G fractal heap + III.A.2 v2 B-tree):
    * each link message is a managed fractal-heap object; the name-index
    * v2 B-tree (record type 5: hash + heap ID) enumerates them.  The
    * heap's managed space is resolved through the doubling table — a
    * direct root block, or a root indirect block of direct children
    * (one level: width × maxDirectRows blocks ≈ thousands of links;
    * nested indirect blocks raise a descriptive error).  Driver-side
    * only, like all other group metadata. */
  private def denseLinks(r: Reader, fheapAddr: Long, btreeAddr: Long): Seq[(String, Long)] = {
    val heap = new FractalHeap(r, fheapAddr)
    val ids = btree2Records(r, btreeAddr)
    ids.flatMap { rec =>
      // record type 5: name hash u4, then the heap ID
      val id = rec.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
      id.position(id.position() + 4)
      parseLinkMessage(heap.managedObject(id))
    }
  }

  /** Managed-object reader over a fractal heap (spec III.G). */
  private final class FractalHeap(r: Reader, addr: Long) {
    // header is exactly 146 bytes (incl. checksum) — never read past
    // it, a heap header can sit at EOF
    private val hb = r.readAt(addr, 142)
    private val magic = new Array[Byte](4); hb.get(magic)
    require(magic.sameElements("FRHP".getBytes("US-ASCII")),
      s"bad fractal heap signature at $addr")
    require(u1(hb) == 0, "unsupported fractal heap version")
    private val heapIdLen = u2(hb)
    private val filterLen = u2(hb)
    private val flags = u1(hb)
    private val maxManagedSize = u4(hb) // max size of managed objects
    u8(hb); u8(hb) // next huge id, huge v2 btree addr
    u8(hb); u8(hb) // free space, free-space manager addr
    u8(hb); u8(hb) // managed space, allocated managed space
    u8(hb); u8(hb) // direct block iterator offset, n managed objects
    u8(hb); u8(hb); u8(hb); u8(hb) // huge size/count, tiny size/count
    private val tableWidth = u2(hb)
    private val startBlockSize = u8(hb)
    private val maxDirectBlockSize = u8(hb)
    private val maxHeapSizeBits = u2(hb)
    u2(hb) // starting # rows in root indirect block
    private val rootBlockAddr = u8(hb)
    private val rootRows = u2(hb) // 0 -> root is a direct block
    require(filterLen == 0, "filtered fractal heap blocks are not supported")
    private val offSize = (maxHeapSizeBits + 7) / 8
    private val lenSize = bytesFor(maxManagedSize)
    require(heapIdLen == 1 + offSize + lenSize,
      s"fractal heap ID length $heapIdLen != 1+$offSize+$lenSize")

    private def bytesFor(v: Long): Int = {
      var n = 1; var x = v >>> 8
      while (x != 0) { n += 1; x >>>= 8 }
      n
    }
    private def readVar(b: java.nio.ByteBuffer, n: Int): Long = {
      var v = 0L
      (0 until n).foreach(i => v |= (b.get().toLong & 0xff) << (8 * i))
      v
    }

    /** (heapOffset, blockSize, fileAddr) per direct block, offset-sorted. */
    private lazy val directBlocks: Seq[(Long, Long, Long)] = {
      if (rootRows == 0) Seq((0L, startBlockSize, rootBlockAddr))
      else {
        // root indirect block: header + rowsx width child addresses,
        // rows 0-1 at startBlockSize, row n >= 2 at start*2^(n-1)
        val maxDirectRows =
          (63 - java.lang.Long.numberOfLeadingZeros(maxDirectBlockSize)) -
            (63 - java.lang.Long.numberOfLeadingZeros(startBlockSize)) + 2
        require(rootRows <= maxDirectRows,
          s"nested indirect fractal-heap blocks are not supported " +
            s"($rootRows rows > $maxDirectRows direct rows)")
        val hdrLen = 4 + 1 + 8 + offSize
        val ib = r.readAt(rootBlockAddr, hdrLen + rootRows * tableWidth * 8 + 4)
        val m = new Array[Byte](4); ib.get(m)
        require(m.sameElements("FHIB".getBytes("US-ASCII")),
          s"bad fractal heap indirect block at $rootBlockAddr")
        require(u1(ib) == 0, "unsupported FHIB version")
        u8(ib) // heap header address
        readVar(ib, offSize) // block offset
        val out = mutable.ListBuffer.empty[(Long, Long, Long)]
        var off = 0L
        (0 until rootRows).foreach { row =>
          val size = if (row < 2) startBlockSize else startBlockSize << (row - 1)
          (0 until tableWidth).foreach { _ =>
            val child = u8(ib)
            if (child != Undef) out += ((off, size, child))
            off += size
          }
        }
        out.toSeq
      }
    }

    /** Read the managed object a heap ID points at; returns a buffer
      * positioned at the object's first byte. */
    def managedObject(id: java.nio.ByteBuffer): java.nio.ByteBuffer = {
      val vt = u1(id)
      require((vt & 0x30) == 0, s"non-managed fractal heap object type ${(vt >> 4) & 3}")
      val off = readVar(id, offSize)
      val len = readVar(id, lenSize)
      val (blockOff, blockSize, blockAddr) = directBlocks
        .find { case (bo, bs, _) => off >= bo && off < bo + bs }
        .getOrElse(throw new IllegalArgumentException(
          s"fractal heap offset $off outside managed space"))
      require(off - blockOff + len <= blockSize, s"fractal heap object crosses block end")
      val db = r.readAt(blockAddr, (off - blockOff + len).toInt)
      val m = new Array[Byte](4); db.get(m)
      require(m.sameElements("FHDB".getBytes("US-ASCII")),
        s"bad fractal heap direct block at $blockAddr")
      require(u1(db) == 0, "unsupported FHDB version")
      u8(db) // heap header address
      readVar(db, offSize) // block offset
      if ((flags & 0x02) != 0) u4(db) // checksummed blocks
      // the heap offset is FILE-IMAGE absolute within the block: object
      // data begins at blockAddr + (off - blockOff), which already
      // includes the block header bytes in the offset arithmetic
      val data = r.readAt(blockAddr + (off - blockOff), len.toInt)
      data
    }
  }

  /** All records of a v2 B-tree (spec III.A.2), depth <= 1: the header
    * names the root; internal nodes (BTIN) point at leaves (BTLF).
    * Returns each record as a buffer positioned at the record start. */
  private def btree2Records(r: Reader, addr: Long): Seq[java.nio.ByteBuffer] = {
    val hb = r.readAt(addr, 34)
    val magic = new Array[Byte](4); hb.get(magic)
    require(magic.sameElements("BTHD".getBytes("US-ASCII")),
      s"bad v2 B-tree signature at $addr")
    require(u1(hb) == 0, "unsupported v2 B-tree version")
    u1(hb) // record type (5 = link name index)
    val nodeSize = u4(hb)
    val recSize = u2(hb)
    val depth = u2(hb)
    u1(hb); u1(hb) // split / merge percent
    val rootAddr = u8(hb)
    val rootNRec = u2(hb)
    // leaf capacity bounds the per-child record-count field width
    val leafMaxRec = (nodeSize - 10) / recSize
    val nrecSize = { var n = 1; var x = leafMaxRec >>> 8; while (x != 0) { n += 1; x >>>= 8 }; n }
    require(depth <= 1,
      s"v2 B-tree depth $depth not supported (more than ~$leafMaxRec * node links)")

    def leafRecords(a: Long, n: Int): Seq[java.nio.ByteBuffer] = {
      val b = r.readAt(a, 6 + n * recSize)
      val m = new Array[Byte](4); b.get(m)
      require(m.sameElements("BTLF".getBytes("US-ASCII")), s"bad BTLF at $a")
      u1(b); u1(b) // version, type
      (0 until n).map { i =>
        val rec = b.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
        rec.position(6 + i * recSize)
        rec
      }
    }
    if (depth == 0) leafRecords(rootAddr, rootNRec)
    else {
      // BTIN: records, then rootNRec+1 child pointers (addr + nrec)
      val b = r.readAt(rootAddr, 6 + rootNRec * recSize + (rootNRec + 1) * (8 + nrecSize))
      val m = new Array[Byte](4); b.get(m)
      require(m.sameElements("BTIN".getBytes("US-ASCII")), s"bad BTIN at $rootAddr")
      u1(b); u1(b)
      val internalRecs = (0 until rootNRec).map { i =>
        val rec = b.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
        rec.position(6 + i * recSize)
        rec
      }
      b.position(6 + rootNRec * recSize)
      val children = (0 to rootNRec).map { _ =>
        val a = u8(b)
        var n = 0L
        (0 until nrecSize).foreach(i => n |= (b.get().toLong & 0xff) << (8 * i))
        (a, n.toInt)
      }
      // interleave in key order: child0, rec0, child1, rec1, ...
      children.zipWithIndex.flatMap { case ((a, n), i) =>
        leafRecords(a, n) ++ (if (i < rootNRec) Seq(internalRecs(i)) else Nil)
      }
    }
  }

  // ============================================================ public metadata API

  final case class FileMeta(datasets: Seq[DatasetInfo], groups: Seq[GroupInfo])

  /** Driver-side metadata scan: every dataset reachable from the root. */
  def scan(path: String): FileMeta = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val r = new Reader(raf)
      val sb = findSuperblock(r)
      val datasets = mutable.ListBuffer.empty[DatasetInfo]
      val groups = mutable.ListBuffer.empty[GroupInfo]
      val seen = mutable.Set.empty[Long]
      def visit(ohAddr: Long, p: String): Unit = {
        if (!seen.add(ohAddr)) return
        val msgs = readObjectHeader(r, ohAddr)
        val hasLayout = msgs.exists(_.typ == 0x0008)
        if (hasLayout) {
          val dims = msgs.find(_.typ == 0x0001).map(m => parseDataspace(m.body))
            .getOrElse(throw new IllegalArgumentException(s"dataset $p: no dataspace"))
          val dtype = msgs.find(_.typ == 0x0003).map(m => parseDatatype(m.body))
            .getOrElse(throw new IllegalArgumentException(s"dataset $p: no datatype"))
          val filters = msgs.find(_.typ == 0x000B).map(m => parseFilters(m.body)).getOrElse(Nil)
          val layoutMsg = msgs.find(_.typ == 0x0008).get.body
          val layout = parseLayout(r, layoutMsg, dims.length, dtype.size, filters)
          datasets += DatasetInfo(p, dtype, dims, layout)
        } else {
          val links = childLinks(r, msgs)
          groups += GroupInfo(p, links)
          links.foreach { case (name, addr) =>
            visit(sb.base + addr, if (p == "/") s"/$name" else s"$p/$name")
          }
        }
      }
      visit(sb.rootOH, "/")
      // superblock v0 root carries its symbol table in the root STE; the
      // object header's own message usually repeats it, but cover both
      if (sb.rootBtree != Undef && groups.forall(_.path != "/")) {
        val links = ListMap(symbolTableLinks(r, sb.rootBtree, sb.rootHeap): _*)
        groups += GroupInfo("/", links)
        links.foreach { case (name, addr) => visit(sb.base + addr, s"/$name") }
      }
      FileMeta(datasets.toSeq, groups.toSeq)
    } finally raf.close()
  }

  private def parseLayout(r: Reader, b: java.nio.ByteBuffer, rank: Int,
                          elemSize: Int, filters: Seq[Filter]): Layout = {
    val ver = u1(b)
    ver match {
      case 1 | 2 =>
        val dimensionality = u1(b)
        val clazz = u1(b)
        u1(b); u4(b) // reserved
        clazz match {
          case 0 => // compact
            (0 until dimensionality).foreach(_ => u4(b))
            val sz = u4(b).toInt
            val data = new Array[Byte](sz); b.get(data)
            Compact(data)
          case 1 =>
            val addr = u8(b)
            val dims = (0 until dimensionality).map(_ => u4(b))
            Contiguous(addr, dims.product * elemSize)
          case 2 =>
            val addr = u8(b)
            val dims = (0 until dimensionality).map(_ => u4(b))
            // v1/v2 chunked dims include the element size as last dim
            val chunkDims = dims.dropRight(1)
            Chunked(chunkDims, readChunkBtree(r, addr, chunkDims.length, elemSize), filters)
        }
      case 3 =>
        val clazz = u1(b)
        clazz match {
          case 0 =>
            val sz = u2(b)
            val data = new Array[Byte](sz); b.get(data)
            Compact(data)
          case 1 =>
            val addr = u8(b); val size = u8(b)
            Contiguous(addr, size)
          case 2 =>
            val dimensionality = u1(b)
            val addr = u8(b)
            val dims = (0 until dimensionality).map(_ => u4(b))
            val chunkDims = dims.dropRight(1)
            Chunked(chunkDims, readChunkBtree(r, addr, chunkDims.length, elemSize), filters)
          case c => throw new IllegalArgumentException(s"layout class $c")
        }
      case v => throw new IllegalArgumentException(s"data layout message v$v")
    }
  }

  // ============================================================ filters

  private[sources] def defilter(data: Array[Byte], filters: Seq[Filter],
                                elemSize: Int): Array[Byte] = {
    // filters are applied in reverse order on read
    filters.reverse.foldLeft(data) { (d, f) =>
      f.id match {
        case 1 => // deflate
          val inf = new java.util.zip.Inflater()
          inf.setInput(d)
          val out = new java.io.ByteArrayOutputStream(d.length * 4)
          val buf = new Array[Byte](65536)
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && inf.needsInput()) throw new IllegalArgumentException("truncated deflate chunk")
            out.write(buf, 0, n)
          }
          inf.end()
          out.toByteArray
        case 2 => // shuffle: de-interleave byte planes
          val sz = if (f.clientData.nonEmpty) f.clientData.head else elemSize
          if (sz <= 1) d
          else {
            val n = d.length / sz
            val out = new Array[Byte](d.length)
            var i = 0
            while (i < sz) {
              var j = 0
              while (j < n) { out(j * sz + i) = d(i * n + j); j += 1 }
              i += 1
            }
            // trailing bytes (length not divisible) copied as-is
            System.arraycopy(d, n * sz, out, n * sz, d.length - n * sz)
            out
          }
        case 3 => d.dropRight(4) // fletcher32: strip checksum (not verified)
        case id => throw new IllegalArgumentException(s"unsupported HDF5 filter $id")
      }
    }
  }

  // ============================================================ value decoding

  /** Global-heap object resolver (HDF5 spec III.E): GCOL collections of
    * 8-byte-aligned objects, loaded lazily and cached per collection
    * address.  One instance per open file handle (executor task or
    * driver-side compact decode). */
  private final class GlobalHeap(raf: java.io.RandomAccessFile) {
    private val cache = mutable.Map.empty[Long, Map[Int, Array[Byte]]]
    def get(addr: Long, idx: Int): Array[Byte] =
      cache.getOrElseUpdate(addr, load(addr)).getOrElse(idx,
        throw new IllegalArgumentException(
          s"no object $idx in global heap collection at $addr"))
    private def load(addr: Long): Map[Int, Array[Byte]] = {
      val hdr = new Array[Byte](16)
      raf.seek(addr); raf.readFully(hdr)
      val hb = java.nio.ByteBuffer.wrap(hdr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](4); hb.get(magic)
      require(magic.sameElements("GCOL".getBytes("US-ASCII")),
        s"bad global heap collection signature at $addr")
      require(u1(hb) == 1, s"unsupported global heap version at $addr")
      hb.get(new Array[Byte](3)) // reserved
      val collSize = u8(hb) // includes the 16-byte header
      // corrupt/hostile sizes must fail as the clean IllegalArgument
      // the rest of the parser throws, not NegativeArraySizeException
      // or a truncated-Int multi-GB allocation
      require(collSize >= 16 && collSize - 16 <= Int.MaxValue,
        s"bad global heap collection size $collSize at $addr")
      val body = new Array[Byte]((collSize - 16).toInt)
      raf.readFully(body)
      val bb = java.nio.ByteBuffer.wrap(body).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = mutable.Map.empty[Int, Array[Byte]]
      var done = false
      while (!done && bb.remaining >= 16) {
        val idx = u2(bb); u2(bb); u4(bb) // index, ref count, reserved
        val objSize = u8(bb)
        if (idx == 0) done = true // object 0 = free space, terminates
        else {
          require(objSize >= 0 && objSize <= bb.remaining,
            s"bad global heap object size $objSize (index $idx) at $addr")
          val data = new Array[Byte](objSize.toInt)
          bb.get(data)
          bb.position(bb.position() + ((8 - (objSize % 8)) % 8).toInt)
          out(idx) = data
        }
      }
      out.toMap
    }
  }

  private def decodeScalar(bb: java.nio.ByteBuffer, at: Int, dt: Dtype,
                           heap: GlobalHeap = null): Any = dt match {
    case FixedPoint(sz, signed, le) =>
      val order = if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN
      val b = bb.duplicate().order(order)
      sz match {
        case 1 => if (signed) b.get(at) else (b.get(at) & 0xff).toShort
        case 2 => if (signed) b.getShort(at) else (b.getShort(at) & 0xffff).toInt
        case 4 => if (signed) b.getInt(at) else b.getInt(at).toLong & 0xffffffffL
        case 8 => b.getLong(at)
      }
    case FloatPoint(sz, le) =>
      val order = if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN
      val b = bb.duplicate().order(order)
      if (sz == 4) b.getFloat(at) else b.getDouble(at)
    case FixedString(sz) =>
      val bytes = new Array[Byte](sz)
      val b = bb.duplicate(); b.position(at); b.get(bytes)
      val end = bytes.indexOf(0.toByte)
      new String(bytes, 0, if (end >= 0) end else sz, "UTF-8")
    case VlenString(_) =>
      val b = bb.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val len = b.getInt(at)
      val collAddr = b.getLong(at + 4)
      val objIdx = b.getInt(at + 12)
      if (collAddr == 0L || collAddr == Undef || objIdx == 0) ""
      else {
        require(heap != null, "vlen string decode requires a global heap reader")
        val data = heap.get(collAddr, objIdx)
        new String(data, 0, math.min(len, data.length), "UTF-8")
      }
    case EnumOf(base, mapping) =>
      val code = decodeScalar(bb, at, base, heap).asInstanceOf[Number].longValue()
      mapping.get(code).orNull
    case ArrayOf(base, dims) =>
      val n = dims.product
      (0 until n).map(i => decodeScalar(bb, at + i * base.size, base, heap))
    case Compound(members, _) =>
      Row(members.map(m => decodeScalar(bb, at + m.offset, m.dtype, heap)): _*)
  }

  private def decodeRows(data: Array[Byte], dt: Compound, from: Int, n: Int,
                         heap: GlobalHeap = null): Iterator[Row] = {
    val bb = java.nio.ByteBuffer.wrap(data)
    (from until (from + n)).iterator.map { i =>
      decodeScalar(bb, i * dt.size, dt, heap).asInstanceOf[Row]
    }
  }

  // ============================================================ Spark read

  /** Read an HDF5 table distributed.
    *
    * `key` selects the dataset/group: null → auto-detect (first compound
    * dataset, else the columnar group — `/table/columns` vaex layout or
    * a root full of equal-length 1-D datasets).
    */
  def read(spark: SparkSession, path: String, key: String = null,
           partitions: Int = 0): EzFrame = {
    val meta = scan(path)
    val chosen: Either[DatasetInfo, Seq[DatasetInfo]] = {
      def isCols(g: GroupInfo): Option[Seq[DatasetInfo]] = {
        // vaex layout: each child group holds a "data" dataset
        val viaGroups = g.children.keys.toSeq.flatMap { name =>
          meta.datasets.find(_.path == s"${if (g.path == "/") "" else g.path}/$name/data")
            .map(d => d.copy(path = name))
        }
        val direct = g.children.keys.toSeq.flatMap { name =>
          meta.datasets.find(_.path == s"${if (g.path == "/") "" else g.path}/$name")
            .map(d => d.copy(path = name))
        }
        val cols = if (viaGroups.nonEmpty) viaGroups else direct
        if (cols.size >= 1 && cols.forall(c => c.dims.nonEmpty && !c.dtype.isInstanceOf[Compound])
          && cols.map(_.nRows).distinct.size == 1) Some(cols)
        else None
      }
      if (key != null) {
        meta.datasets.find(_.path == key) match {
          case Some(d) if d.dtype.isInstanceOf[Compound] => Left(d)
          case Some(d) => // plain dataset: a one-column table
            Right(Seq(d.copy(path = d.path.split('/').last)))
          case None =>
            val g = meta.groups.find(_.path == key)
              .getOrElse(throw new IllegalArgumentException(
                s"no dataset or group '$key' in $path " +
                  s"(datasets: ${meta.datasets.map(_.path).mkString(", ")})"))
            Right(isCols(g).getOrElse(throw new IllegalArgumentException(
              s"group '$key' is not a columnar table")))
        }
      } else {
        meta.datasets.find(_.dtype.isInstanceOf[Compound]) match {
          case Some(d) => Left(d)
          case None =>
            meta.groups.sortBy(g => if (g.path.endsWith("/columns")) 0 else 1)
              .flatMap(isCols)
              .headOption
              .getOrElse(throw new IllegalArgumentException(
                s"no table found in $path (datasets: ${meta.datasets.map(_.path).mkString(", ")})"))
              match { case cols => Right(cols) }
        }
      }
    }
    chosen match {
      case Left(d) => readCompound(spark, path, d, partitions)
      case Right(cols) => readColumnar(spark, path, cols, partitions)
    }
  }

  /** Partition count sized by BYTES, not a fixed cap: ~128 MiB of raw
    * rows per task, so a 1.4 B-row × 100-byte compound splits into
    * ~1100 partitions instead of 64 × 2 GiB buffers (which would
    * overflow the per-partition Int allocation below). */
  private def defaultParts(nRows: Long, rowBytes: Long, partitions: Int): Int = {
    if (partitions > 0) partitions
    else {
      val target = 128L << 20
      val byBytes = (nRows * rowBytes + target - 1) / target
      math.max(1L, math.min(byBytes, 1 << 20)).toInt
    }
  }

  private def readCompound(spark: SparkSession, path: String, d: DatasetInfo,
                           partitions: Int): EzFrame = {
    val dt = d.dtype.asInstanceOf[Compound]
    val schema = dt.sparkType.asInstanceOf[StructType]
    val nRows = d.nRows
    val rowSize = dt.size
    val rowsRdd = d.layout match {
      case Contiguous(addr, _) =>
        val nParts = defaultParts(nRows, rowSize.toLong, partitions)
        spark.sparkContext.range(0L, nRows, 1L, nParts).mapPartitions { it =>
          val idx = it.toArray
          if (idx.isEmpty) Iterator.empty
          else {
            val bytes = idx.length.toLong * rowSize
            require(bytes <= Int.MaxValue,
              s"partition spans $bytes bytes (> 2 GiB); pass a larger `partitions`")
            val raf = new java.io.RandomAccessFile(path, "r")
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
            // one sequential read for the partition's contiguous range
            val data = new Array[Byte](bytes.toInt)
            raf.seek(addr + idx.head * rowSize)
            raf.readFully(data)
            decodeRows(data, dt, 0, idx.length, new GlobalHeap(raf))
          }
        }
      case Compact(data) =>
        // compact data is tiny and lives in the object header, but its
        // vlen strings still reference the file's global heap — decode
        // driver-side with a short-lived handle
        val raf = new java.io.RandomAccessFile(path, "r")
        val rows = try decodeRows(data, dt, 0, nRows.toInt, new GlobalHeap(raf)).toSeq
          finally raf.close()
        spark.sparkContext.parallelize(rows, 1)
      case Chunked(chunkDims, chunks, filters) =>
        require(chunkDims.length == 1, s"compound dataset rank ${chunkDims.length}")
        val chunkList = chunks.toArray
        val nParts = math.max(1,
          math.min(chunkList.length, defaultParts(nRows, rowSize.toLong, partitions)))
        spark.sparkContext.parallelize(chunkList.toSeq, nParts).flatMap { ch =>
          val raf = new java.io.RandomAccessFile(path, "r")
          try {
            val raw = new Array[Byte](ch.size.toInt)
            raf.seek(ch.addr); raf.readFully(raw)
            val data = defilter(raw, filters, rowSize)
            // last chunk may overhang the dataset extent
            val have = data.length / rowSize
            val valid = math.min(have.toLong, nRows - ch.offsets.head).toInt
            decodeRows(data, dt, 0, valid, new GlobalHeap(raf)).toVector
          } finally raf.close()
        }
    }
    EzFrame(spark.createDataFrame(rowsRdd.map(identity), schema), EzMeta())
  }

  private def readColumnar(spark: SparkSession, path: String, cols: Seq[DatasetInfo],
                           partitions: Int): EzFrame = {
    val nRows = cols.head.nRows
    val schema = StructType(cols.map { c =>
      val t = c.dtype.sparkType
      // a 2-D columnar dataset (n, m) is an array column of width m
      // (nullable elements when the dtype is an enum — unknown codes
      // decode to null)
      val full =
        if (c.dims.length > 1) ArrayType(t, containsNull = c.dtype.isInstanceOf[EnumOf])
        else t
      StructField(c.path, full)
    })
    val tableRowBytes = cols.map { c =>
      val w = if (c.dims.length > 1) c.dims.drop(1).product else 1L
      w * c.dtype.size
    }.sum
    val nParts = defaultParts(nRows, math.max(1L, tableRowBytes), partitions)
    val colsB = spark.sparkContext.broadcast(cols.toArray)
    val rowsRdd = spark.sparkContext.range(0L, nRows, 1L, nParts).mapPartitions { it =>
      val idx = it.toArray
      if (idx.isEmpty) Iterator.empty
      else {
        val raf = new java.io.RandomAccessFile(path, "r")
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
        val heap = new GlobalHeap(raf)
        val lo = idx.head
        val n = idx.length
        val columns: Array[Array[Any]] = colsB.value.map { c =>
          readColumnRange(raf, heap, c, lo, n)
        }
        (0 until n).iterator.map(i => Row(columns.map(_(i)).toIndexedSeq: _*))
      }
    }
    EzFrame(spark.createDataFrame(rowsRdd.map(identity), schema), EzMeta())
  }

  /** Read rows [lo, lo+n) of a 1-D (or 2-D row-major) non-compound dataset. */
  private def readColumnRange(raf: java.io.RandomAccessFile, heap: GlobalHeap,
                              c: DatasetInfo, lo: Long, n: Int): Array[Any] = {
    val rowWidth = if (c.dims.length > 1) c.dims.drop(1).product.toInt else 1
    val elemSize = c.dtype.size
    val rowBytes = rowWidth * elemSize
    def decode(data: Array[Byte], count: Int): Array[Any] = {
      val bb = java.nio.ByteBuffer.wrap(data)
      Array.tabulate[Any](count) { i =>
        if (rowWidth == 1) decodeScalar(bb, i * elemSize, c.dtype, heap)
        else (0 until rowWidth).map(j => decodeScalar(bb, (i * rowWidth + j) * elemSize, c.dtype, heap))
      }
    }
    c.layout match {
      case Contiguous(addr, _) =>
        val bytes = n.toLong * rowBytes
        require(bytes <= Int.MaxValue,
          s"column range spans $bytes bytes (> 2 GiB); pass a larger `partitions`")
        val data = new Array[Byte](bytes.toInt)
        raf.seek(addr + lo * rowBytes)
        raf.readFully(data)
        decode(data, n)
      case Compact(data) =>
        decode(data.slice((lo * rowBytes).toInt, ((lo + n) * rowBytes).toInt), n)
      case Chunked(chunkDims, chunks, filters) =>
        val chunkRows = chunkDims.head
        val out = new Array[Any](n)
        chunks.foreach { ch =>
          val c0 = ch.offsets.head
          val c1 = c0 + chunkRows
          if (c1 > lo && c0 < lo + n) {
            val raw = new Array[Byte](ch.size.toInt)
            raf.seek(ch.addr); raf.readFully(raw)
            val data = defilter(raw, filters, elemSize)
            val from = math.max(lo, c0)
            val until = math.min(lo + n, c1)
            val bb = java.nio.ByteBuffer.wrap(data)
            var r = from
            while (r < until) {
              val inChunk = (r - c0).toInt
              out((r - lo).toInt) =
                if (rowWidth == 1) decodeScalar(bb, inChunk * elemSize, c.dtype, heap)
                else (0 until rowWidth).map(j => decodeScalar(bb, (inChunk * rowWidth + j) * elemSize, c.dtype, heap))
              r += 1
            }
          }
        }
        out
    }
  }
}
