package graft.functions

/** FLAC (Free Lossless Audio Codec) — pure-JVM decode + fixture-grade
  * encode, written to the public spec (RFC 9639 / xiph.org format
  * docs).  No native codec, no external library: the container walk
  * is byte math, frames are bit-packed fixed/LPC predictors with
  * Rice-coded residuals, and everything fits an executor-side
  * per-row call (working memory is one frame — ≤ 65535 samples ×
  * channels — never the whole stream).
  *
  * Reference behavior anchor: ezdata treats audio as an opaque
  * payload column; this codec backs the engine's decodable tier
  * (Multimodal.decodeMedia / audioEmbedding) so FLAC payloads join
  * WAV/G.711 as REAL audio arms rather than stub seam residents
  * (reference: ezdata has no media decoding — this extends the
  * LLM-pipeline surface, SURVEY.md multimodal rows).
  *
  * Decoder coverage: metadata block walk (STREAMINFO + skip-others),
  * both blocking strategies, all block-size/sample-rate/sample-size
  * header codes, UTF-8-coded frame/sample numbers, subframe types
  * CONSTANT / VERBATIM / FIXED(0–4) / LPC(1–32), wasted bits, Rice
  * residual methods 4-bit and 5-bit with escape-to-raw partitions,
  * and the four channel assignments (independent, left-side,
  * right-side, mid-side).  CRC-8 of each frame header and CRC-16 of
  * each whole frame are verified — a corrupt stream returns None,
  * never garbage samples.
  *
  * Encoder (fixture tier): real, spec-valid streams — STREAMINFO +
  * fixed-blocksize frames, per-channel CONSTANT / FIXED(0–2, Rice) /
  * VERBATIM selection by estimated cost, stereo frames cycling
  * independent → left-side → right-side → mid-side so a round-trip
  * test exercises every decorrelation path the decoder has.  Output
  * opens in any external FLAC tool (CRCs are real).
  */
object Flac {

  // ---------------------------------------------------------------- bits

  /** MSB-first bit reader over a byte array.  Running off the end
    * throws ArrayIndexOutOfBoundsException, which the public decode
    * entry points catch into None — a truncated payload is a parse
    * failure, not an engine crash. */
  private final class BitReader(b: Array[Byte]) {
    var bytePos = 0
    private var bitPos = 0
    def atEnd: Boolean = bytePos >= b.length
    def byteAligned: Boolean = bitPos == 0
    def readBit(): Int = {
      val bit = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      bit
    }
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long =
      if (n == 0) 0L else { val v = readBits(n); (v << (64 - n)) >> (64 - n) }
    def readUnary(): Int = { var n = 0; while (readBit() == 0) n += 1; n }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** MSB-first bit writer; the buffer is inspectable at byte
    * boundaries (used to CRC the byte-aligned frame header). */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBit(bit: Int): Unit = {
      cur = (cur << 1) | (bit & 1); nbits += 1
      if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1).toInt); i -= 1 }
    }
    def writeSigned(v: Long, n: Int): Unit = writeBits(v & ((1L << n) - 1), n)
    def align(): Unit = while (nbits != 0) writeBit(0)
    def bytes: Array[Byte] = { require(nbits == 0, "unaligned"); buf.toByteArray }
    def size: Int = buf.size()
  }

  // ---------------------------------------------------------------- crc

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC. */
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0; var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — the frame CRC. */
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0; var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---------------------------------------------------------------- decode

  /** STREAMINFO contents the decoder needs. */
  private final case class StreamInfo(sampleRate: Int, channels: Int,
                                      bps: Int, totalSamples: Long)

  /** Parse "fLaC" magic + metadata blocks; returns the stream info and
    * the byte offset of the first frame. */
  private def readStreamInfo(b: Array[Byte]): Option[(StreamInfo, Int)] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
    var pos = 4
    var info: Option[StreamInfo] = None
    var last = false
    while (!last) {
      if (pos + 4 > b.length) return None
      last = (b(pos) & 0x80) != 0
      val typ = b(pos) & 0x7f
      val len = ((b(pos + 1) & 0xff) << 16) | ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      pos += 4
      if (pos + len > b.length) return None
      if (typ == 0) { // STREAMINFO: fixed 34-byte layout
        if (len < 34) return None
        val r = new BitReader(java.util.Arrays.copyOfRange(b, pos, pos + 34))
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        val rate = r.readBits(20).toInt
        val channels = r.readBits(3).toInt + 1
        val bps = r.readBits(5).toInt + 1
        val total = r.readBits(36)
        info = Some(StreamInfo(rate, channels, bps, total))
      }
      pos += len
    }
    info.map(i => (i, pos))
  }

  /** Decode one frame starting at `r`'s position; emits interleaved
    * raw (integer) samples via `emit(sample, bps)` and returns the
    * frame's (blockSize, channels).  Throws on malformed data (caught
    * by the public entries). */
  private def decodeFrame(b: Array[Byte], r: BitReader, si: StreamInfo)
                         (emit: (Long, Int) => Unit): Unit = {
    val frameStart = r.bytePos
    val sync = r.readBits(14)
    require(sync == 0x3ffe, "bad sync")
    r.readBit() // reserved
    r.readBit() // blocking strategy (affects only number semantics)
    val bsCode = r.readBits(4).toInt
    val srCode = r.readBits(4).toInt
    val chCode = r.readBits(4).toInt
    val ssCode = r.readBits(3).toInt
    require(r.readBit() == 0, "reserved bit")
    readUtf8Number(r) // frame/sample number (position info — unused here)
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("reserved block size")
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match { // value only cross-checked against STREAMINFO rates
      case 0 => ()
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case 15 => throw new IllegalArgumentException("invalid sample rate code")
      case _ => ()
    }
    val channels = if (chCode < 8) chCode + 1 else 2
    require(chCode <= 10, "reserved channel assignment")
    val bps = ssCode match {
      case 0 => si.bps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => throw new IllegalArgumentException("reserved sample size")
    }
    // the header is byte-aligned here; verify its CRC-8
    require(r.byteAligned, "header alignment")
    val expect8 = crc8(b, frameStart, r.bytePos)
    require(r.readBits(8).toInt == expect8, "frame header CRC-8 mismatch")

    val chans = new Array[Array[Long]](channels)
    var ch = 0
    while (ch < channels) {
      // side channels carry one extra bit of range
      val extra = chCode match {
        case 8 => if (ch == 1) 1 else 0  // left-side: ch1 = side
        case 9 => if (ch == 0) 1 else 0  // right-side: ch0 = side
        case 10 => if (ch == 1) 1 else 0 // mid-side: ch1 = side
        case _ => 0
      }
      chans(ch) = decodeSubframe(r, blockSize, bps + extra)
      ch += 1
    }
    // undo inter-channel decorrelation
    chCode match {
      case 8 => // left-side: right = left - side
        var i = 0; while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // right-side: left = right + side
        var i = 0
        while (i < blockSize) {
          val side = chans(0)(i); chans(0)(i) = chans(1)(i) + side; i += 1
        }
      case 10 => // mid-side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          val mid2 = (chans(0)(i) << 1) | (side & 1L)
          chans(0)(i) = (mid2 + side) >> 1
          chans(1)(i) = (mid2 - side) >> 1
          i += 1
        }
      case _ => ()
    }
    r.align()
    val expect16 = crc16(b, frameStart, r.bytePos)
    require(r.readBits(16).toInt == expect16, "frame CRC-16 mismatch")
    var i = 0
    while (i < blockSize) {
      var c = 0
      while (c < channels) { emit(chans(c)(i), bps); c += 1 }
      i += 1
    }
  }

  /** UTF-8-style variable-length number (extended to 36 bits). */
  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var n = 0; var mask = 0x40
      while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
      require(n >= 1 && n <= 6, "bad UTF-8 prefix")
      var v = (b0 & (mask - 1)).toLong
      var i = 0
      while (i < n) {
        val cont = r.readBits(8).toInt
        require((cont & 0xc0) == 0x80, "bad UTF-8 continuation")
        v = (v << 6) | (cont & 0x3f); i += 1
      }
      v
    }
  }

  private def decodeSubframe(r: BitReader, bs: Int, bps: Int): Array[Long] = {
    require(r.readBit() == 0, "subframe padding bit")
    val typ = r.readBits(6).toInt
    val wasted = if (r.readBit() == 1) r.readUnary() + 1 else 0
    val eb = bps - wasted
    require(eb >= 1 && eb <= 33, "effective bits out of range")
    val out = new Array[Long](bs)
    if (typ == 0) { // CONSTANT
      val v = r.readSigned(eb)
      java.util.Arrays.fill(out, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0; while (i < bs) { out(i) = r.readSigned(eb); i += 1 }
    } else if (typ >= 8 && typ <= 12) { // FIXED, order 0-4
      val order = typ - 8
      var i = 0
      while (i < order) { out(i) = r.readSigned(eb); i += 1 }
      val res = decodeResidual(r, bs, order)
      i = order
      while (i < bs) {
        out(i) = order match {
          case 0 => res(i - order)
          case 1 => res(i - order) + out(i - 1)
          case 2 => res(i - order) + 2 * out(i - 1) - out(i - 2)
          case 3 => res(i - order) + 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
          case 4 => res(i - order) + 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) - out(i - 4)
        }
        i += 1
      }
    } else if ((typ & 0x20) != 0) { // LPC, order 1-32
      val order = (typ & 0x1f) + 1
      var i = 0
      while (i < order) { out(i) = r.readSigned(eb); i += 1 }
      val precision = r.readBits(4).toInt + 1
      require(precision <= 15, "invalid LPC precision")
      val shift = r.readSigned(5).toInt
      require(shift >= 0, "negative LPC shift")
      val coefs = new Array[Long](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
      val res = decodeResidual(r, bs, order)
      i = order
      while (i < bs) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) = res(i - order) + (acc >> shift)
        i += 1
      }
    } else throw new IllegalArgumentException(s"reserved subframe type $typ")
    if (wasted > 0) { var i = 0; while (i < bs) { out(i) <<= wasted; i += 1 } }
    out
  }

  private def decodeResidual(r: BitReader, bs: Int, order: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    require(method <= 1, "reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val pOrder = r.readBits(4).toInt
    val nPart = 1 << pOrder
    require(bs % nPart == 0 && (bs >> pOrder) > order, "bad partition order")
    val res = new Array[Long](bs - order)
    var at = 0
    var p = 0
    while (p < nPart) {
      val count = (bs >> pOrder) - (if (p == 0) order else 0)
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) { res(at) = r.readSigned(raw); at += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val folded = (q << param) | r.readBits(param)
          res(at) = (folded >>> 1) ^ -(folded & 1L) // zigzag unfold
          at += 1; i += 1
        }
      }
      p += 1
    }
    res
  }

  /** Streams every decoded sample (interleaved, normalized to
    * [-1, 1) by 2^(bps-1)) to `f`; Some(streaminfo-derived meta seed)
    * when the payload is a well-formed FLAC stream decoded to the end
    * with all CRCs good, None otherwise. */
  private[graft] def foreachSample(b: Array[Byte])(f: Double => Unit): Option[StreamInfoMeta] =
    try {
      readStreamInfo(b).flatMap { case (si, firstFrame) =>
        val r = new BitReader(b)
        r.bytePos = firstFrame
        var n = 0L
        val div = (1L << (si.bps - 1)).toDouble
        // total-work cap: CONSTANT subframes amplify ~4096:1 (65535
        // samples from an ~18-byte frame), so an adversarial stream
        // could force billions of emits before the end-of-stream
        // totalSamples check — bound by the DECLARED length (plus one
        // frame of slack) or, when undeclared, a 2^26 ceiling (the
        // image decoders' pixel-cap analogue)
        val maxEmits =
          if (si.totalSamples > 0) si.totalSamples * si.channels + 65536L
          else (1L << 26)
        while (!r.atEnd) {
          decodeFrame(b, r, si) { (s, _) => f(s / div); n += 1 }
          if (n > maxEmits)
            throw new IllegalArgumentException(s"FLAC stream emits past its declared length ($n > $maxEmits)")
        }
        // a stream whose STREAMINFO declares a length must deliver it —
        // a truncation that happens to land on a frame boundary (or
        // right after the metadata) is corruption, not a short stream
        if (si.totalSamples > 0 && n / si.channels != si.totalSamples) None
        else Some(StreamInfoMeta(si.channels, si.sampleRate, si.bps, n / si.channels))
      }
    } catch { case _: Exception => None }

  private[graft] final case class StreamInfoMeta(channels: Int, sampleRate: Int,
                                                 bps: Int, nSamples: Long)

  /** FLAC arm of [[MediaCodecs.parseWav]]'s contract: container
    * metadata + RMS/peak of the decoded normalized signal.  None when
    * the bytes are not a fully-decodable FLAC stream. */
  def parseFlac(b: Array[Byte]): Option[MediaCodecs.WavMeta] = {
    var sumSq = 0.0; var peak = 0.0; var n = 0L
    foreachSample(b) { s =>
      sumSq += s * s
      val a = math.abs(s); if (a > peak) peak = a
      n += 1
    }.map { m =>
      val rms = if (n > 0) math.sqrt(sumSq / n) else 0.0
      val dur = if (m.sampleRate > 0) m.nSamples.toDouble / m.sampleRate else 0.0
      MediaCodecs.WavMeta(m.channels, m.sampleRate, m.bps, m.nSamples, dur, rms, peak)
    }
  }

  /** Full PCM decode for tests: (channels, sampleRate, interleaved raw
    * integer samples).  Bounded use only — materializes the stream. */
  private[graft] def decodePcm(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    var meta: Option[StreamInfoMeta] = None
    try {
      meta = readStreamInfo(b).flatMap { case (si, firstFrame) =>
        val r = new BitReader(b)
        r.bytePos = firstFrame
        while (!r.atEnd) decodeFrame(b, r, si) { (s, _) => buf += s.toInt }
        val frames = buf.length.toLong / si.channels
        if (si.totalSamples > 0 && frames != si.totalSamples) None
        else Some(StreamInfoMeta(si.channels, si.sampleRate, si.bps, frames))
      }
    } catch { case _: Exception => return None }
    meta.map(m => (m.channels, m.sampleRate, buf.toArray))
  }

  // ---------------------------------------------------------------- encode

  /** Spec-valid FLAC stream from interleaved PCM16.  Fixed blocksize
    * strategy; per-channel subframe selection CONSTANT → best
    * FIXED(0–2) with single-partition Rice → VERBATIM (whichever
    * estimates cheapest, or always VERBATIM under `forceVerbatim`);
    * stereo frames cycle the four channel assignments so one stream
    * exercises every decorrelation path. */
  private[graft] def encodeFlac(pcm: Array[Short], channels: Int, sampleRate: Int,
                                blockSize: Int = 256,
                                forceVerbatim: Boolean = false): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "channels in [1,8]")
    require(sampleRate >= 1 && sampleRate <= 65535,
      "encoder writes the 16-bit-Hz rate code — rate in [1, 65535]")
    require(pcm.length % channels == 0, "partial interleave frame")
    require(blockSize >= 16 && blockSize <= 65535, "blockSize in [16, 65535]")
    val totalSamples = pcm.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO, last metadata block
    val siw = new BitWriter
    siw.writeBits(0x80L, 8) // last=1, type=0
    siw.writeBits(34, 24)
    siw.writeBits(blockSize.toLong, 16); siw.writeBits(blockSize.toLong, 16)
    siw.writeBits(0, 24); siw.writeBits(0, 24) // frame sizes unknown
    siw.writeBits(sampleRate.toLong, 20)
    siw.writeBits((channels - 1).toLong, 3)
    siw.writeBits(15L, 5) // bps - 1 = 15
    siw.writeBits(totalSamples.toLong, 36)
    var k = 0
    while (k < 16) { siw.writeBits(0, 8); k += 1 } // md5 unknown
    out.write(siw.bytes)

    var frameNo = 0L
    var start = 0
    while (start < totalSamples) {
      val bs = math.min(blockSize, totalSamples - start)
      val mode = if (channels == 2) (frameNo % 4).toInt else 0
      val chCode = mode match {
        case 1 => 8 // left-side
        case 2 => 9 // right-side
        case 3 => 10 // mid-side
        case _ => channels - 1
      }
      val w = new BitWriter
      w.writeBits(0x3ffe, 14) // sync
      w.writeBit(0) // reserved
      w.writeBit(0) // fixed blocksize strategy
      w.writeBits(7, 4) // block size: 16-bit value follows
      w.writeBits(13, 4) // sample rate: 16-bit Hz follows
      w.writeBits(chCode.toLong, 4)
      w.writeBits(4, 3) // sample size: 16 bits
      w.writeBit(0) // reserved
      writeUtf8Number(w, frameNo)
      w.writeBits((bs - 1).toLong, 16)
      w.writeBits(sampleRate.toLong, 16)
      val headerBytes = w.bytes // byte-aligned here by construction
      w.writeBits(crc8(headerBytes, 0, headerBytes.length).toLong, 8)

      // channel data after decorrelation
      val chans: Array[(Array[Long], Int)] = mode match {
        case 0 =>
          (0 until channels).map { c =>
            val a = new Array[Long](bs)
            var i = 0; while (i < bs) { a(i) = pcm((start + i) * channels + c).toLong; i += 1 }
            (a, 16)
          }.toArray
        case m =>
          val l = new Array[Long](bs); val r = new Array[Long](bs)
          var i = 0
          while (i < bs) {
            l(i) = pcm((start + i) * 2).toLong; r(i) = pcm((start + i) * 2 + 1).toLong
            i += 1
          }
          val side = new Array[Long](bs)
          i = 0; while (i < bs) { side(i) = l(i) - r(i); i += 1 }
          m match {
            case 1 => Array((l, 16), (side, 17))
            case 2 => Array((side, 17), (r, 16))
            case _ =>
              val mid = new Array[Long](bs)
              i = 0; while (i < bs) { mid(i) = (l(i) + r(i)) >> 1; i += 1 }
              Array((mid, 16), (side, 17))
          }
      }
      chans.foreach { case (data, bps) => writeSubframe(w, data, bps, forceVerbatim) }
      w.align()
      val frameBytes = w.bytes
      val fullCrc = crc16(frameBytes, 0, frameBytes.length)
      out.write(frameBytes)
      out.write((fullCrc >> 8) & 0xff); out.write(fullCrc & 0xff)
      frameNo += 1
      start += bs
    }
    out.toByteArray
  }

  private def writeUtf8Number(w: BitWriter, v: Long): Unit =
    if (v < 0x80) w.writeBits(v, 8)
    else {
      // count of payload bits decides the prefix length
      var nBytes = 2
      while (nBytes < 7 && v >= (1L << (nBytes * 5 + 1))) nBytes += 1
      val contBits = (nBytes - 1) * 6
      var prefix = 0L
      var i = 0
      while (i < nBytes) { prefix = (prefix << 1) | 1; i += 1 }
      // nBytes leading 1s, a 0, then the top 7-nBytes payload bits
      w.writeBits((prefix << (8 - nBytes)) | (v >> contBits), 8)
      var shift = contBits - 6
      while (shift >= 0) {
        w.writeBits(0x80L | ((v >> shift) & 0x3f), 8)
        shift -= 6
      }
    }

  private def writeSubframe(w: BitWriter, x: Array[Long], bps: Int,
                            forceVerbatim: Boolean): Unit = {
    val bs = x.length
    val constant = x.forall(_ == x(0))
    if (constant && !forceVerbatim) {
      w.writeBit(0); w.writeBits(0, 6); w.writeBit(0)
      w.writeSigned(x(0), bps)
      return
    }
    // candidate fixed orders 0-2: residuals + best single-partition Rice cost
    def residuals(order: Int): Array[Long] = {
      val res = new Array[Long](bs - order)
      var i = order
      while (i < bs) {
        res(i - order) = order match {
          case 0 => x(i)
          case 1 => x(i) - x(i - 1)
          case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
        }
        i += 1
      }
      res
    }
    def riceCost(res: Array[Long]): (Int, Long) = {
      var best = (0, Long.MaxValue)
      var p = 0
      while (p <= 14) {
        var bits = 0L
        var i = 0
        while (i < res.length) {
          val folded = (res(i) << 1) ^ (res(i) >> 63)
          bits += (folded >>> p) + 1 + p
          i += 1
        }
        if (bits < best._2) best = (p, bits)
        p += 1
      }
      best
    }
    val candidates = (0 to math.min(2, bs - 1)).map { o =>
      val res = residuals(o)
      val (param, cost) = riceCost(res)
      (o, res, param, cost + o.toLong * bps + 6)
    }
    val (order, res, param, cost) = candidates.minBy(_._4)
    val verbatimCost = bs.toLong * bps
    if (forceVerbatim || cost >= verbatimCost) {
      w.writeBit(0); w.writeBits(1, 6); w.writeBit(0)
      var i = 0
      while (i < bs) { w.writeSigned(x(i), bps); i += 1 }
    } else {
      w.writeBit(0); w.writeBits((8 + order).toLong, 6); w.writeBit(0)
      var i = 0
      while (i < order) { w.writeSigned(x(i), bps); i += 1 }
      w.writeBits(0, 2) // 4-bit Rice method
      w.writeBits(0, 4) // partition order 0: one partition
      w.writeBits(param.toLong, 4)
      i = 0
      while (i < res.length) {
        val folded = (res(i) << 1) ^ (res(i) >> 63)
        val q = folded >>> param
        var j = 0L
        while (j < q) { w.writeBit(0); j += 1 }
        w.writeBit(1)
        w.writeBits(folded & ((1L << param) - 1), param)
        i += 1
      }
    }
  }
}
