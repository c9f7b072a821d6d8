package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** REAL media decoding for the formats that are pure byte math —
  * RIFF/WAVE PCM audio and uncompressed 24-bit BMP images — written
  * from the published container specs (Microsoft/IBM RIFF WAVE, 1991;
  * Windows BITMAPINFOHEADER).  No native codec library is required, so
  * this runs anywhere the JVM runs, executor-side, inside whole-stage
  * codegen.
  *
  * This is the demonstration that the multimodal pipeline's decode
  * seam ([[graft.operators.Multimodal]]) carries REAL decoders
  * end-to-end: payload bytes in a binary column → typed metadata +
  * signal features out, one struct per row.  Compressed formats
  * (JPEG/MP4/FLAC…) still need external codecs and stay behind the
  * documented stub seam.
  *
  * Decoded struct (modality-specific fields null when not applicable):
  * mime, width, height, channels, sample_rate, bits, n_samples,
  * duration_s, rms, peak, mean_r, mean_g, mean_b, size_bytes.
  */
object MediaCodecs {

  val mediaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_s", DoubleType),
    StructField("rms", DoubleType),
    StructField("peak", DoubleType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("size_bytes", LongType, nullable = false)))

  private def u2(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
  private def u4(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) | ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
  private def i4(b: Array[Byte], at: Int): Int = u4(b, at).toInt

  final case class WavMeta(channels: Int, sampleRate: Int, bits: Int,
                           nSamples: Long, durationS: Double, rms: Double, peak: Double)

  /** RIFF/WAVE parser: walks the chunk list for `fmt ` and `data`;
    * PCM16 payloads also yield RMS and peak of the normalized signal.
    * Returns None when the bytes are not a well-formed PCM WAV. */
  def parseWav(b: Array[Byte]): Option[WavMeta] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var at = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var data: Option[(Int, Int)] = None // offset, size
    while (at + 8 <= b.length) {
      val id = new String(b, at, 4, "US-ASCII")
      // a corrupt/adversarial size field >= 2^31 truncates negative —
      // the decoder must DEGRADE, never loop or crash on bad bytes
      val size = u4(b, at + 4)
      if (size < 0 || size > Int.MaxValue - 8) return None
      val body = at + 8
      if (id == "fmt " && body + 16 <= b.length) {
        val audioFormat = u2(b, body)
        if (audioFormat != 1) return None // only uncompressed PCM
        fmt = Some((u2(b, body + 2), u4(b, body + 4).toInt, u2(b, body + 14), u2(b, body + 12)))
      } else if (id == "data") {
        data = Some((body, math.min(size, (b.length - body).toLong).toInt))
      }
      at = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    for ((channels, rate, bits, blockAlign) <- fmt; (off, size) <- data) yield {
      val align = math.max(1, blockAlign)
      val nSamples = size.toLong / align
      val duration = if (rate > 0) nSamples.toDouble / rate else 0.0
      var (sumSq, peak) = (0.0, 0.0)
      var n = 0L
      if (bits == 16) {
        var i = off
        val end = off + size - 1
        while (i < end) {
          val s = ((b(i) & 0xff) | (b(i + 1) << 8)).toShort / 32768.0
          sumSq += s * s
          val a = math.abs(s); if (a > peak) peak = a
          n += 1; i += 2
        }
      }
      val rms = if (n > 0) math.sqrt(sumSq / n) else 0.0
      WavMeta(channels, rate, bits, nSamples, duration, rms, peak)
    }
  }

  final case class BmpMeta(width: Int, height: Int,
                           meanR: Double, meanG: Double, meanB: Double)

  /** 24-bit uncompressed BMP (BITMAPINFOHEADER) parser: dimensions +
    * per-channel pixel means.  Rows are 4-byte aligned, pixels BGR,
    * bottom-up when height > 0. */
  def parseBmp(b: Array[Byte]): Option[BmpMeta] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val pixelOff = u4(b, 10)
    val hdrSizeL = u4(b, 14)
    if (hdrSizeL < 40) return None
    val w = i4(b, 18)
    val hRaw = i4(b, 22)
    val h = math.abs(hRaw)
    val bpp = u2(b, 28)
    val compression = u4(b, 30)
    // corrupt headers (negative/oversized offsets or dimensions whose
    // stride overflows Int) must degrade to None, never index out of
    // bounds inside the codegen'd expression
    // h <= 0 (not == 0): math.abs(Int.MinValue) is still Int.MinValue,
    // so a crafted height of 0x80000000 would otherwise slip past the
    // stride*h bound (negative product) and return bogus metadata
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0) return None
    if (pixelOff < 54 || pixelOff > b.length || w > (Int.MaxValue - 3) / 3) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (pixelOff + stride.toLong * h > b.length) return None
    val pixelOffI = pixelOff.toInt
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var row = 0
    while (row < h) {
      var x = 0
      val base = pixelOffI + row * stride
      while (x < w) {
        val p = base + x * 3
        sb += (b(p) & 0xff); sg += (b(p + 1) & 0xff); sr += (b(p + 2) & 0xff)
        x += 1
      }
      row += 1
    }
    val n = w.toDouble * h
    Some(BmpMeta(w, h, sr / n, sg / n, sb / n))
  }

  /** Nearest-neighbor resize of a 24-bit uncompressed BMP to exactly
    * (tw, th), re-encoded as BMP — the REAL resize tier of the
    * multimodal pipeline (compressed formats stay behind the codec
    * seam).  Pure byte math, executor-side; preserves the source's
    * bottom-up/top-down row order by resampling in file coordinates.
    * Returns None for anything [[parseBmp]] would reject. */
  def resizeBmp(b: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    if (tw <= 0 || th <= 0 || tw > (1 << 15) || th > (1 << 15)) return None
    if (parseBmp(b).isEmpty) return None // full validation in one place
    val pixelOff = u4(b, 10).toInt
    val w = i4(b, 18)
    val h = math.abs(i4(b, 22))
    val stride = ((w * 3 + 3) / 4) * 4
    val tStride = ((tw * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + tStride * th)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(out.length)
    bb.putInt(0).putInt(54)
    bb.putInt(40).putInt(tw)
    bb.putInt(if (i4(b, 22) < 0) -th else th) // keep source orientation
    bb.putShort(1).putShort(24).putInt(0).putInt(tStride * th)
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var ty = 0
    while (ty < th) {
      val sy = ((ty.toLong * h) / th).toInt
      var tx = 0
      while (tx < tw) {
        val sx = ((tx.toLong * w) / tw).toInt
        val sp = pixelOff + sy * stride + sx * 3
        val tp = 54 + ty * tStride + tx * 3
        out(tp) = b(sp); out(tp + 1) = b(sp + 1); out(tp + 2) = b(sp + 2)
        tx += 1
      }
      ty += 1
    }
    Some(out)
  }

  /** Nearest-sample rate conversion of a PCM16 WAV payload to
    * `targetRate`, re-encoded as a minimal RIFF/WAVE file — the REAL
    * audio resample tier (compressed audio stays behind the codec
    * seam).  Multi-channel frames move together.  Returns None for
    * anything [[parseWav]] rejects or non-16-bit payloads. */
  def resampleWav(b: Array[Byte], targetRate: Int): Option[Array[Byte]] = {
    if (targetRate <= 0 || targetRate > 1000000) return None
    val meta = parseWav(b).getOrElse(return None)
    if (meta.bits != 16 || meta.nSamples <= 0) return None
    // locate the data chunk again (same walk as parseWav)
    var off = 12
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length && dataOff < 0) {
      val id = new String(b, off, 4, "US-ASCII")
      val sz = u4(b, off + 4).toInt
      if (id == "data") { dataOff = off + 8; dataLen = math.min(sz, b.length - dataOff) }
      off += 8 + sz + (sz & 1)
    }
    if (dataOff < 0) return None
    val frameBytes = meta.channels * 2
    val nIn = dataLen / frameBytes
    val nOut = math.max(1, (nIn.toLong * targetRate / meta.sampleRate).toInt)
    val outData = new Array[Byte](nOut * frameBytes)
    var i = 0
    while (i < nOut) {
      val src = ((i.toLong * nIn) / nOut).toInt
      System.arraycopy(b, dataOff + src * frameBytes, outData, i * frameBytes, frameBytes)
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(44 + outData.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + outData.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(meta.channels.toShort)
    bb.putInt(targetRate).putInt(targetRate * frameBytes)
    bb.putShort(frameBytes.toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(outData.length)
    bb.put(outData)
    Some(bb.array())
  }

  /** Magic-byte dispatch → metadata struct row (static: called from
    * both interpreted eval and generated code). */
  def decodeRow(b: Array[Byte]): InternalRow = {
    val size = b.length.toLong
    parseWav(b) match {
      case Some(w) =>
        InternalRow(UTF8String.fromString("audio/wav"), null, null,
          w.channels, w.sampleRate, w.bits, w.nSamples, w.durationS,
          w.rms, w.peak, null, null, null, size)
      case None => parseBmp(b) match {
        case Some(m) =>
          InternalRow(UTF8String.fromString("image/bmp"), m.width, m.height,
            null, null, null, null, null, null, null,
            m.meanR, m.meanG, m.meanB, size)
        case None =>
          InternalRow(UTF8String.fromString("application/octet-stream"),
            null, null, null, null, null, null, null, null, null,
            null, null, null, size)
      }
    }
  }

  /** Column surface: `decode(payload)` → metadata struct. */
  def decode(payload: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(MediaDecodeExpr(
      GraftBridge.expression(payload.cast(BinaryType))))
  }
}

/** Codegen'd media decode: one static call per row, struct out. */
case class MediaDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecs.mediaType
  override def prettyName: String = "decode_media"

  override def nullSafeEval(payload: Any): Any =
    MediaCodecs.decodeRow(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = graft.functions.MediaCodecs.decodeRow($p);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
