package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a short payload"),
    (2L, "another considerably longer payload with more bytes in it"),
    (3L, "x"))
    .toDF("doc_id", "text")

  test("withMedia attaches binary payload + typed metadata struct") {
    val m = Multimodal.withMedia(docs, col("text"), "text/plain")
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = m.select("media.*").collect()
    meta.foreach { r =>
      assert(r.getAs[String]("mime") == "text/plain")
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080)
    }
    val sz = m.select(col("doc_id"), col("media.size_bytes")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sz(1L) == 15L && sz(3L) == 1L)
    // decode is deterministic: same payload -> same metadata
    val again = Multimodal.withMedia(docs, col("text"), "text/plain").select("media.width").collect()
    assert(again.map(_.getInt(0)).toSeq == m.select("media.width").collect().map(_.getInt(0)).toSeq)
  }

  test("explodeFrames yields stable frame ids and reassembles to payload") {
    val m = Multimodal.withMedia(docs, col("text"))
    val frames = Multimodal.explodeFrames(m, "payload", maxFrames = 4)
    assert(frames.columns.contains("frame_id") && frames.columns.contains("frame"))
    // doc 3 is a single byte -> 1 frame; doc 2 -> 4 frames
    val counts = frames.groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(3L) == 1L && counts(2L) == 4L)
    // frames concatenated in order reassemble the exact payload
    val doc1 = frames.filter(col("doc_id") === 1L).orderBy("frame_id")
      .select("frame").collect().map(_.getAs[Array[Byte]](0)).reduce(_ ++ _)
    assert(new String(doc1) == "a short payload")
  }

  test("byteStats nibble histogram sums to 2x byte count") {
    val m = Multimodal.withMedia(docs, col("text"))
    val st = m.select(col("doc_id"), Multimodal.byteStats(col("payload")).as("bs"))
      .select(col("doc_id"), col("bs.n_bytes"), col("bs.nibble_hist"))
    st.collect().foreach { r =>
      val n = r.getLong(1)
      val hist = r.getSeq[Long](2)
      assert(hist.length == 16)
      assert(hist.sum == 2 * n) // two hex digits per byte
    }
  }

  test("mapBatches drives the per-partition codec seam") {
    val ds = docs.select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY))
    val out = Multimodal.mapBatches(ds, Multimodal.stubDecode).collect()
    assert(out.length == 3)
    out.foreach { case (_, w, h) => assert(w >= 1 && h >= 1) }
    // deterministic across runs
    val out2 = Multimodal.mapBatches(ds, Multimodal.stubDecode).collect()
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
  }

  /** Minimal PCM16 WAV from an interleaved sample sequence (RIFF spec). */
  private def wavBytes(samples: Seq[Short], rate: Int, channels: Int = 1): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataSize); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort) // PCM
    bb.putInt(rate); bb.putInt(rate * 2 * channels)
    bb.putShort((2 * channels).toShort); bb.putShort(16) // block align, bits
    bb.put("data".getBytes); bb.putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Minimal 24-bit BMP: rows of (r, g, b) pixels, bottom-up. */
  private def bmpBytes(pixels: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length; val w = pixels.head.length
    val stride = ((w * 3 + 3) / 4) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(54 + stride * h)
    bb.putInt(0); bb.putInt(54)
    bb.putInt(40); bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(stride * h)
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    // bottom-up: last pixel row first
    pixels.reverse.foreach { row =>
      row.foreach { case (r, g, b) =>
        bb.put(b.toByte); bb.put(g.toByte); bb.put(r.toByte)
      }
      (w * 3 until stride).foreach(_ => bb.put(0.toByte))
    }
    bb.array()
  }

  test("decodeMedia really decodes WAV PCM: rate, duration, RMS, peak") {
    // 0.1 s of a square wave at half amplitude: RMS = peak = 0.5
    val rate = 8000
    val samples = (0 until 800).map(i => (if (i % 2 == 0) 16384 else -16384).toShort)
    val df = Seq((1L, wavBytes(samples, rate))).toDF("id", "payload")
    val m = df.select(Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("m.mime"), col("m.sample_rate"), col("m.channels"),
        col("m.n_samples"), col("m.duration_s"), col("m.rms"), col("m.peak"))
      .collect().head
    assert(m.getString(0) == "audio/wav")
    assert(m.getInt(1) == 8000 && m.getInt(2) == 1)
    assert(m.getLong(3) == 800L)
    assert(math.abs(m.getDouble(4) - 0.1) < 1e-9)
    assert(math.abs(m.getDouble(5) - 0.5) < 1e-3) // RMS of ±0.5 square
    assert(math.abs(m.getDouble(6) - 0.5) < 1e-3)
  }

  /** Minimal mono WAV with an arbitrary sample format; `extensible`
    * wraps the format code in a WAVE_FORMAT_EXTENSIBLE SubFormat GUID
    * (PCM GUID layout: Data1 = format, tail fixed). */
  private def wavRaw(format: Int, bits: Int, data: Array[Byte], rate: Int = 8000,
                     extensible: Boolean = false): Array[Byte] = {
    val blockAlign = math.max(1, bits / 8)
    val fmtLen = if (extensible) 40 else 16
    val bb = java.nio.ByteBuffer.allocate(28 + fmtLen + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(20 + fmtLen + data.length); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(fmtLen)
    bb.putShort(if (extensible) 0xFFFE.toShort else format.toShort); bb.putShort(1)
    bb.putInt(rate); bb.putInt(rate * blockAlign)
    bb.putShort(blockAlign.toShort); bb.putShort(bits.toShort)
    if (extensible) {
      bb.putShort(22)           // cbSize
      bb.putShort(bits.toShort) // valid bits
      bb.putInt(4)              // channel mask
      bb.putShort(format.toShort); bb.putShort(0) // GUID Data1 = format
      bb.putShort(0); bb.putShort(0x0010)         // Data2, Data3
      bb.put(Array(0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71).map(_.toByte))
    }
    bb.put("data".getBytes); bb.putInt(data.length)
    bb.put(data)
    bb.array()
  }

  test("parseWav decodes float32, G.711 mu-law/A-law, and EXTENSIBLE wrappers") {
    import graft.functions.MediaCodecs
    // IEEE float32: a +-0.5 square wave -> rms = peak = 0.5 exactly
    val fdata = java.nio.ByteBuffer.allocate(800 * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 800).foreach(i => fdata.putFloat(if (i % 2 == 0) 0.5f else -0.5f))
    val f = MediaCodecs.parseWav(wavRaw(3, 32, fdata.array())).get
    assert(f.bits == 32 && f.nSamples == 800L && f.rms == 0.5 && f.peak == 0.5)
    assert(math.abs(f.durationS - 0.1) < 1e-12)
    // G.711 reference decoders (CCITT ulaw2linear/alaw2linear shapes)
    def muRef(b0: Int): Int = {
      val u = ~b0 & 0xff
      val t = (((u & 0xf) << 3) + 0x84) << ((u & 0x70) >> 4)
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }
    def aRef(b0: Int): Int = {
      val a = b0 ^ 0x55
      var t = (a & 0xf) << 4
      val seg = (a & 0x70) >> 4
      if (seg == 0) t += 8 else { t += 0x108; t <<= seg - 1 }
      if ((a & 0x80) != 0) t else -t
    }
    // every byte value decodes exactly per the reference formula
    val allBytes = (0 until 256).map(_.toByte).toArray
    val mu = MediaCodecs.parseWav(wavRaw(7, 8, allBytes)).get
    val muExp = (0 until 256).map(muRef(_) / 32768.0)
    assert(mu.peak == muExp.map(math.abs).max)
    assert(mu.rms == math.sqrt(muExp.map(s => s * s).sum / 256))
    assert(mu.nSamples == 256L && mu.bits == 8)
    val al = MediaCodecs.parseWav(wavRaw(6, 8, allBytes)).get
    val alExp = (0 until 256).map(aRef(_) / 32768.0)
    assert(al.peak == alExp.map(math.abs).max)
    assert(al.rms == math.sqrt(alExp.map(s => s * s).sum / 256))
    // EXTENSIBLE wrapping PCM16 decodes identically to the plain tag
    val pcm = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(16384, -16384, 16384, -16384).foreach(s => pcm.putShort(s.toShort))
    val plain = MediaCodecs.parseWav(wavRaw(1, 16, pcm.array())).get
    val ext = MediaCodecs.parseWav(wavRaw(1, 16, pcm.array(), extensible = true)).get
    assert(ext == plain && plain.rms == 0.5)
    // out-of-scope formats degrade: float64 and ADPCM are None
    assert(MediaCodecs.parseWav(wavRaw(3, 64, new Array[Byte](16))).isEmpty)
    assert(MediaCodecs.parseWav(wavRaw(2, 4, new Array[Byte](16))).isEmpty)
  }

  test("decodeMedia really decodes 24-bit BMP: dims and channel means") {
    // 3x2: top row red, bottom row blue -> meanR = meanB = 127.5
    val img = Seq(
      Seq((255, 0, 0), (255, 0, 0), (255, 0, 0)),
      Seq((0, 0, 255), (0, 0, 255), (0, 0, 255)))
    val df = Seq((1L, bmpBytes(img))).toDF("id", "payload")
    val m = df.select(Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("m.mime"), col("m.width"), col("m.height"),
        col("m.mean_r"), col("m.mean_g"), col("m.mean_b"))
      .collect().head
    assert(m.getString(0) == "image/bmp")
    assert(m.getInt(1) == 3 && m.getInt(2) == 2)
    assert(math.abs(m.getDouble(3) - 127.5) < 1e-9)
    assert(m.getDouble(4) == 0.0)
    assert(math.abs(m.getDouble(5) - 127.5) < 1e-9)
  }

  // minimal PNG encoder for fixtures: 8-bit, chosen color type, one
  // filter per row applied FORWARD per the spec — the decoder must
  // invert it; the zlib stream is split across two IDAT chunks (chunk
  // boundaries are not stream boundaries)
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def pngBytes(w: Int, h: Int, colorType: Int, raw: Array[Array[Byte]],
                       filters: Array[Int], plte: Array[Byte] = null,
                       interlace: Int = 0, bitDepth: Int = 8): Array[Byte] = {
    val ch = colorType match { case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4 }
    val rb = w * ch
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val filtered = new java.io.ByteArrayOutputStream()
    val zero = new Array[Byte](rb)
    for (r <- 0 until h) {
      val f = filters(r % filters.length)
      filtered.write(f)
      val prev = if (r == 0) zero else raw(r - 1)
      val cur = raw(r)
      for (x <- 0 until rb) {
        val a = if (x >= ch) cur(x - ch) & 0xff else 0
        val b = prev(x) & 0xff
        val c = if (x >= ch) prev(x - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0; case 1 => a; case 2 => b
          case 3 => (a + b) >> 1; case 4 => paeth(a, b, c)
          case _ => 0 // undefined filter byte: raw data (decoder must reject)
        }
        filtered.write(((cur(x) & 0xff) - pred) & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered.toByteArray); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(pngChunk("IHDR", ihdr))
    if (plte != null) out.write(pngChunk("PLTE", plte))
    val cb = comp.toByteArray
    out.write(pngChunk("IDAT", cb.take(cb.length / 2)))
    out.write(pngChunk("IDAT", cb.drop(cb.length / 2)))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** LSB-first variable-width code packer (the GIF LZW bit layout). */
  private def packCodes(codes: Seq[(Int, Int)]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    var acc = 0L; var n = 0
    codes.foreach { case (c, w) =>
      acc |= c.toLong << n; n += w
      while (n >= 8) { buf.write((acc & 0xff).toInt); acc >>= 8; n -= 8 }
    }
    if (n > 0) buf.write((acc & 0xff).toInt)
    buf.toByteArray
  }

  /** GIF container around raw LZW data: global palette (padded to a
    * power of two) + one full-screen frame. */
  private def gifContainer(w: Int, h: Int, palette: Array[(Int, Int, Int)],
                           minCode: Int, lzwData: Array[Byte],
                           interlace: Boolean = false): Array[Byte] = {
    val bits = math.max(1, 32 - Integer.numberOfLeadingZeros(palette.length - 1))
    val out = new java.io.ByteArrayOutputStream()
    def u2le(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u2le(w); u2le(h)
    out.write(0x80 | (bits - 1)); out.write(0); out.write(0)
    for (i <- 0 until (1 << bits)) {
      val (r, g, b) = if (i < palette.length) palette(i) else (0, 0, 0)
      out.write(r); out.write(g); out.write(b)
    }
    out.write(0x2C); u2le(0); u2le(0); u2le(w); u2le(h)
    out.write(if (interlace) 0x40 else 0)
    out.write(minCode)
    var o = 0
    while (o < lzwData.length) {
      val len = math.min(255, lzwData.length - o)
      out.write(len); out.write(lzwData, o, len); o += len
    }
    out.write(0); out.write(0x3B)
    out.toByteArray
  }

  /** Compression-free LZW: CLEAR before every literal keeps the code
    * width fixed at minCode+1 — a legal stream any decoder accepts. */
  private def gifBytes(w: Int, h: Int, palette: Array[(Int, Int, Int)],
                       idx: Array[Byte], interlace: Boolean = false): Array[Byte] = {
    // LZW minimum code size = the color-table bit width (>= 2), so
    // every palette index is a valid literal (< clear code)
    val minCode = math.max(2, 32 - Integer.numberOfLeadingZeros(palette.length - 1))
    val clear = 1 << minCode; val cw = minCode + 1
    val codes = idx.toSeq.flatMap(i => Seq((clear, cw), (i & 0xff, cw))) :+ ((clear + 1, cw))
    gifContainer(w, h, palette, minCode, packCodes(codes), interlace)
  }

  test("decodeMedia really decodes GIF: palette means, interlace-independent") {
    val pal = Array((250, 10, 0), (0, 200, 40), (8, 8, 240), (30, 30, 30))
    val idx = Array[Byte](0, 1, 2, 3, 0, 1)
    val m = Seq((1L, gifBytes(3, 2, pal, idx))).toDF("id", "payload")
      .select(Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("m.mime"), col("m.width"), col("m.height"),
        col("m.mean_r"), col("m.mean_g"), col("m.mean_b"))
      .collect().head
    assert(m.getString(0) == "image/gif")
    assert(m.getInt(1) == 3 && m.getInt(2) == 2)
    val expR = (250 * 2 + 0 * 2 + 8 + 30) / 6.0
    val expG = (10 * 2 + 200 * 2 + 8 + 30) / 6.0
    val expB = (0 * 2 + 40 * 2 + 240 + 30) / 6.0
    assert(m.getDouble(3) == expR && m.getDouble(4) == expG && m.getDouble(5) == expB)
    // interlace flag changes row order only — means are identical
    val il = graft.functions.MediaCodecs.parseGif(gifBytes(3, 2, pal, idx, interlace = true)).get
    assert(il.meanR == expR && il.meanG == expG && il.meanB == expB)
  }

  test("GIF LZW: dictionary walk, code-width growth, and the KwKwK case") {
    import graft.functions.MediaCodecs
    val pal = Array((10, 0, 0), (20, 0, 0), (40, 0, 0), (80, 0, 0))
    // hand-traced stream, minCode=2 (clear=4, eoi=5, first entry 6):
    //   CLEAR, 1, 2 (adds E6=[1,2]), 6 (emits [1,2], adds E7=[2,1] ->
    //   dict hits 8 = 2^3, width grows to 4), 7 (emits [2,1]), EOI
    // -> pixels [1, 2, 1, 2, 2, 1]
    val grown = gifContainer(6, 1, pal, 2,
      packCodes(Seq((4, 3), (1, 3), (2, 3), (6, 3), (7, 4), (5, 4))))
    val g = MediaCodecs.parseGif(grown).get
    assert(g.meanR == (20 * 3 + 40 * 3) / 6.0, s"dictionary-walk pixels wrong: $g")
    // KwKwK: CLEAR, 1, 6 where 6 == dictSize -> entry = [1] ++ head([1])
    // -> pixels [1, 1, 1]
    val kwk = gifContainer(3, 1, pal, 2,
      packCodes(Seq((4, 3), (1, 3), (6, 3), (5, 3))))
    val k = MediaCodecs.parseGif(kwk).get
    assert(k.meanR == 20.0, s"KwKwK pixels wrong: $k")
    // corrupt streams degrade to None: a code PAST dictSize, a
    // truncated stream, and a trailer before any image
    assert(MediaCodecs.parseGif(gifContainer(3, 1, pal, 2,
      packCodes(Seq((4, 3), (1, 3), (7, 3), (5, 3))))).isEmpty)
    assert(MediaCodecs.parseGif(gifContainer(6, 1, pal, 2,
      packCodes(Seq((4, 3), (1, 3))))).isEmpty)
    val noImage = gifBytes(2, 1, pal, Array[Byte](0, 1))
      .patch(13 + 12, Array(0x3B.toByte), 1) // image descriptor -> trailer
    assert(MediaCodecs.parseGif(noImage).isEmpty)
  }

  test("decodeMedia really decodes PNG: all five filters, exact channel means") {
    // seeded 7x9 RGB image, rows cycling through filters 0..4 — the
    // decode must invert every filter type to reproduce the raw means
    val rnd = new scala.util.Random(11)
    val (w, h) = (7, 9)
    val raw = Array.fill(h)(Array.fill(w * 3)(rnd.nextInt(256).toByte))
    val png = pngBytes(w, h, colorType = 2, raw, filters = Array(0, 1, 2, 3, 4))
    val n = (w * h).toDouble
    val expR = raw.map(r => (0 until w).map(x => r(x * 3) & 0xff).sum).sum / n
    val expG = raw.map(r => (0 until w).map(x => r(x * 3 + 1) & 0xff).sum).sum / n
    val expB = raw.map(r => (0 until w).map(x => r(x * 3 + 2) & 0xff).sum).sum / n
    val m = Seq((1L, png)).toDF("id", "payload")
      .select(Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("m.mime"), col("m.width"), col("m.height"), col("m.channels"),
        col("m.bits"), col("m.mean_r"), col("m.mean_g"), col("m.mean_b"))
      .collect().head
    assert(m.getString(0) == "image/png")
    assert(m.getInt(1) == w && m.getInt(2) == h && m.getInt(3) == 3 && m.getInt(4) == 8)
    assert(m.getDouble(5) == expR && m.getDouble(6) == expG && m.getDouble(7) == expB)
  }

  test("PNG color types: RGBA alpha ignored, gray maps to r=g=b, palette resolves") {
    import graft.functions.MediaCodecs
    // RGBA: constant red pixels under varying alpha -> means ignore alpha
    val rgba = Array.tabulate(2)(r => Array.tabulate(3 * 4) { i =>
      (i % 4 match { case 0 => 200; case 3 => 17 * (r + 1); case _ => 0 }).toByte })
    val pa = MediaCodecs.parsePng(pngBytes(3, 2, 6, rgba, Array(0, 4))).get
    assert(pa.channels == 4 && pa.meanR == 200.0 && pa.meanG == 0.0 && pa.meanB == 0.0)
    // gray (ct 0): value 50 everywhere -> r = g = b = 50
    val gray = Array.fill(2)(Array.fill(4)(50.toByte))
    val pg = MediaCodecs.parsePng(pngBytes(4, 2, 0, gray, Array(1, 2))).get
    assert(pg.channels == 1 && pg.meanR == 50.0 && pg.meanG == 50.0 && pg.meanB == 50.0)
    // gray+alpha (ct 4): gray 80, alpha varies
    val ga = Array.fill(2)(Array.tabulate(8)(i => (if (i % 2 == 0) 80 else 13 * i).toByte))
    val pga = MediaCodecs.parsePng(pngBytes(4, 2, 4, ga, Array(3))).get
    assert(pga.channels == 2 && pga.meanR == 80.0 && pga.meanB == 80.0)
    // palette (ct 3): index 0 -> (10,20,30), index 1 -> (255,0,255)
    val plte = Array(10, 20, 30, 255, 0, 255).map(_.toByte)
    val idx = Array(Array[Byte](0, 1), Array[Byte](1, 0))
    val pp = MediaCodecs.parsePng(pngBytes(2, 2, 3, idx, Array(0), plte = plte)).get
    assert(pp.meanR == 132.5 && pp.meanG == 10.0 && pp.meanB == 142.5)
  }

  test("PNG decode degrades out-of-scope and corrupt inputs to None, never crashes") {
    import graft.functions.MediaCodecs
    val raw = Array.fill(2)(Array.fill(6)(99.toByte))
    val good = pngBytes(2, 2, 2, raw, Array(0))
    assert(MediaCodecs.parsePng(good).isDefined)
    // truncated zlib stream (well-formed chunks, under-length data)
    val cut = good.dropRight(24)
    assert(MediaCodecs.parsePng(cut).isEmpty)
    // Adam7 interlace and 16-bit depth are out of decode scope
    assert(MediaCodecs.parsePng(pngBytes(2, 2, 2, raw, Array(0), interlace = 1)).isEmpty)
    assert(MediaCodecs.parsePng(pngBytes(2, 2, 2, raw, Array(0), bitDepth = 16)).isEmpty)
    // undefined filter type byte inside the stream
    assert(MediaCodecs.parsePng(pngBytes(2, 2, 2, raw, Array(7))).isEmpty)
    // palette image without PLTE, and an index past the palette
    assert(MediaCodecs.parsePng(
      pngBytes(2, 2, 3, Array.fill(2)(Array[Byte](0, 1)), Array(0))).isEmpty)
    assert(MediaCodecs.parsePng(pngBytes(2, 2, 3, Array.fill(2)(Array[Byte](0, 9)),
      Array(0), plte = Array[Byte](1, 2, 3))).isEmpty)
    // flipped signature byte falls through to octet-stream in dispatch
    val badSig = good.clone(); badSig(0) = 0x42
    val mime = Seq((1L, badSig)).toDF("id", "payload")
      .select(Multimodal.decodeMedia(col("payload")).getField("mime"))
      .collect().head.getString(0)
    assert(mime == "application/octet-stream")
  }

  test("resizeImage resamples PNG too: halves keep their colors, alpha drops") {
    import graft.functions.MediaCodecs
    // 4x4 RGBA: left half red (alpha 10), right half blue (alpha 200)
    val raw = Array.tabulate(4)(_ => Array.tabulate(4 * 4) { i =>
      val px = i / 4
      (i % 4 match {
        case 0 => if (px < 2) 255 else 0
        case 2 => if (px < 2) 0 else 255
        case 3 => if (px < 2) 10 else 200
        case _ => 0
      }).toByte
    })
    val png = pngBytes(4, 4, colorType = 6, raw, filters = Array(0, 2))
    val rows = Seq((1L, png), (2L, "not an image".getBytes))
      .toDF("id", "payload")
      .select(col("id"), Multimodal.resizeImage(col("payload"), 2, 2).as("small"))
      .orderBy("id").collect()
    assert(rows(1).isNullAt(1), "non-image must resize to null")
    val small = MediaCodecs.parsePng(rows(0).getAs[Array[Byte]](1)).get
    // 2x2 keeps one red and one blue column; output is RGB (alpha gone)
    assert(small.width == 2 && small.height == 2 && small.channels == 3)
    assert(small.meanR == 127.5 && small.meanG == 0.0 && small.meanB == 127.5)
    // the re-encoded bytes are a valid PNG for the dispatch too
    val mime = Seq((1L, rows(0).getAs[Array[Byte]](1))).toDF("id", "p")
      .select(Multimodal.decodeMedia(col("p")).getField("mime"))
      .collect().head.getString(0)
    assert(mime == "image/png")
  }

  test("resizeImage really resamples a BMP; non-images yield null") {
    // 4x4: left half red, right half blue -> 2x2 keeps the halves
    val img = Seq.fill(4)(Seq((255, 0, 0), (255, 0, 0), (0, 0, 255), (0, 0, 255)))
    val df = Seq((1L, bmpBytes(img)), (2L, Array[Byte](9, 9, 9))).toDF("id", "payload")
    val resized = df.select(col("id"),
      Multimodal.resizeImage(col("payload"), 2, 2).as("small"))
    val rows = resized.orderBy("id").collect()
    assert(rows(1).isNullAt(1)) // junk payload -> null, no crash
    val small = rows(0).getAs[Array[Byte]]("small")
    val m = Seq((0L, small)).toDF("id", "p")
      .select(Multimodal.decodeMedia(col("p")).as("m"))
      .select(col("m.mime"), col("m.width"), col("m.height"),
        col("m.mean_r"), col("m.mean_b")).collect().head
    assert(m.getString(0) == "image/bmp")
    assert(m.getInt(1) == 2 && m.getInt(2) == 2)
    // halves survive: mean over 2x2 = half red half blue
    assert(math.abs(m.getDouble(3) - 127.5) < 1e-9)
    assert(math.abs(m.getDouble(4) - 127.5) < 1e-9)
    // upscale round-trips dimensions too
    val big = graft.functions.MediaCodecs.resizeBmp(bmpBytes(img), 8, 6).get
    val bm = graft.functions.MediaCodecs.parseBmp(big).get
    assert(bm.width == 8 && bm.height == 6)
    assert(math.abs(bm.meanR - 127.5) < 1e-9 && math.abs(bm.meanB - 127.5) < 1e-9)
  }

  test("resampleAudio halves the rate, keeps the duration and signal") {
    val rate = 8000
    val samples = (0 until 800).map(i => (if (i % 2 == 0) 16384 else -16384).toShort)
    val df = Seq((1L, wavBytes(samples, rate)), (2L, Array[Byte](1, 2))).toDF("id", "payload")
    val rows = df.select(col("id"),
      Multimodal.resampleAudio(col("payload"), 4000).as("out")).orderBy("id").collect()
    assert(rows(1).isNullAt(1)) // junk -> null
    val m = Seq((0L, rows(0).getAs[Array[Byte]]("out"))).toDF("id", "p")
      .select(Multimodal.decodeMedia(col("p")).as("m"))
      .select(col("m.mime"), col("m.sample_rate"), col("m.n_samples"),
        col("m.duration_s"), col("m.peak")).collect().head
    assert(m.getString(0) == "audio/wav")
    assert(m.getInt(1) == 4000 && m.getLong(2) == 400L)
    assert(math.abs(m.getDouble(3) - 0.1) < 1e-9) // duration preserved
    assert(math.abs(m.getDouble(4) - 0.5) < 1e-3) // amplitude preserved
  }

  test("codec fuzz: seeded random round trips stay bit-exact") {
    import graft.functions.MediaCodecs
    val rnd = new scala.util.Random(2026)
    for (_ <- 0 until 30) {
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(12)
      // PNG: random RGB -> encode -> decode: dims + means exact, and a
      // same-size resize is the identity on pixels
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val png = MediaCodecs.pngEncodeRgb(w, h, rgb)
      val meta = MediaCodecs.parsePng(png).get
      assert(meta.width == w && meta.height == h && meta.channels == 3)
      val n = (w * h).toDouble
      def mean(c: Int) = (0 until w * h).map(p => rgb(p * 3 + c) & 0xff).sum / n
      assert(meta.meanR == mean(0) && meta.meanG == mean(1) && meta.meanB == mean(2))
      val same = MediaCodecs.resizePng(png, w, h).get
      assert(MediaCodecs.pngDecodeRgb(same).get._3.toSeq == rgb.toSeq,
        "same-size resize must be the pixel identity")
      // GIF: random small palette + indices -> container -> means exact
      val nCol = 2 + rnd.nextInt(14)
      val pal = Array.fill(nCol)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val idx = Array.fill(w * h)(rnd.nextInt(nCol).toByte)
      val g = MediaCodecs.parseGif(gifBytes(w, h, pal, idx)).get
      def gmean(c: Int) = idx.map(i => (c match {
        case 0 => pal(i & 0xff)._1; case 1 => pal(i & 0xff)._2; case _ => pal(i & 0xff)._3
      }).toDouble).sum / n
      assert(g.meanR == gmean(0) && g.meanG == gmean(1) && g.meanB == gmean(2),
        s"GIF means diverged at ${w}x$h/$nCol colors")
      // WAV PCM16: rms/peak against a direct fold over the samples
      val samples = Array.fill(1 + rnd.nextInt(400))((rnd.nextInt(65536) - 32768).toShort)
      val wv = MediaCodecs.parseWav(wavBytes(samples.toSeq, 8000)).get
      val norm = samples.map(_ / 32768.0)
      assert(wv.peak == norm.map(math.abs).max)
      assert(wv.rms == math.sqrt(norm.map(s => s * s).sum / samples.length))
    }
  }

  test("gifEncodeRgb round-trips pixel-exact; histograms match PNG of the same pixels") {
    import graft.functions.MediaCodecs
    val rnd = new scala.util.Random(95)
    for (_ <- 0 until 20) {
      val w = 1 + rnd.nextInt(14); val h = 1 + rnd.nextInt(14)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val gif = MediaCodecs.gifEncodeRgb(w, h, rgb)
      val (dw, dh, back) = MediaCodecs.gifDecodeRgb(gif).get
      assert(dw == w && dh == h && back.toSeq == rgb.toSeq,
        s"GIF encode/decode must be the pixel identity at ${w}x$h")
      assert(MediaCodecs.imageHistogram(gif, 16).get.toSeq ==
        MediaCodecs.imageHistogram(MediaCodecs.pngEncodeRgb(w, h, rgb), 16).get.toSeq,
        "GIF and PNG of the same pixels must histogram identically")
    }
    // two colors exercises the minCode=2 spec floor; one color the 2-entry GCT pad
    val tiny = Array[Byte](0, 0, 0, -1, -1, -1, 0, 0, 0, -1, -1, -1)
    assert(MediaCodecs.gifDecodeRgb(MediaCodecs.gifEncodeRgb(2, 2, tiny)).get._3.toSeq
      == tiny.toSeq)
    val solid = Array.fill(27)(7.toByte)
    assert(MediaCodecs.gifDecodeRgb(MediaCodecs.gifEncodeRgb(3, 3, solid)).get._3.toSeq
      == solid.toSeq)
    // more than 256 distinct colors is a loud reject, never silent quantization
    val big = Array.tabulate(289 * 3) { k =>
      val p = k / 3
      (k % 3 match { case 0 => p & 0xff; case 1 => p >> 8; case _ => 0 }).toByte
    }
    assertThrows[IllegalArgumentException](MediaCodecs.gifEncodeRgb(17, 17, big))
  }

  test("imageEmbedding: format-independent histograms drive image near-dup") {
    import graft.functions.MediaCodecs
    val rnd = new scala.util.Random(31)
    // the same 8x6 pixels as BMP and as PNG -> identical histograms
    val px = Array.fill(6, 8)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val bmp = bmpBytes(px.map(_.toSeq).toSeq)
    val pngRaw = px.map(row => row.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) }.toArray)
    val png = pngBytes(8, 6, colorType = 2, pngRaw, filters = Array(0, 1, 2, 3, 4))
    assert(MediaCodecs.imageHistogram(bmp, 16).get.toSeq ==
      MediaCodecs.imageHistogram(png, 16).get.toSeq,
      "same pixels must histogram identically across containers")
    // a GIF of known solid colors matches a pixel-equal PNG
    val pal = Array((255, 0, 0), (0, 0, 255))
    val gifIdx = Array.fill(12)(0.toByte) ++ Array.fill(12)(1.toByte)
    val gif = gifBytes(4, 6, pal, gifIdx)
    val pngSolid = pngBytes(4, 6, 2, (0 until 6).map(r =>
      (0 until 4).flatMap { _ =>
        val (cr, cg, cb) = if (r < 3) pal(0) else pal(1)
        Seq(cr.toByte, cg.toByte, cb.toByte)
      }.toArray).toArray, Array(0))
    assert(MediaCodecs.imageHistogram(gif, 16).get.toSeq ==
      MediaCodecs.imageHistogram(pngSolid, 16).get.toSeq)
    // composition: near-identical images pair up through the existing
    // embedding near-dup operator; the unrelated image stays out
    val variant = px.map(_.clone())
    variant(0)(0) = (255 - px(0)(0)._1, px(0)(0)._2, px(0)(0)._3) // one pixel tweaked
    val other = Array.fill(6, 8)((rnd.nextInt(40), 200 + rnd.nextInt(56), rnd.nextInt(40)))
    val frames = Seq(
      (1L, bmp), (2L, bmpBytes(variant.map(_.toSeq).toSeq)),
      (3L, bmpBytes(other.map(_.toSeq).toSeq)), (4L, "not an image".getBytes))
      .toDF("img_id", "payload")
      .withColumn("emb", Multimodal.imageEmbedding(col("payload")))
    assert(frames.filter(col("img_id") === 4L).select("emb").collect().head.isNullAt(0))
    val pairs = graft.operators.Similarity.exactPairs(
        frames.filter(col("emb").isNotNull), "img_id", "emb", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the tweaked-pixel pair, got $pairs")
  }

  test("audioEmbedding: encoding-independent amplitude histograms drive audio near-dup") {
    import graft.functions.MediaCodecs
    val rnd = new scala.util.Random(5)
    val base = Array.fill(512)((rnd.nextInt(60000) - 30000).toShort)
    // the same samples as PCM16 and as float32 land in the same bins
    val fdata = java.nio.ByteBuffer.allocate(base.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    base.foreach(s => fdata.putFloat((s / 32768.0).toFloat))
    val pcm = wavBytes(base.toSeq, 8000)
    val flt = wavRaw(3, 32, fdata.array())
    assert(MediaCodecs.audioHistogram(pcm, 32).get.toSeq ==
      MediaCodecs.audioHistogram(flt, 32).get.toSeq,
      "same signal must histogram identically across sample encodings")
    // composition: a lightly-noised copy pairs with the original; a
    // different signal (quiet hum vs full-range noise) stays out
    val near = base.map(s => (s + rnd.nextInt(65) - 32).toShort)
    val other = Array.tabulate(512)(i => (800 * math.sin(i / 8.0)).toInt.toShort)
    val clips = Seq(
      (1L, pcm), (2L, wavBytes(near.toSeq, 8000)),
      (3L, wavBytes(other.toSeq, 8000)), (4L, "not audio".getBytes))
      .toDF("clip_id", "payload")
      .withColumn("emb", Multimodal.audioEmbedding(col("payload")))
    assert(clips.filter(col("clip_id") === 4L).select("emb").collect().head.isNullAt(0))
    val pairs = graft.operators.Similarity.exactPairs(
        clips.filter(col("emb").isNotNull), "clip_id", "emb", threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected exactly the noised pair, got $pairs")
  }

  test("codec fuzz: random bytes and bit-flipped valid files never throw") {
    import graft.functions.MediaCodecs
    val rnd = new scala.util.Random(777)
    def mustNotThrow(b: Array[Byte]): Unit = {
      MediaCodecs.parseWav(b); MediaCodecs.parseBmp(b)
      MediaCodecs.parsePng(b); MediaCodecs.parseGif(b)
      MediaCodecs.resizeBmp(b, 4, 4); MediaCodecs.resizePng(b, 4, 4)
      MediaCodecs.resampleWav(b, 4000)
      MediaCodecs.decodeRow(b)
      ()
    }
    // pure random buffers (occasionally magic-prefixed so the parsers
    // get past the signature check into the chunk walkers)
    val magics = Seq("RIFF", "GIF89a", "BM").map(_.getBytes("US-ASCII")) :+
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    for (i <- 0 until 300) {
      val body = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      mustNotThrow(if (i % 3 == 0) magics(rnd.nextInt(magics.size)) ++ body else body)
    }
    // bit-flip fuzz: valid files with one random byte corrupted must
    // parse to Some or None, never crash or hang
    val pal = Array((1, 2, 3), (250, 251, 252), (9, 9, 9), (200, 0, 100))
    val valids = Seq(
      pngBytes(5, 4, 2, Array.fill(4)(Array.fill(15)(rnd.nextInt(256).toByte)),
        Array(0, 1, 2, 3, 4)),
      gifBytes(5, 4, pal, Array.fill(20)(rnd.nextInt(4).toByte)),
      wavBytes(Seq.fill(64)(rnd.nextInt(65536).toShort), 8000),
      bmpBytes(Seq.fill(4)(Seq.fill(5)((rnd.nextInt(256), 0, 0)))))
    for (v <- valids; _ <- 0 until 200) {
      val m = v.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      mustNotThrow(m)
    }
  }

  test("decodeMedia degrades unknown payloads to octet-stream with size") {
    val df = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("id", "payload")
    val m = df.select(Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("m.mime"), col("m.size_bytes"), col("m.width")).collect().head
    assert(m.getString(0) == "application/octet-stream")
    assert(m.getLong(1) == 4L)
    assert(m.isNullAt(2))
  }

  test("decodeMedia degrades corrupt/adversarial headers, never hangs or crashes") {
    // WAV with a chunk size field >= 2^31 (negative as Int): must
    // terminate and classify as octet-stream, not loop re-reading the
    // same chunk header
    val evilWav = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evilWav.put("RIFF".getBytes); evilWav.putInt(56); evilWav.put("WAVE".getBytes)
    evilWav.put("fmt ".getBytes); evilWav.putInt(0xFFFFFFF8)
    // BMP with pixel offset 0x80000000 (negative as Int): must not
    // index out of bounds from inside the codegen'd expression
    val evilBmp = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evilBmp.put('B'.toByte); evilBmp.put('M'.toByte); evilBmp.putInt(64)
    evilBmp.putInt(0); evilBmp.putInt(0x80000000)
    evilBmp.putInt(40); evilBmp.putInt(1); evilBmp.putInt(1)
    evilBmp.putShort(1); evilBmp.putShort(24); evilBmp.putInt(0)
    // BMP whose width makes the stride overflow Int
    val evilBmp2 = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evilBmp2.put('B'.toByte); evilBmp2.put('M'.toByte); evilBmp2.putInt(64)
    evilBmp2.putInt(0); evilBmp2.putInt(54)
    evilBmp2.putInt(40); evilBmp2.putInt(0x7fffffff); evilBmp2.putInt(1)
    evilBmp2.putShort(1); evilBmp2.putShort(24); evilBmp2.putInt(0)
    // BMP with height = Int.MinValue: math.abs is still negative, so
    // the h == 0 check alone would let it through with bogus metadata
    val evilBmp3 = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evilBmp3.put('B'.toByte); evilBmp3.put('M'.toByte); evilBmp3.putInt(64)
    evilBmp3.putInt(0); evilBmp3.putInt(54)
    evilBmp3.putInt(40); evilBmp3.putInt(1); evilBmp3.putInt(0x80000000)
    evilBmp3.putShort(1); evilBmp3.putShort(24); evilBmp3.putInt(0)
    val df = Seq((1L, evilWav.array()), (2L, evilBmp.array()), (3L, evilBmp2.array()),
        (4L, evilBmp3.array()))
      .toDF("id", "payload")
    val mimes = df.select(Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("m.mime")).collect().map(_.getString(0))
    assert(mimes.forall(_ == "application/octet-stream"), mimes.toSeq)
  }

  test("synthMedia payloads are real containers; decode matches the arithmetic") {
    // the q34 contract: every decoded field must equal the closed-form
    // arithmetic the SQL oracle mirrors
    val df = Seq((10L, 100L), (7L, 33L)).toDF("id", "len")
    val rows = df.select(col("id"),
        Multimodal.decodeMedia(Multimodal.synthMedia(col("id"), col("len"))).as("m"))
      .select(col("id"), col("m.mime"), col("m.width"), col("m.height"),
        col("m.sample_rate"), col("m.n_samples"), col("m.duration_s"),
        col("m.rms"), col("m.mean_r"), col("m.mean_g"), col("m.mean_b"),
        col("m.size_bytes"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val wav = rows(10L) // even id -> WAV with n = 64 + 100 % 64 = 100 samples
    assert(wav.getString(1) == "audio/wav" && wav.getInt(4) == 8000 &&
      wav.getLong(5) == 100L && wav.getLong(11) == 44 + 200L)
    assert(math.abs(wav.getDouble(6) - 100.0 / 8000) < 1e-12)
    val expRms = math.sqrt((0 until 100).map { i =>
      val s = math.floorMod(10L * 131 + i * 17, 65536) - 32768
      val x = s / 32768.0; x * x
    }.sum / 100)
    assert(math.abs(wav.getDouble(7) - expRms) < 1e-12, s"rms ${wav.getDouble(7)} vs $expRms")
    val bmp = rows(7L) // odd id -> BMP w = 4 + 7%5 = 6, h = 3 + 7%4 = 6
    assert(bmp.getString(1) == "image/bmp" && bmp.getInt(2) == 6 && bmp.getInt(3) == 6)
    val expMeanR = (for (y <- 0 until 6; x <- 0 until 6)
      yield math.floorMod(7L * 7 + y * 31 + x * 13, 256).toDouble).sum / 36
    assert(math.abs(bmp.getDouble(8) - expMeanR) < 1e-12)
    val stride = ((6 * 3 + 3) / 4) * 4
    assert(bmp.getLong(11) == 54 + stride.toLong * 6)
  }

  test("FLAC round-trip: PCM bit-exact through every stereo decorrelation mode") {
    import graft.functions.Flac
    // deterministic stereo signal mixing smooth (fixed-predictor
    // friendly) and rough (verbatim-forcing) stretches; blockSize 64
    // over 512 frames = 8 FLAC frames cycling independent ->
    // left-side -> right-side -> mid-side twice
    val n = 512
    val left = Array.tabulate(n) { i =>
      if (i < 256) (8000 * math.sin(i / 10.0)).toInt.toShort
      else (((i * 2654435761L) % 60000) - 30000).toShort
    }
    val right = Array.tabulate(n) { i =>
      if (i < 256) (6000 * math.sin(i / 7.0) + 100).toInt.toShort
      else (((i * 40503L + 7) % 60000) - 30000).toShort
    }
    val interleaved = Array.tabulate(n * 2)(i => if (i % 2 == 0) left(i / 2) else right(i / 2))
    for (forceVerbatim <- Seq(false, true)) {
      val flac = Flac.encodeFlac(interleaved, channels = 2, sampleRate = 8000,
        blockSize = 64, forceVerbatim = forceVerbatim)
      val (ch, rate, pcm) = Flac.decodePcm(flac)
        .getOrElse(fail(s"decode failed (forceVerbatim=$forceVerbatim)"))
      assert(ch == 2 && rate == 8000)
      assert(pcm.toSeq == interleaved.map(_.toInt).toSeq,
        s"PCM mismatch (forceVerbatim=$forceVerbatim)")
    }
    // mono with constant stretches exercises CONSTANT subframes
    val mono = Array.tabulate(200)(i => if (i < 100) 1234.toShort else (i * 37 - 3000).toShort)
    val (chM, _, pcmM) = Flac.decodePcm(Flac.encodeFlac(mono, 1, 44100, blockSize = 100)).get
    assert(chM == 1 && pcmM.toSeq == mono.map(_.toInt).toSeq)
  }

  test("decodeMedia decodes FLAC: meta parity with the WAV tier on the same signal") {
    import graft.functions.Flac
    val rnd = new scala.util.Random(11)
    val samples = Array.tabulate(800)(i =>
      ((6000 * math.sin(i / 9.0)).toInt + rnd.nextInt(201) - 100).toShort)
    val flac = Flac.encodeFlac(samples, 1, 8000, blockSize = 128)
    val wav = wavBytes(samples.toSeq, 8000)
    val metas = Seq((1L, flac), (2L, wav)).toDF("id", "payload")
      .select(col("id"), Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("id"), col("m.mime"), col("m.channels"), col("m.sample_rate"),
        col("m.bits"), col("m.n_samples"), col("m.duration_s"), col("m.rms"), col("m.peak"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val (f, w) = (metas(1L), metas(2L))
    assert(f.getString(1) == "audio/flac" && w.getString(1) == "audio/wav")
    assert(f.getInt(2) == w.getInt(2) && f.getInt(3) == w.getInt(3) && f.getInt(4) == w.getInt(4))
    assert(f.getLong(5) == w.getLong(5))
    // lossless codec: the decoded signal statistics are IDENTICAL, not close
    assert(f.getDouble(6) == w.getDouble(6))
    assert(f.getDouble(7) == w.getDouble(7) && f.getDouble(8) == w.getDouble(8))
  }

  test("audioEmbedding parity: FLAC and WAV of one signal embed identically") {
    import graft.functions.{Flac, MediaCodecs}
    val rnd = new scala.util.Random(13)
    val base = Array.fill(600)((rnd.nextInt(60000) - 30000).toShort)
    val flac = Flac.encodeFlac(base, 1, 8000, blockSize = 100)
    val wav = wavBytes(base.toSeq, 8000)
    assert(MediaCodecs.audioHistogram(flac, 32).get.toSeq ==
      MediaCodecs.audioHistogram(wav, 32).get.toSeq,
      "lossless containers must histogram identically")
    // and through the Column surface, a FLAC copy pairs with its WAV twin
    val clips = Seq((1L, wav), (2L, flac),
        (3L, wavBytes(Array.tabulate(600)(i => (500 * math.sin(i / 5.0)).toInt.toShort).toSeq, 8000)))
      .toDF("clip_id", "payload")
      .withColumn("emb", Multimodal.audioEmbedding(col("payload")))
    val pairs = graft.operators.Similarity.exactPairs(
        clips.filter(col("emb").isNotNull), "clip_id", "emb", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected exactly the cross-container pair, got $pairs")
  }

  test("FLAC robustness: truncation and bit flips degrade to None, never throw") {
    import graft.functions.Flac
    val samples = Array.tabulate(300)(i => (3000 * math.sin(i / 6.0)).toInt.toShort)
    val valid = Flac.encodeFlac(samples, 1, 8000, blockSize = 64)
    assert(Flac.parseFlac(valid).isDefined)
    for (cut <- Seq(3, 10, 42, valid.length / 2, valid.length - 1))
      assert(Flac.parseFlac(valid.take(cut)).isEmpty, s"truncated at $cut must not parse")
    val rnd = new scala.util.Random(17)
    var caught = 0
    for (_ <- 0 until 200) {
      val b = valid.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      // CRC-8/16 make a frame-body flip a parse failure, not bad samples;
      // flips inside skipped metadata bytes may legitimately still decode
      if (Flac.parseFlac(b).isEmpty) caught += 1
    }
    assert(caught > 150, s"expected most single-bit flips rejected, got $caught/200")
  }

  test("MP4 PCM demux: sowt and twos tracks decode bit-identically to the WAV tier") {
    import graft.functions.{MediaCodecs, Mp4}
    val rnd = new scala.util.Random(19)
    val mono = Array.tabulate(700)(i =>
      ((5000 * math.sin(i / 8.0)).toInt + rnd.nextInt(401) - 200).toShort)
    val wavMeta = MediaCodecs.parseWav(wavBytes(mono.toSeq, 8000)).get
    for (be <- Seq(false, true)) {
      val mp4 = Mp4.encodeMp4Pcm(mono, channels = 1, sampleRate = 8000, bigEndian = be)
      val m = Mp4.parseIsobmff(mp4).getOrElse(fail(s"parse failed (bigEndian=$be)"))
      assert(m.mime == "audio/mp4" && m.channels.contains(1) &&
        m.sampleRate.contains(8000) && m.bits.contains(16))
      assert(m.nSamples.contains(700L))
      assert(m.durationS.exists(d => math.abs(d - 700.0 / 8000) < 1e-12))
      // lossless container: signal statistics IDENTICAL to the WAV tier
      assert(m.rms.contains(wavMeta.rms) && m.peak.contains(wavMeta.peak),
        s"rms/peak mismatch vs WAV (bigEndian=$be)")
    }
    // stereo interleave walks the same chunk map with 4-byte frames
    val stereo = Array.tabulate(400)(i => (i * 97 - 20000).toShort)
    val st = Mp4.parseIsobmff(Mp4.encodeMp4Pcm(stereo, channels = 2, sampleRate = 16000)).get
    assert(st.channels.contains(2) && st.nSamples.contains(200L))
    assert(st.rms.contains(MediaCodecs.parseWav(wavBytes(stereo.toSeq, 16000, channels = 2)).get.rms))
  }

  test("decodeMedia routes MP4 and AVIF: container metadata through the Column surface") {
    import graft.functions.Mp4
    val samples = Array.tabulate(500)(i => (4000 * math.sin(i / 11.0)).toInt.toShort)
    val mp4 = Mp4.encodeMp4Pcm(samples, 1, 8000)
    val avif = Mp4.encodeAvifMeta(640, 480, Array.fill[Byte](32)(0x5a))
    val rows = Seq((1L, mp4), (2L, avif)).toDF("id", "payload")
      .select(col("id"), Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("id"), col("m.mime"), col("m.width"), col("m.height"),
        col("m.channels"), col("m.sample_rate"), col("m.bits"), col("m.n_samples"),
        col("m.rms"), col("m.size_bytes"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = rows(1L)
    assert(a.getString(1) == "audio/mp4" && a.getInt(4) == 1 && a.getInt(5) == 8000 &&
      a.getInt(6) == 16 && a.getLong(7) == 500L && !a.isNullAt(8) &&
      a.getLong(9) == mp4.length.toLong)
    val v = rows(2L)
    // AVIF: real ispe/pixi metadata; the AV1 bitstream is the stub seam,
    // so signal/pixel stats stay null
    assert(v.getString(1) == "image/avif" && v.getInt(2) == 640 && v.getInt(3) == 480 &&
      v.getInt(4) == 3 && v.getInt(6) == 8 && v.isNullAt(8))
  }

  test("audioEmbedding parity across all three audio containers: WAV, FLAC, MP4") {
    import graft.functions.{Flac, MediaCodecs, Mp4}
    val rnd = new scala.util.Random(23)
    val base = Array.fill(600)((rnd.nextInt(60000) - 30000).toShort)
    val wav = wavBytes(base.toSeq, 8000)
    val flac = Flac.encodeFlac(base, 1, 8000, blockSize = 100)
    val mp4 = Mp4.encodeMp4Pcm(base, 1, 8000)
    val hw = MediaCodecs.audioHistogram(wav, 32).get.toSeq
    assert(MediaCodecs.audioHistogram(mp4, 32).get.toSeq == hw,
      "PCM-in-MP4 must histogram identically to WAV")
    assert(MediaCodecs.audioHistogram(flac, 32).get.toSeq == hw)
    // Column surface: all three containers of one signal pair with each other
    val clips = Seq((1L, wav), (2L, flac), (3L, mp4),
        (4L, wavBytes(Array.tabulate(600)(i => (500 * math.sin(i / 5.0)).toInt.toShort).toSeq, 8000)))
      .toDF("clip_id", "payload")
      .withColumn("emb", Multimodal.audioEmbedding(col("payload")))
    val pairs = graft.operators.Similarity.exactPairs(
        clips.filter(col("emb").isNotNull), "clip_id", "emb", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected the three cross-container pairs, got $pairs")
  }

  test("MP4 property sweep: mux+demux identity over lengths, channels, rates, endians") {
    import graft.functions.{MediaCodecs, Mp4}
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 40) {
      val channels = 1 + rnd.nextInt(3)
      val frames = 1 + rnd.nextInt(900)
      val rate = 1 + rnd.nextInt(65535)
      val be = rnd.nextBoolean()
      val pcm = Array.fill(frames * channels)((rnd.nextInt(65536) - 32768).toShort)
      val m = Mp4.parseIsobmff(Mp4.encodeMp4Pcm(pcm, channels, rate, be))
        .getOrElse(fail(s"trial $trial (ch=$channels n=$frames rate=$rate be=$be) did not parse"))
      assert(m.channels.contains(channels) && m.sampleRate.contains(rate) &&
        m.nSamples.contains(frames.toLong), s"trial $trial meta mismatch: $m")
      // signal stats must equal the direct computation over the array
      var sumSq = 0.0; var peak = 0.0
      pcm.foreach { s => val x = s / 32768.0; sumSq += x * x; val a = math.abs(x); if (a > peak) peak = a }
      val rms = math.sqrt(sumSq / pcm.length)
      assert(m.rms.exists(r => math.abs(r - rms) < 1e-12) &&
        m.peak.exists(p => math.abs(p - peak) < 1e-12), s"trial $trial stats mismatch")
      // and the histogram path streams the same samples
      val w = new Array[Int](1)
      Mp4.foreachSample(Mp4.encodeMp4Pcm(pcm, channels, rate, be))(_ => w(0) += 1)
        .getOrElse(fail(s"trial $trial foreachSample failed"))
      assert(w(0) == pcm.length)
    }
  }

  test("ISOBMFF garbage fuzz: arbitrary bytes behind an ftyp header never throw") {
    import graft.functions.{MediaCodecs, Mp4}
    val rnd = new scala.util.Random(37)
    for (_ <- 0 until 300) {
      val n = 12 + rnd.nextInt(400)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      // plant the magic so the ISOBMFF arm (not the octet fallback) runs
      b(4) = 'f'; b(5) = 't'; b(6) = 'y'; b(7) = 'p'
      if (rnd.nextBoolean()) { b(8) = 'a'; b(9) = 'v'; b(10) = 'i'; b(11) = 'f' }
      Mp4.parseIsobmff(b) // Option out, never a throw
      MediaCodecs.decodeRow(b)
    }
  }

  test("ISOBMFF robustness: truncation and random bit flips never throw") {
    import graft.functions.{MediaCodecs, Mp4}
    val samples = Array.tabulate(300)(i => (3000 * math.sin(i / 6.0)).toInt.toShort)
    val valid = Mp4.encodeMp4Pcm(samples, 1, 8000)
    assert(Mp4.parseIsobmff(valid).isDefined)
    for (cut <- Seq(3, 11, 40, valid.length / 2, valid.length - 1)) {
      val t = valid.take(cut)
      Mp4.parseIsobmff(t) match {
        case Some(m) =>
          // a cut inside trailing moov bytes may still expose partial
          // metadata, but never decoded signal stats from a bad map
          assert(m.rms.isEmpty || cut >= valid.length - 8, s"stats from truncated map at $cut")
        case None => ()
      }
      MediaCodecs.decodeRow(t) // must not throw, whatever tier it lands in
    }
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 300) {
      val b = valid.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      MediaCodecs.decodeRow(b) // box walker bounds-checks every size field
    }
    // an AVIF missing its ispe degrades to None, not a crash
    val avif = Mp4.encodeAvifMeta(64, 64, Array.fill[Byte](8)(1))
    val noIspe = new String(avif, "ISO-8859-1").replace("ispe", "xspe").getBytes("ISO-8859-1")
    assert(Mp4.parseIsobmff(noIspe).isEmpty)
  }

  test("decodeMedia parses ADTS AAC: frame walk, sample count, duration") {
    import graft.functions.Bitstream
    // even ids synthesize ADTS; spot-check the arithmetic end to end
    val m = Seq(6L, 14L).toDF("id")
      .select(col("id"), Multimodal.decodeMedia(Multimodal.synthBitstream(col("id"))).as("m"))
      .select(col("id"), col("m.mime"), col("m.channels"), col("m.sample_rate"),
        col("m.n_samples"), col("m.duration_s"), col("m.bits"), col("m.rms"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, r) <- m) {
      assert(r.getString(1) == "audio/aac")
      assert(r.getInt(2) == 1 + (id % 3).toInt)
      assert(r.getInt(3) == 44100)
      val frames = 2 + (id % 7)
      assert(r.getLong(4) == 1024L * frames)
      assert(math.abs(r.getDouble(5) - 1024.0 * frames / 44100) < 1e-12)
      assert(r.isNullAt(6) && r.isNullAt(7)) // no bit depth, no decoded signal
    }
    // CRC-present header (protection_absent = 0): 9-byte header parses
    val withCrc = {
      val frameLen = 9 + 4
      Array[Int](0xff, 0xf0, 0x50, 0x40 | ((frameLen >> 11) & 3),
        (frameLen >> 3) & 0xff, ((frameLen & 7) << 5) | 0x1f, 0xfc,
        0xab, 0xcd, 1, 2, 3, 4).map(_.toByte)
    }
    val crc = Bitstream.parseAdts(withCrc).get
    assert(crc.nFrames == 1 && crc.nSamples == 1024 && crc.sampleRate == 44100)
    // truncated mid-frame and mid-stream parameter changes are rejects
    assert(Bitstream.parseAdts(withCrc.dropRight(1)).isEmpty)
    val aac = {
      val udfBytes = Multimodal.synthBitstream(lit(6L))
      Seq(1).toDF("x").select(udfBytes.as("b")).head().getAs[Array[Byte]](0)
    }
    val drift = aac.clone()
    // second frame starts at frame 0's length; flip its freq index
    val f0len = ((aac(3) & 3) << 11) | ((aac(4) & 0xff) << 3) | ((aac(5) >> 5) & 7)
    drift(f0len + 2) = (drift(f0len + 2) ^ 0x04).toByte
    assert(Bitstream.parseAdts(drift).isEmpty)
  }

  test("decodeMedia parses IVF AV1: OBU sequence-header dims override the container") {
    import graft.functions.Bitstream
    // id ≡ 1 (mod 4): first frame carries a real sequence-header OBU;
    // id ≡ 3 (mod 4): temporal delimiter only → container dims
    val m = Seq(5L, 7L).toDF("id")
      .select(col("id"), Multimodal.decodeMedia(Multimodal.synthBitstream(col("id"))).as("m"))
      .select(col("id"), col("m.mime"), col("m.width"), col("m.height"),
        col("m.n_samples"), col("m.duration_s"), col("m.channels"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, r) <- m) {
      assert(r.getString(1) == "video/av1")
      assert(r.getInt(2) == 16 + (id % 17).toInt)
      assert(r.getInt(3) == 16 + (id * 3 % 17).toInt)
      val frames = 1 + (id % 4)
      assert(r.getLong(4) == frames)
      assert(math.abs(r.getDouble(5) - frames / 30.0) < 1e-12)
      assert(r.isNullAt(6)) // no audio fields on the video arm
    }
    // the OBU dims genuinely OVERRIDE: hand-build an IVF whose header
    // lies (container says 99x98, sequence header says 40x30)
    def ivf(fourcc: String, w: Int, h: Int, payloads: Seq[Array[Byte]]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(32 + payloads.map(12 + _.length).sum)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("DKIF".getBytes("US-ASCII")).putShort(0).putShort(32)
        .put(fourcc.getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
        .putInt(30).putInt(1).putInt(payloads.length).putInt(0)
      payloads.zipWithIndex.foreach { case (p, i) => bb.putInt(p.length).putLong(i.toLong).put(p) }
      bb.array()
    }
    val seqObu = {
      // reuse the production synth's OBU via a 40x30 id is impossible
      // (dims are id-derived), so build the same bit layout by hand
      val bits = new scala.collection.mutable.ArrayBuffer[Int]()
      def put(v: Int, n: Int): Unit = { var k = n - 1; while (k >= 0) { bits += (v >> k) & 1; k -= 1 } }
      put(0, 3); put(0, 1); put(0, 1); put(0, 1); put(0, 1); put(0, 5)
      put(0, 12); put(0, 5); put(15, 4); put(15, 4); put(39, 16); put(29, 16)
      while (bits.length % 8 != 0) bits += 0
      val payload = bits.grouped(8).map(_.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
      Array(0x0a.toByte, payload.length.toByte) ++ payload
    }
    val lying = Bitstream.parseIvf(ivf("AV01", 99, 98, Seq(seqObu))).get
    assert(lying.width == 40 && lying.height == 30 && lying.profile.contains(0))
    // VP9 fourcc maps through; unknown fourcc and frame-count lies reject
    assert(Bitstream.parseIvf(ivf("VP90", 320, 240, Seq(Array[Byte](1, 2)))).get.mime == "video/vp9")
    assert(Bitstream.parseIvf(ivf("XXXX", 320, 240, Seq(Array[Byte](1, 2)))).isEmpty)
    val countLie = ivf("AV01", 10, 10, Seq(Array[Byte](0x12, 0x00)))
    countLie(24) = 9 // declared frame count != walked
    assert(Bitstream.parseIvf(countLie).isEmpty)
    // declared count 0 is NOT a lie: real IVF writers commonly leave it
    // zero/stale, so the walk's count is trusted and the stream parses
    val countZero = ivf("AV01", 10, 10, Seq(Array[Byte](0x12, 0x00)))
    countZero(24) = 0
    val z = Bitstream.parseIvf(countZero).get
    assert(z.nFrames == 1 && z.width == 10 && z.height == 10)
    // a sequence header truncated EXACTLY at frame_width_bits_minus_1
    // (29 zero bits + pad = 4 bytes) must not fabricate 1x1 dims that
    // override the container — it rejects and falls back to IVF dims
    val truncObu = Array[Byte](0x0a, 4, 0, 0, 0, 0)
    val trunc = Bitstream.parseIvf(ivf("AV01", 99, 98, Seq(truncObu))).get
    assert(trunc.width == 99 && trunc.height == 98 && trunc.profile.isEmpty)
  }
}
