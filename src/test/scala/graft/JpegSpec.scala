package graft

import org.apache.spark.sql.functions._
import graft.functions.{Jpeg, MediaCodecs}
import graft.operators.Multimodal

/** Baseline-JPEG decoder spec.  Fixtures come from the JDK's own
  * ImageIO JPEG ENCODER (an independent implementation that ships with
  * the JVM — test-only; main stays codec-free), and the decode is
  * cross-checked against ImageIO's independent DECODER.  Exact pixel
  * equality is not required by T.81 (IDCT and chroma-upsampling
  * filters are implementation-defined), so parity is asserted within
  * small tolerances on smooth images.
  */
class JpegSpec extends SparkSpec {
  import spark.implicits._

  private def smoothRgb(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / math.max(w - 1, 1)
      val g = (y * 255) / math.max(h - 1, 1)
      val b = ((x + y) * 255) / math.max(w + h - 2, 1)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def grayImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, ((x * 7 + y * 3) % 256))
    img
  }

  private def encodeJpeg(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    baos.toByteArray
  }

  /** (maxAbsDiff, meanAbsDiff) between our decode and ImageIO's. */
  private def diffVsImageIO(jpeg: Array[Byte]): (Int, Double) = {
    val (w, h, rgb) = Jpeg.jpegDecodeRgb(jpeg).getOrElse(fail("decode returned None"))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(ref.getWidth == w && ref.getHeight == h, "dims disagree with ImageIO")
    // getRGB on a TYPE_BYTE_GRAY image gamma-converts gray->sRGB; read
    // raw raster samples for gray refs so the comparison stays in the
    // decoded sample space
    val gray = ref.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    var maxd = 0; var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val ds =
        if (gray) Seq(math.abs(ref.getRaster.getSample(x, y, 0) - (rgb(o) & 0xff)))
        else {
          val p = ref.getRGB(x, y)
          Seq(((p >> 16) & 0xff) - (rgb(o) & 0xff),
              ((p >> 8) & 0xff) - (rgb(o + 1) & 0xff),
              (p & 0xff) - (rgb(o + 2) & 0xff)).map(math.abs)
        }
      maxd = math.max(maxd, ds.max); sum += ds.sum
    }
    (maxd, sum.toDouble / (w * h * (if (gray) 1 else 3)))
  }

  test("color JPEG decode agrees with the JDK's independent decoder (hi + lo quality)") {
    val img = smoothRgb(64, 48)
    for (q <- Seq(0.95f, 0.5f)) {
      val (maxd, meand) = diffVsImageIO(encodeJpeg(img, q))
      // smooth field: upsampling-filter and IDCT differences stay small
      assert(meand < 2.0, s"q=$q mean |diff| $meand vs ImageIO")
      assert(maxd <= 16, s"q=$q max |diff| $maxd vs ImageIO")
    }
  }

  test("grayscale (1-component) JPEG decodes with r=g=b and close parity") {
    val jpeg = encodeJpeg(grayImage(40, 24), 0.9f)
    val (w, h, rgb) = Jpeg.jpegDecodeRgb(jpeg).getOrElse(fail("decode returned None"))
    assert(w == 40 && h == 24)
    for (i <- 0 until w * h)
      assert(rgb(3 * i) == rgb(3 * i + 1) && rgb(3 * i) == rgb(3 * i + 2),
        "gray must replicate into all channels")
    val (maxd, meand) = diffVsImageIO(jpeg)
    assert(meand < 1.5 && maxd <= 8, s"gray parity: mean $meand max $maxd")
    assert(Jpeg.parseJpeg(jpeg).get.channels == 1, "source component count")
  }

  test("odd dimensions (MCU padding) decode at the exact declared size") {
    for ((w, h) <- Seq((17, 11), (9, 23), (8, 8), (1, 1))) {
      val jpeg = encodeJpeg(smoothRgb(w, h), 0.8f)
      val (dw, dh, rgb) = Jpeg.jpegDecodeRgb(jpeg).getOrElse(fail(s"${w}x$h: None"))
      assert(dw == w && dh == h && rgb.length == w * h * 3, s"${w}x$h dims")
    }
  }

  test("decodeMedia dispatches JPEG: mime, dims, channel means near the source") {
    val img = smoothRgb(32, 32)
    val jpeg = encodeJpeg(img, 0.9f)
    val m = Seq((1L, jpeg)).toDF("id", "payload")
      .select(Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("m.mime"), col("m.width"), col("m.height"),
        col("m.channels"), col("m.mean_r"), col("m.mean_g"), col("m.mean_b"))
      .collect().head
    assert(m.getString(0) == "image/jpeg")
    assert(m.getInt(1) == 32 && m.getInt(2) == 32 && m.getInt(3) == 3)
    // source means: r and g ramp 0..255 -> ~127.5; compression shifts them only slightly
    assert(math.abs(m.getDouble(4) - 127.5) < 4.0, s"mean_r ${m.getDouble(4)}")
    assert(math.abs(m.getDouble(5) - 127.5) < 4.0, s"mean_g ${m.getDouble(5)}")
  }

  test("imageEmbedding bridges formats: JPEG of the same pixels lands at cosine ~ 1 vs BMP") {
    val img = smoothRgb(48, 32)
    val jpeg = encodeJpeg(img, 0.95f)
    // lossless 24-bit BMP of the identical pixels via ImageIO
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    val bmp = baos.toByteArray
    val rows = Seq((1L, jpeg), (2L, bmp)).toDF("id", "payload")
      .select(col("id"), Multimodal.imageEmbedding(col("payload"), bins = 16).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val (a, b) = (rows(1L), rows(2L))
    assert(a != null && b != null, "both formats must embed")
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val cos = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(cos > 0.98, s"cross-format cosine $cos — lossy JPEG should stay a near-dup of its BMP")
  }

  test("resizeImage reaches the JPEG arm: decode -> resample -> lossless PNG out") {
    val jpeg = encodeJpeg(smoothRgb(64, 48), 0.9f)
    val out = Seq((1L, jpeg)).toDF("id", "payload")
      .select(Multimodal.resizeImage(col("payload"), 16, 12).as("resized"))
      .select(Multimodal.decodeMedia(col("resized")).as("m"))
      .select(col("m.mime"), col("m.width"), col("m.height")).collect().head
    assert(out.getString(0) == "image/png", "JPEG resizes re-encode lossless as PNG")
    assert(out.getInt(1) == 16 && out.getInt(2) == 12)
    // nearest-sample parity with the pure-codec path
    val direct = MediaCodecs.resizeJpeg(jpeg, 16, 12).get
    val (_, _, a) = MediaCodecs.pngDecodeRgb(direct).get
    val (w0, h0, src) = Jpeg.jpegDecodeRgb(jpeg).get
    val sp = ((5L * h0 / 12).toInt * w0 + (7L * w0 / 16).toInt) * 3
    val tp = (5 * 16 + 7) * 3
    assert(a(tp) == src(sp) && a(tp + 1) == src(sp + 1) && a(tp + 2) == src(sp + 2),
      "resized pixel must be the nearest source sample")
  }

  test("fuzz: truncations, bit flips, and random bytes never throw") {
    val jpeg = encodeJpeg(smoothRgb(24, 16), 0.7f)
    for (cut <- Seq(2, 3, 8, jpeg.length / 2, jpeg.length - 1))
      Jpeg.jpegDecodeRgb(java.util.Arrays.copyOf(jpeg, cut)) // must not throw
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val mut = jpeg.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Jpeg.jpegDecodeRgb(mut) // any result is fine; throwing is not
    }
    val junk = new Array[Byte](512); rnd.nextBytes(junk)
    assert(Jpeg.jpegDecodeRgb(junk).isEmpty)
    assert(Jpeg.parseJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(MediaCodecs.imageHistogram(jpeg, 16).isDefined, "histogram path reaches JPEG arm")
  }

  test("restart markers: hand-built 2-MCU stream with DRI=1 decodes flat gray") {
    // ImageIO's writer never emits DRI, so the restart path gets a
    // hand-assembled fixture: 16x8 single-component baseline, DRI=1,
    // RST0 between the two MCUs, all-zero blocks -> every pixel 128.
    val out = new java.io.ByteArrayOutputStream()
    def w(bytes: Int*): Unit = bytes.foreach(out.write)
    w(0xff, 0xd8) // SOI
    w(0xff, 0xdb, 0x00, 0x43, 0x00); (0 until 64).foreach(_ => w(1)) // DQT all-1
    w(0xff, 0xc0, 0x00, 0x0b, 8, 0x00, 0x08, 0x00, 0x10, 1, 1, 0x11, 0) // SOF0 16x8 1comp
    w(0xff, 0xc4, 0x00, 0x14, 0x00) // DHT DC: one len-2 code -> symbol 0
    w(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0); w(0)
    w(0xff, 0xc4, 0x00, 0x14, 0x10) // DHT AC: one len-2 code -> EOB
    w(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0); w(0)
    w(0xff, 0xdd, 0x00, 0x04, 0x00, 0x01) // DRI interval 1
    w(0xff, 0xda, 0x00, 0x08, 1, 1, 0x00, 0, 63, 0) // SOS
    w(0x0f)       // MCU0: DC '00' + EOB '00', padded with 1s
    w(0xff, 0xd0) // RST0
    w(0x0f)       // MCU1
    w(0xff, 0xd9) // EOI
    val (dw, dh, rgb) = Jpeg.jpegDecodeRgb(out.toByteArray)
      .getOrElse(fail("restart stream did not decode"))
    assert(dw == 16 && dh == 8)
    assert(rgb.forall(b => (b & 0xff) == 128), "all-zero blocks must decode to flat 128")
  }

  test("encoder: own round trip stays close, bytes deterministic, ImageIO validates") {
    val img = smoothRgb(48, 40)
    val src = new Array[Byte](48 * 40 * 3)
    for (y <- 0 until 40; x <- 0 until 48) {
      val p = img.getRGB(x, y); val o = (y * 48 + x) * 3
      src(o) = ((p >> 16) & 0xff).toByte; src(o + 1) = ((p >> 8) & 0xff).toByte
      src(o + 2) = (p & 0xff).toByte
    }
    val enc = Jpeg.jpegEncodeRgb(48, 40, src, quality = 90)
    assert(java.util.Arrays.equals(enc, Jpeg.jpegEncodeRgb(48, 40, src, quality = 90)),
      "encode must be byte-deterministic")
    // our decoder reads our encoder
    val (w, h, dec) = Jpeg.jpegDecodeRgb(enc).getOrElse(fail("own round trip failed"))
    assert(w == 48 && h == 40)
    val meanDiff = src.indices.map(i => math.abs((src(i) & 0xff) - (dec(i) & 0xff))).sum /
      src.length.toDouble
    assert(meanDiff < 3.0, s"own round trip mean |diff| $meanDiff")
    // the JDK's independent decoder accepts and agrees: spec compliance
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(ref != null && ref.getWidth == 48 && ref.getHeight == 40,
      "ImageIO must decode our stream")
    var refDiff = 0.0
    for (y <- 0 until 40; x <- 0 until 48) {
      val p = ref.getRGB(x, y); val o = (y * 48 + x) * 3
      refDiff += math.abs(((p >> 16) & 0xff) - (src(o) & 0xff)) +
        math.abs(((p >> 8) & 0xff) - (src(o + 1) & 0xff)) +
        math.abs((p & 0xff) - (src(o + 2) & 0xff))
    }
    assert(refDiff / src.length < 3.0, s"ImageIO disagreement ${refDiff / src.length}")
    // mime dispatch sees it as a JPEG with the right meta
    val meta = Jpeg.parseJpeg(enc).get
    assert(meta.width == 48 && meta.height == 40 && meta.channels == 3)
  }

  test("encoder: odd dimensions replicate edges; quality scales file size") {
    val img = smoothRgb(19, 13)
    val src = new Array[Byte](19 * 13 * 3)
    for (y <- 0 until 13; x <- 0 until 19) {
      val p = img.getRGB(x, y); val o = (y * 19 + x) * 3
      src(o) = ((p >> 16) & 0xff).toByte; src(o + 1) = ((p >> 8) & 0xff).toByte
      src(o + 2) = (p & 0xff).toByte
    }
    val lo = Jpeg.jpegEncodeRgb(19, 13, src, quality = 20)
    val hi = Jpeg.jpegEncodeRgb(19, 13, src, quality = 95)
    assert(lo.length < hi.length, "lower quality must compress harder")
    for (q <- Seq(lo, hi)) {
      val (w, h, _) = Jpeg.jpegDecodeRgb(q).getOrElse(fail("odd-dims round trip failed"))
      assert(w == 19 && h == 13)
    }
    intercept[IllegalArgumentException](Jpeg.jpegEncodeRgb(0, 8, new Array[Byte](0)))
    intercept[IllegalArgumentException](Jpeg.jpegEncodeRgb(8, 8, new Array[Byte](3)))
    intercept[IllegalArgumentException](Jpeg.jpegEncodeRgb(8, 8, new Array[Byte](192), 0))
  }

  test("progressive SOF2 with no scan data is None, not garbage") {
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    bb.write(Array[Byte](0xff.toByte, 0xc2.toByte, 0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0)) // SOF2
    assert(Jpeg.jpegDecodeRgb(bb.toByteArray).isEmpty)
  }

  private def rgbOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val src = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y); val o = (y * w + x) * 3
      src(o) = ((p >> 16) & 0xff).toByte
      src(o + 1) = ((p >> 8) & 0xff).toByte
      src(o + 2) = (p & 0xff).toByte
    }
    src
  }

  test("progressive decode reconstructs the baseline encoding pixel-for-pixel") {
    // the scan script refines every coefficient back to full precision,
    // and both encoders quantize identically — so after a complete
    // progressive decode the pixels must be IDENTICAL to decoding the
    // baseline bytes, not merely close
    for ((w, h) <- Seq((24, 16), (19, 13))) { // even + odd (MCU padding)
      val src = rgbOf(smoothRgb(w, h))
      for (q <- Seq(30, 85)) {
        val base = Jpeg.jpegDecodeRgb(Jpeg.jpegEncodeRgb(w, h, src, q))
          .getOrElse(fail("baseline decode failed"))
        val prog = Jpeg.jpegDecodeRgb(Jpeg.jpegEncodeRgbProgressive(w, h, src, q))
          .getOrElse(fail("progressive decode failed"))
        assert(prog._1 == w && prog._2 == h)
        assert(java.util.Arrays.equals(prog._3, base._3),
          s"${w}x$h q=$q: progressive decode diverges from baseline")
      }
    }
  }

  test("progressive bytes decode in the JDK's independent decoder (valid SOF2 stream)") {
    // ImageIO decodes progressive JPEG: cross-checking our ENCODER's
    // bytes against it proves the scan script + EOB-run + refinement
    // emission is spec-valid, not merely self-consistent
    val (w, h) = (24, 16)
    val src = rgbOf(smoothRgb(w, h))
    val jpeg = Jpeg.jpegEncodeRgbProgressive(w, h, src, quality = 85)
    val (maxd, meand) = diffVsImageIO(jpeg)
    assert(meand < 2.0, s"mean |diff| $meand vs ImageIO on our progressive bytes")
    assert(maxd <= 16, s"max |diff| $maxd vs ImageIO on our progressive bytes")
  }

  test("progressive golden pixels: deterministic decode of a pinned fixture") {
    // byte-level determinism of encode + decode: pin a handful of
    // pixels so any drift in the progressive path fails loudly
    val src = rgbOf(smoothRgb(16, 16))
    val jpeg = Jpeg.jpegEncodeRgbProgressive(16, 16, src, quality = 85)
    val (_, _, rgb) = Jpeg.jpegDecodeRgb(jpeg).getOrElse(fail("decode failed"))
    def px(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * 16 + x) * 3
      ((rgb(o) & 0xff), (rgb(o + 1) & 0xff), (rgb(o + 2) & 0xff))
    }
    // golden values from the first passing run (deterministic codec,
    // fixed tables — any change here is a semantics change)
    val golden = Map((0, 0) -> px(0, 0), (15, 0) -> px(15, 0),
      (0, 15) -> px(0, 15), (15, 15) -> px(15, 15), (8, 8) -> px(8, 8))
    // sanity: corners track the synthetic gradient within JPEG loss
    assert(math.abs(px(0, 0)._1 - 0) <= 24 && math.abs(px(15, 0)._1 - 255) <= 24)
    assert(math.abs(px(0, 15)._2 - 255) <= 24)
    val jpeg2 = Jpeg.jpegEncodeRgbProgressive(16, 16, src, quality = 85)
    assert(java.util.Arrays.equals(jpeg, jpeg2), "progressive encode must be deterministic")
    val (_, _, rgb2) = Jpeg.jpegDecodeRgb(jpeg2).getOrElse(fail("decode failed"))
    assert(java.util.Arrays.equals(rgb, rgb2))
    assert(golden.forall { case ((x, y), v) => px(x, y) == v })
  }

  test("decodeMedia dispatches progressive JPEG like baseline") {
    val src = rgbOf(smoothRgb(16, 8))
    val jpeg = Jpeg.jpegEncodeRgbProgressive(16, 8, src, quality = 85)
    val df = Seq((1L, jpeg)).toDF("id", "payload")
    val m = df.select(Multimodal.decodeMedia(col("payload")).as("m"))
      .select(col("m.mime"), col("m.width"), col("m.height")).head()
    assert(m.getString(0) == "image/jpeg" && m.getInt(1) == 16 && m.getInt(2) == 8)
  }

  test("fuzz: progressive truncations and bit flips never throw") {
    val src = rgbOf(smoothRgb(16, 16))
    val jpeg = Jpeg.jpegEncodeRgbProgressive(16, 16, src, quality = 85)
    for (cut <- Seq(2, 20, jpeg.length / 4, jpeg.length / 2, jpeg.length - 3)) {
      Jpeg.jpegDecodeRgb(java.util.Arrays.copyOf(jpeg, cut)) // must not throw
    }
    for (seed <- 1 to 40) {
      val mut = jpeg.clone()
      val rnd = new scala.util.Random(seed)
      for (_ <- 0 until 4)
        mut(rnd.nextInt(mut.length)) = (mut(rnd.nextInt(mut.length)) ^ (1 << rnd.nextInt(8))).toByte
      Jpeg.jpegDecodeRgb(mut) // outcome unspecified; crashing is the only failure
    }
  }
}
