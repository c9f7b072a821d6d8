package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.  Media payloads are opaque `binary` columns with a typed
  * metadata struct; the pipeline shape — schema, partitioning, batch
  * processing, frame explode — is real and tested.
  *
  * Decoding comes in two tiers:
  *  - [[decodeMedia]] is a REAL decoder for formats the JVM handles
  *    with no native codec — RIFF/WAVE PCM audio, FLAC (RFC 9639,
  *    [[graft.functions.Flac]]: fixed/LPC predictors, Rice residuals,
  *    all four stereo decorrelations, CRC-verified), 24-bit BMP, PNG
  *    (zlib via `java.util.zip.Inflater`), GIF, and JPEG in both
  *    sequential AND progressive/SOF2 modes (ITU-T T.81,
  *    [[graft.functions.Jpeg]]), and ISOBMFF containers (ISO/IEC
  *    14496-12, [[graft.functions.Mp4]]: MP4/M4A movie metadata,
  *    PCM-in-MP4 `sowt`/`twos` audio decode, AVIF `ispe`/`pixi` item
  *    properties) — implemented from the container
  *    specs in [[graft.functions.MediaCodecs]] (codegen'd Expression,
  *    runs executor-side with no native libs);
  *  - the compressed-BITSTREAM formats now also carry a REAL
  *    container/metadata layer ([[graft.functions.Bitstream]]): ADTS
  *    AAC streams have every frame header walked (exact sample count
  *    and duration), IVF AV1/VP9/VP8 containers yield dims, frame
  *    count and duration, with AV1's low-overhead sequence-header OBU
  *    decoded bit-by-bit when present.  Only the ENTROPY layer
  *    (AAC spectral data, AV1 tiles) is not decoded, and that is a
  *    PERMANENT design decision, not a pending item: a correct
  *    AAC/AV1 entropy decoder is a codec project, and every signal
  *    statistic it would feed (rms/peak/pixel means) already has its
  *    contract proven end-to-end by the lossless tiers (WAV, FLAC,
  *    PCM-in-MP4, BMP/PNG/GIF/JPEG).  A deployment that needs decoded
  *    samples plugs a codec UDF into `fakeDecodeMeta`'s documented
  *    seam — `binary => struct` with [[mediaMetaType]]'s shape — and
  *    no Spark-side contract (schema, partitioning, explode, batch
  *    shape) changes.
  */
object Multimodal {

  /** Real magic-byte decode: WAV/BMP payloads yield true metadata +
    * signal features (duration, RMS, pixel means); anything else
    * degrades to mime `application/octet-stream` + size. */
  def decodeMedia(payload: Column): Column =
    graft.functions.MediaCodecs.decode(payload)

  /** Metadata struct carried next to each payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("size_bytes", LongType)))

  /** STUB decoder: deterministic pseudo metadata from the payload
    * bytes (xxhash64-derived).  A real deployment replaces this Column
    * with a codec UDF of the same shape — `??? : (binary) => struct`. */
  def fakeDecodeMeta(payload: Column, mime: String = "image/fake"): Column =
    struct(
      lit(mime).as("mime"),
      (pmod(xxhash64(payload), lit(1920L)).cast(IntegerType) + 1).as("width"),
      (pmod(xxhash64(payload, lit(1)), lit(1080L)).cast(IntegerType) + 1).as("height"),
      (pmod(xxhash64(payload, lit(2)), lit(240L)).cast(IntegerType) + 1).as("n_frames"),
      length(payload).cast(LongType).as("size_bytes"))

  /** Attach payload + decoded metadata to any table with a binary (or
    * castable) column.  This is the ingest normalization step. */
  def withMedia(df: DataFrame, payload: Column, mime: String = "image/fake"): DataFrame =
    df.withColumn("payload", payload.cast(BinaryType))
      .withColumn("media", fakeDecodeMeta(col("payload"), mime))

  /** Deterministic synthetic media payloads for the decodable tier —
    * PURE INTEGER ARITHMETIC from (id, len), so a SQL oracle can
    * mirror the decoded metadata float-for-float (the healpix/q32
    * discipline): even ids build a 16-bit PCM mono WAV at 8000 Hz with
    * `64 + len mod 64` samples, sample_i = ((id·131 + i·17) mod 65536)
    * − 32768; odd ids a 24-bit BMP with w = 4 + id mod 5,
    * h = 3 + id mod 4, channel c ∈ {r=0, g=1, b=2} of pixel (x, y) =
    * (id·7 + y·31 + x·13 + c·97) mod 256.  The payloads are REAL
    * containers — the same bytes open in any external tool — so
    * [[decodeMedia]] exercises the production parsers, not fixtures.
    * UDF seam (shared with the codec tier): byte-buffer assembly has
    * no Column-function equivalent. */
  def synthMedia(id: Column, len: Column): Column = {
    val f = udf((idL: Long, lenL: Long) =>
      if (idL % 2 == 0) synthWav(idL, lenL) else synthBmp(idL))
    f(id, len)
  }

  /** Deterministic synthetic COMPRESSED-BITSTREAM containers for the
    * ADTS-AAC / IVF-AV1 metadata tier ([[graft.functions.Bitstream]]),
    * same pure-integer-arithmetic oracle discipline as [[synthMedia]]:
    * even ids build an ADTS AAC stream at 44100 Hz with
    * `1 + id mod 3` channels and `2 + id mod 7` frames (one raw data
    * block each → 1024·frames samples); odd ids an IVF AV01 container
    * with w = 16 + id mod 17, h = 16 + 3·id mod 17,
    * `1 + id mod 4` frames at timebase 1/30.  Odd ids ≡ 1 (mod 4)
    * carry a REAL low-overhead AV1 sequence-header OBU encoding the
    * SAME dims (exercising the bit-level OBU decode); ids ≡ 3 (mod 4)
    * carry only a temporal delimiter (exercising the container-dims
    * fallback) — both under one oracle.  Frame payloads are opaque by
    * design: the entropy layer is behind the seam. */
  def synthBitstream(id: Column): Column = {
    val f = udf((idL: Long) =>
      if (idL % 2 == 0) synthAdts(idL) else synthIvf(idL))
    f(id)
  }

  private def synthAdts(id: Long): Array[Byte] = {
    val channels = (1 + math.floorMod(id, 3)).toInt
    val frames = (2 + math.floorMod(id, 7)).toInt
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      val payload = (10 + math.floorMod(id + f, 5)).toInt
      val frameLen = 7 + payload
      out.write(0xff)
      out.write(0xf1) // MPEG-4, layer 00, protection_absent = 1
      out.write(0x40 | 0x10 | ((channels >> 2) & 1)) // AAC-LC, 44100
      out.write(((channels & 3) << 6) | ((frameLen >> 11) & 3))
      out.write((frameLen >> 3) & 0xff)
      out.write(((frameLen & 7) << 5) | 0x1f) // buffer fullness = VBR
      out.write(0xfc) // fullness low | one raw data block
      var j = 0
      while (j < payload) { out.write(math.floorMod(id * 31 + f * 7 + j, 256).toInt); j += 1 }
      f += 1
    }
    out.toByteArray
  }

  private def synthIvf(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 17)).toInt
    val h = (16 + math.floorMod(id * 3, 17)).toInt
    val frames = (1 + math.floorMod(id, 4)).toInt
    val frame0: Array[Byte] =
      if (math.floorMod(id, 4) == 1) av1SeqHeaderObu(w, h)
      else Array(0x12.toByte, 0x00.toByte) // temporal delimiter only
    val rest = (1 until frames).map(i => Array.tabulate(4 + (i % 3))(j =>
      math.floorMod(id * 13 + i * 5 + j, 256).toByte))
    val total = 32 + (frame0 +: rest).map(12 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("DKIF".getBytes("US-ASCII")).putShort(0).putShort(32)
      .put("AV01".getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
      .putInt(30).putInt(1) // timebase den = 30, num = 1
      .putInt(frames).putInt(0)
    var pts = 0L
    for (p <- frame0 +: rest) {
      bb.putInt(p.length).putLong(pts).put(p)
      pts += 1
    }
    bb.array()
  }

  /** A real low-overhead AV1 sequence-header OBU (spec §5.5) for the
    * simple broadcast shape, bit-packed by hand: profile 0, level 0,
    * 16-bit frame-size fields. */
  private def av1SeqHeaderObu(w: Int, h: Int): Array[Byte] = {
    val bits = new scala.collection.mutable.ArrayBuffer[Int]()
    def put(v: Int, n: Int): Unit = { var k = n - 1; while (k >= 0) { bits += (v >> k) & 1; k -= 1 } }
    put(0, 3)  // seq_profile
    put(0, 1)  // still_picture
    put(0, 1)  // reduced_still_picture_header
    put(0, 1)  // timing_info_present
    put(0, 1)  // initial_display_delay_present
    put(0, 5)  // operating_points_cnt_minus_1
    put(0, 12) // operating_point_idc[0]
    put(0, 5)  // seq_level_idx[0] (<= 7: no tier bit)
    put(15, 4) // frame_width_bits_minus_1
    put(15, 4) // frame_height_bits_minus_1
    put(w - 1, 16)
    put(h - 1, 16)
    while (bits.length % 8 != 0) bits += 0
    val payload = bits.grouped(8).map(_.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    Array(0x0a.toByte, payload.length.toByte) ++ payload // header + leb128 size
  }

  private def synthWav(id: Long, len: Long): Array[Byte] = {
    val n = (64 + math.floorMod(len, 64)).toInt
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) {
      bb.putShort((math.floorMod(id * 131 + i * 17, 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  private def synthBmp(id: Long): Array[Byte] = {
    val w = (4 + math.floorMod(id, 5)).toInt
    val h = (3 + math.floorMod(id, 4)).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(0).putInt(0).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def ch(c: Int): Byte = math.floorMod(id * 7 + y * 31 + x * 13 + c * 97, 256).toByte
        bb.put(ch(2)).put(ch(1)).put(ch(0)) // BMP stores b, g, r
        x += 1
      }
      var p = w * 3
      while (p < stride) { bb.put(0.toByte); p += 1 }
      y += 1
    }
    bb.array()
  }

  /** Deterministic fake frame sampling: slice the payload into
    * `maxFrames` equal chunks (stands in for video frame extraction),
    * exploded one row per frame with a stable frame index.  The
    * explode-then-process shape is the real contract: downstream
    * per-frame operators are ordinary row operators. */
  def explodeFrames(df: DataFrame, payloadCol: String, maxFrames: Int): DataFrame = {
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames " +
      "(0 would divide by zero and sequence() would run backwards)")
    val p = col(payloadCol)
    // ceil division so the frames tile the whole payload (last one short)
    val frameW = greatest(ceil(length(p).cast(DoubleType) / maxFrames).cast(IntegerType), lit(1))
    val frames = transform(
      sequence(lit(0), lit(maxFrames - 1)),
      i => substring(p, (i * frameW + 1).cast(IntegerType), frameW))
    df.select(col("*"), posexplode(frames).as(Seq("frame_id", "frame")))
      .filter(length(col("frame")) > 0)
  }

  /** Real resize for the decodable tier: 24-bit BMP payloads are
    * nearest-neighbor resampled to exactly (w, h) and re-encoded as
    * BMP; PNG payloads likewise, re-encoded as 8-bit RGB PNG (alpha
    * dropped, gray/palette expanded); baseline JPEG payloads decode,
    * resample, and re-encode as PNG (lossless — no second generation
    * loss).  Any other payload yields null (formats needing external
    * codecs — the documented stub seam).  Runs executor-side per row;
    * compose with [[decodeMedia]] downstream to verify the new
    * dimensions. */
  def resizeImage(payload: Column, w: Int, h: Int): Column = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) null
      else graft.functions.MediaCodecs.resizeBmp(b, w, h)
        .orElse(graft.functions.MediaCodecs.resizePng(b, w, h))
        .orElse(graft.functions.MediaCodecs.resizeJpeg(b, w, h)).orNull)
    f(payload)
  }

  /** Image-CONTENT embedding for multimodal dedup: concatenated
    * per-channel color histograms of any decodable image payload
    * (BMP/PNG/GIF/baseline JPEG), normalized to densities (each channel block sums
    * to 1) — `Array[Double]` of length 3·bins; null for non-image
    * payloads.  Pixel-identical images embed identically REGARDLESS
    * of container format, near-identical images land at cosine ≈ 1,
    * so the column feeds [[Similarity]]'s near-dup / ANN operators
    * (exactPairs, lshPairs, embeddingNearDup, bruteForceTopK)
    * unchanged — image dedup is embedding dedup after this
    * projection. */
  def imageEmbedding(payload: Column, bins: Int = 16): Column = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) null
      else graft.functions.MediaCodecs.imageHistogram(b, bins).map { hist =>
        val n = math.max(1L, hist.take(bins).sum).toDouble // pixels per channel block
        hist.map(_ / n)
      }.orNull)
    f(payload)
  }

  /** Audio-CONTENT embedding mirroring [[imageEmbedding]]: the
    * normalized amplitude histogram of any decodable WAV payload
    * (PCM16 / float32 / G.711), L1-normalized to densities
    * (`Array[Double]` of length `bins`); null for non-audio payloads.
    * Identical signals embed identically across sample encodings (up
    * to quantization), so audio near-dup composes with
    * [[Similarity]]'s operators exactly like image near-dup. */
  def audioEmbedding(payload: Column, bins: Int = 32): Column = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) null
      else graft.functions.MediaCodecs.audioHistogram(b, bins).map { hist =>
        val n = math.max(1L, hist.sum).toDouble
        hist.map(_ / n)
      }.orNull)
    f(payload)
  }

  /** Real audio resample for the decodable tier: PCM16 WAV payloads
    * are nearest-sample converted to `rate` Hz (channels preserved);
    * other payloads yield null. */
  def resampleAudio(payload: Column, rate: Int): Column = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) null
      else graft.functions.MediaCodecs.resampleWav(b, rate).orNull)
    f(payload)
  }

  /** Real feature extraction that needs no codec: the nibble histogram
    * of the payload — 16 counts over the hex expansion (2 hex digits
    * per byte), the per-item "embedding" of the binary modality.
    * Pure length/replace differencing over `hex(payload)`: exact,
    * codegen'd, no explode. */
  def byteStats(payload: Column): Column = {
    val h = lower(hex(payload))
    val counts = "0123456789abcdef".map { d =>
      (length(h) - length(replace(h, lit(d.toString), lit("")))).cast(LongType)
    }
    struct(
      length(payload).cast(LongType).as("n_bytes"),
      array(counts: _*).as("nibble_hist"))
  }

  /** Partition-batched processing (the Scala analog of mapInPandas
    * batches): process payloads per partition with a reusable
    * per-partition "codec" resource.  `decode` is the stub seam —
    * a real implementation would open the codec once per partition. */
  def mapBatches(ds: Dataset[(Long, Array[Byte])],
                 decode: Array[Byte] => (Int, Int)): Dataset[(Long, Int, Int)] = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaInt)
    ds.mapPartitions { it =>
      // per-partition setup happens here (codec open / model load)
      it.map { case (id, payload) =>
        val (w, h) = decode(payload)
        (id, w, h)
      }
    }
  }

  /** Deterministic stand-in decoder for tests and examples. */
  def stubDecode(payload: Array[Byte]): (Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1)
  }
}
