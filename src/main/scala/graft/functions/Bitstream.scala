package graft.functions

/** Compressed-BITSTREAM container metadata: the AAC and AV1 tiers of
  * the media seam, landed the way FLAC/MP4 landed — the CONTAINER
  * layer is parsed for real from the published specs, the entropy-
  * coded payload is not decoded (see [[graft.operators.Multimodal]]:
  * spectral/tile decode is permanently out of scope; a deployment
  * that needs PCM/pixels plugs a codec UDF into the documented seam).
  *
  * - ADTS AAC (ISO/IEC 14496-3 §1.A.2.2): fixed+variable header per
  *   frame — profile, sampling-frequency index, channel config, frame
  *   length, raw-data-block count.  Walking every frame yields the
  *   exact sample count (1024 per raw data block) and duration, the
  *   same real-metadata contract as the FLAC STREAMINFO tier.
  * - IVF (the de-facto AV1/VP8/VP9 test-stream container, 32-byte
  *   header + length-prefixed frames): fourcc → mime, header width/
  *   height, timebase → duration; every frame record is walked and
  *   the header's frame count cross-checked.
  * - AV1 OBU sequence header (AV1 spec §5.5): when the first IVF
  *   frame opens with a parseable low-overhead sequence header, its
  *   seq_profile and max frame dims are decoded bit-by-bit and
  *   OVERRIDE the IVF header dims (the normative source); streams
  *   with presentation timing or an encoder-specific header shape
  *   fall back to the IVF dims — honest, not guessed.
  */
object Bitstream {

  // ----------------------------------------------------------- ADTS AAC

  final case class AdtsMeta(profile: Int, sampleRate: Int, channels: Int,
                            nFrames: Int, nSamples: Long, durationS: Double)

  // ISO/IEC 14496-3 Table 1.16 (sampling_frequency_index)
  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** Parse an ADTS AAC stream by walking EVERY frame header; None on
    * anything that is not a complete, well-formed ADTS stream (the
    * magic-dispatch contract: misidentifying a payload corrupts the
    * whole decode row, so partial parses are rejects, not guesses). */
  def parseAdts(b: Array[Byte]): Option[AdtsMeta] = {
    def u(i: Int) = b(i) & 0xff
    if (b.length < 7 || u(0) != 0xff || (u(1) & 0xf0) != 0xf0) return None
    if ((u(1) & 0x06) != 0) return None // layer must be 00
    var off = 0
    var frames = 0
    var rawBlocks = 0L
    var profile = -1; var rateIdx = -1; var chans = -1
    while (off < b.length) {
      if (off + 7 > b.length) return None // truncated header
      if (u(off) != 0xff || (u(off + 1) & 0xf0) != 0xf0) return None
      val protectionAbsent = u(off + 1) & 1
      val p = (u(off + 2) >> 6) & 3
      val ri = (u(off + 2) >> 2) & 0xf
      val ch = ((u(off + 2) & 1) << 2) | ((u(off + 3) >> 6) & 3)
      if (ri >= AdtsRates.length || ch == 0) return None
      // all frames of one stream must agree (a mid-stream parameter
      // change is not a valid ADTS stream for this metadata contract)
      if (frames == 0) { profile = p; rateIdx = ri; chans = ch }
      else if (p != profile || ri != rateIdx || ch != chans) return None
      val frameLen = ((u(off + 3) & 3) << 11) | (u(off + 4) << 3) | ((u(off + 5) >> 5) & 7)
      val headerLen = if (protectionAbsent == 1) 7 else 9
      if (frameLen < headerLen || off + frameLen > b.length) return None
      rawBlocks += (u(off + 6) & 3) + 1 // raw_data_blocks_in_frame + 1
      frames += 1
      off += frameLen
    }
    if (frames == 0) None
    else {
      val rate = AdtsRates(rateIdx)
      val samples = rawBlocks * 1024L
      Some(AdtsMeta(profile + 1, rate, chans, frames, samples,
        samples.toDouble / rate))
    }
  }

  // ----------------------------------------------------------- IVF / AV1

  final case class IvfMeta(mime: String, width: Int, height: Int,
                           nFrames: Int, durationS: Double, profile: Option[Int])

  /** Parse an IVF container ("DKIF"): header metadata + a full walk of
    * the length-prefixed frame records (count cross-checked against
    * the header).  For AV01 payloads the first frame's OBUs are
    * scanned for a sequence header; its dims override the IVF ones. */
  def parseIvf(b: Array[Byte]): Option[IvfMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    if (b.length < 32) return None
    if (!(b(0) == 'D' && b(1) == 'K' && b(2) == 'I' && b(3) == 'F')) return None
    val headerSize = u16(6)
    if (u16(4) != 0 || headerSize < 32) return None
    val fourcc = new String(b, 8, 4, "US-ASCII")
    val mime = fourcc match {
      case "AV01" => "video/av1"
      case "VP90" => "video/vp9"
      case "VP80" => "video/vp8"
      case _ => return None
    }
    val (w, h) = (u16(12), u16(14))
    val den = u32(16); val num = u32(20) // IVF: time_base = num/den seconds
    val declared = u32(24)
    if (w == 0 || h == 0 || den == 0) return None
    // walk the frame records: u32 size + u64 pts + payload
    var off = headerSize
    var frames = 0
    var firstPayload: Array[Byte] = null
    while (off < b.length) {
      if (off + 12 > b.length) return None
      val sz = u32(off)
      if (sz < 0 || off + 12 + sz > b.length) return None
      if (frames == 0 && sz > 0)
        firstPayload = java.util.Arrays.copyOfRange(b, off + 12, off + 12 + sz.toInt)
      frames += 1
      off += 12 + sz.toInt
    }
    // real-world IVF writers commonly leave the header count 0 (it is
    // widely treated as unreliable): trust the frame walk then, and
    // keep the strict cross-check only against a NONZERO declaration
    if (frames == 0 || (declared != 0 && frames.toLong != declared)) return None
    val seq = if (mime == "video/av1" && firstPayload != null) av1SeqHeader(firstPayload) else None
    Some(IvfMeta(mime,
      seq.map(_._2).getOrElse(w), seq.map(_._3).getOrElse(h),
      frames, frames.toDouble * num / den, seq.map(_._1)))
  }

  /** Scan a frame's OBUs for a LOW-OVERHEAD sequence header (AV1 spec
    * §5.2/§5.5) and decode (seq_profile, max_width, max_height).
    * Returns None for any shape outside the simple broadcast profile
    * (timing info present, reduced still-picture, no size field) —
    * the caller then keeps the container dims. */
  private[functions] def av1SeqHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    var off = 0
    while (off < p.length) {
      val h = p(off) & 0xff
      if ((h & 0x80) != 0) return None // forbidden bit
      val obuType = (h >> 3) & 0xf
      val hasExt = (h & 4) != 0
      val hasSize = (h & 2) != 0
      if (!hasSize) return None // unsized OBU: cannot walk past it
      var i = off + 1 + (if (hasExt) 1 else 0)
      // leb128 size (spec §4.10.5), bounded to Int for a frame payload
      var size = 0L; var shift = 0
      var more = true
      while (more) {
        if (i >= p.length || shift > 28) return None
        val byte = p(i) & 0xff
        size |= (byte & 0x7fL) << shift
        more = (byte & 0x80) != 0
        shift += 7; i += 1
      }
      if (i + size > p.length) return None
      if (obuType == 1) { // OBU_SEQUENCE_HEADER
        return decodeSeqHeader(p, i, size.toInt)
      }
      off = i + size.toInt
    }
    None
  }

  /** Bit-exact decode of sequence_header_obu() down to the frame
    * size fields, for the simple shape only (see [[av1SeqHeader]]). */
  private def decodeSeqHeader(p: Array[Byte], start: Int, len: Int): Option[(Int, Int, Int)] = {
    var bitPos = start * 8
    val end = (start + len) * 8
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        if (bitPos >= end) return -1
        v = (v << 1) | ((p(bitPos >> 3) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1; k += 1
      }
      v
    }
    val profile = bits(3)
    val still = bits(1)
    val reduced = bits(1)
    if (profile < 0 || still < 0 || reduced != 0) return None
    val timingPresent = bits(1)
    if (timingPresent != 0) return None // decoder-model shapes: fall back
    val initialDisplay = bits(1)
    if (initialDisplay != 0) return None
    val opCnt = bits(5) // operating_points_cnt_minus_1
    if (opCnt != 0) return None
    if (bits(12) < 0) return None // operating_point_idc[0]
    val level = bits(5) // seq_level_idx[0]
    if (level < 0) return None
    if (level > 7 && bits(1) < 0) return None // seq_tier[0]
    val wb = bits(4)
    val hb = bits(4)
    // a payload exhausted exactly here would turn the -1 sentinel into
    // a 0-bit size read and fabricate 1×1 dims that then OVERRIDE the
    // container's — reject the truncation explicitly instead
    if (wb < 0 || hb < 0) return None
    val w = bits(wb + 1) + 1
    val h = bits(hb + 1) + 1
    if (w <= 0 || h <= 0) None else Some((profile, w, h))
  }
}
