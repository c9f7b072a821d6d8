package graft.functions

/** ISO Base Media File Format (ISO/IEC 14496-12) container parsing —
  * the MP4 / AVIF arm of the media tier, pure JVM, written from the
  * published box grammar (u32 big-endian size + fourcc, `size == 1` →
  * 64-bit largesize, `size == 0` → to end of enclosing box; FullBox =
  * 4 extra version/flags bytes).
  *
  * Two tiers, matching [[MediaCodecs]]' contract:
  *  - REAL metadata for any well-formed MP4/M4A (`moov` walk: mvhd
  *    timescale/duration, vide-track tkhd dimensions, soun-track stsd
  *    sample description) and AVIF/HEIF (`meta`/`iprp`/`ipco` walk:
  *    ispe dimensions, pixi channel layout);
  *  - REAL sample decode for PCM-in-MP4 audio (QuickTime `sowt`
  *    little-endian / `twos` big-endian 16-bit sample entries,
  *    streamed through the stsc/stsz/stco chunk maps) → RMS / peak /
  *    amplitude histogram, the same normalized-signal stream as the
  *    WAV and FLAC tiers, so one signal embeds identically in all
  *    three containers.
  *
  * Compressed BITSTREAM payloads (AAC in MP4, AV1 in AVIF) stay
  * behind the documented stub seam — their rows carry real container
  * metadata with null signal stats ([[graft.operators.Multimodal]]).
  *
  * Reference behavior mirrored: ezdata treats media payloads as
  * opaque bytes; this tier is the beyond-reference LLM-pipeline
  * extension (SURVEY.md §2 multimodal rows).
  */
object Mp4 {

  private def u16(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
  private def u32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
  private def u64(b: Array[Byte], at: Int): Long =
    (u32(b, at) << 32) | u32(b, at + 4)
  private def fourcc(b: Array[Byte], at: Int): String =
    new String(b, at, 4, "ISO-8859-1")

  /** Walk the boxes in `[start, end)`, calling `f(type, payloadStart,
    * payloadEnd)` for each.  Malformed sizes (smaller than the header,
    * overrunning `end`) abort the walk: `false` return = corrupt. */
  private def foreachBox(b: Array[Byte], start: Int, end: Int)
                        (f: (String, Int, Int) => Unit): Boolean = {
    var at = start
    while (at < end) {
      if (at + 8 > end) return false
      var size = u32(b, at)
      val typ = fourcc(b, at + 4)
      var hdr = 8
      if (size == 1) {
        if (at + 16 > end) return false
        size = u64(b, at + 8); hdr = 16
      } else if (size == 0) size = (end - at).toLong
      if (size < hdr || at + size > end) return false
      f(typ, at + hdr, at + size.toInt)
      at += size.toInt
    }
    true
  }

  /** First child box of the given type, as (payloadStart, payloadEnd). */
  private def findBox(b: Array[Byte], start: Int, end: Int, typ: String): Option[(Int, Int)] = {
    var hit: Option[(Int, Int)] = None
    foreachBox(b, start, end) { (t, ps, pe) => if (hit.isEmpty && t == typ) hit = Some((ps, pe)) }
    hit
  }

  /** Decoded container facts; fields follow [[MediaCodecs.mediaType]]
    * semantics (null → Option.empty here). */
  final case class IsobmffMeta(mime: String,
                               width: Option[Int], height: Option[Int],
                               channels: Option[Int], sampleRate: Option[Int],
                               bits: Option[Int], nSamples: Option[Long],
                               durationS: Option[Double],
                               rms: Option[Double], peak: Option[Double])

  /** True when the payload leads with a plausible ISOBMFF `ftyp`. */
  def looksIsobmff(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 4) == "ftyp"

  /** Magic-byte entry point: AVIF brands route to the item-property
    * walk, everything else to the movie walk. */
  def parseIsobmff(b: Array[Byte]): Option[IsobmffMeta] =
    try {
      if (!looksIsobmff(b)) None
      else {
        val brand = fourcc(b, 8)
        if (brand == "avif" || brand == "avis") parseAvif(b)
        else parseMovie(b)
      }
    } catch { case _: Exception => None }

  // ------------------------------------------------------------- AVIF

  /** AVIF / HEIF still image: dimensions from the `ispe` item
    * property, channel layout from `pixi`.  The AV1 bitstream in
    * `mdat` is NOT decoded (stub seam) — means stay null upstream. */
  private def parseAvif(b: Array[Byte]): Option[IsobmffMeta] =
    for {
      (ms, me) <- findBox(b, 0, b.length, "meta")
      (ps, pe) <- findBox(b, ms + 4, me, "iprp") // meta is a FullBox
      (cs, ce) <- findBox(b, ps, pe, "ipco")
      (is, ie) <- findBox(b, cs, ce, "ispe")
      // the ispe payload must actually span version/flags + w + h —
      // a short box would read the SIBLING box's header bytes as
      // dimensions; dims must also fit a positive Int
      if ie - is >= 12 && u32(b, is + 4) > 0 && u32(b, is + 4) <= Int.MaxValue &&
        u32(b, is + 8) > 0 && u32(b, is + 8) <= Int.MaxValue
    } yield {
      val w = u32(b, is + 4).toInt // ispe FullBox: version/flags, then w, h
      val h = u32(b, is + 8).toInt
      val (nCh, bits) = findBox(b, cs, ce, "pixi") match {
        case Some((xs, xe)) if xs + 5 <= xe =>
          val n = b(xs + 4) & 0xff
          (Some(n), if (xs + 5 + 1 <= xe) Some(b(xs + 5) & 0xff) else None)
        case _ => (None, None)
      }
      IsobmffMeta("image/avif", Some(w), Some(h), nCh, None, bits,
        None, None, None, None)
    }

  // -------------------------------------------------------------- MP4

  private final case class AudioTrack(format: String, channels: Int, bits: Int,
                                      rate: Int, mdhdTimescale: Long, mdhdDuration: Long,
                                      stblStart: Int, stblEnd: Int)

  /** Movie walk: mvhd presentation duration; first video track's tkhd
    * dimensions; first audio track's stsd sample description; PCM
    * signal stats when the audio codec is `sowt`/`twos` 16-bit. */
  private def parseMovie(b: Array[Byte]): Option[IsobmffMeta] = {
    val moov = findBox(b, 0, b.length, "moov").getOrElse(return None)

    // presentation duration from mvhd (v0: 32-bit fields, v1: 64-bit)
    val duration: Option[Double] = findBox(b, moov._1, moov._2, "mvhd").flatMap { case (ps, _) =>
      val v = b(ps) & 0xff
      val (ts, dur) =
        if (v == 1) (u32(b, ps + 20), u64(b, ps + 24)) else (u32(b, ps + 12), u32(b, ps + 16))
      if (ts > 0) Some(dur.toDouble / ts) else None
    }

    var videoDims: Option[(Int, Int)] = None
    var videoSamples: Option[Long] = None
    var audio: Option[AudioTrack] = None

    foreachBox(b, moov._1, moov._2) { (t, ps, pe) =>
      if (t == "trak") {
        val handler = for {
          (mds, mde) <- findBox(b, ps, pe, "mdia")
          (hs, _)    <- findBox(b, mds, mde, "hdlr")
        } yield fourcc(b, hs + 8) // FullBox + pre_defined, then handler_type
        handler match {
          case Some("vide") if videoDims.isEmpty =>
            // tkhd: width/height are 16.16 fixed at the tail of the box
            findBox(b, ps, pe, "tkhd").foreach { case (ts0, te) =>
              val v = b(ts0) & 0xff
              val at = ts0 + (if (v == 1) 88 else 76)
              if (at + 8 <= te)
                videoDims = Some(((u32(b, at) >> 16).toInt, (u32(b, at + 4) >> 16).toInt))
            }
            videoSamples = for {
              (mds, mde) <- findBox(b, ps, pe, "mdia")
              (mis, mie) <- findBox(b, mds, mde, "minf")
              (sts, ste) <- findBox(b, mis, mie, "stbl")
              (szs, _)   <- findBox(b, sts, ste, "stsz")
            } yield u32(b, szs + 8) // sample_count (frames)
          case Some("soun") if audio.isEmpty =>
            audio = for {
              (mds, mde) <- findBox(b, ps, pe, "mdia")
              (mhs, _)   <- findBox(b, mds, mde, "mdhd")
              (mis, mie) <- findBox(b, mds, mde, "minf")
              (sts, ste) <- findBox(b, mis, mie, "stbl")
              (sds, sde) <- findBox(b, sts, ste, "stsd")
              entry      <- {
                // stsd FullBox: entry_count, then the first sample entry
                val es = sds + 8
                if (es + 8 <= sde && u32(b, es) >= 36) Some(es) else None
              }
            } yield {
              val fmt = fourcc(b, entry + 4)
              // AudioSampleEntry: 6 reserved + 2 data_ref, then
              // version/rev/vendor (8), channels, samplesize, pre (4), rate 16.16
              val fs = entry + 8 + 8 // past the entry header + SampleEntry fields
              val channels = u16(b, fs + 8)
              val bits = u16(b, fs + 10)
              val rate = (u32(b, fs + 16) >> 16).toInt
              val mv = b(mhs) & 0xff
              val (mts, mdur) =
                if (mv == 1) (u32(b, mhs + 20), u64(b, mhs + 24))
                else (u32(b, mhs + 12), u32(b, mhs + 16))
              AudioTrack(fmt, channels, bits, rate, mts, mdur, sts, ste)
            }
          case _ => ()
        }
      }
    }

    if (videoDims.isEmpty && audio.isEmpty) return None

    val mime = if (videoDims.isDefined) "video/mp4" else "audio/mp4"
    val (nSamples, rms, peak) = audio match {
      case Some(a) =>
        val frames =
          if (a.mdhdTimescale == a.rate && a.rate > 0) Some(a.mdhdDuration)
          else if (a.mdhdTimescale > 0 && a.rate > 0)
            Some(math.round(a.mdhdDuration.toDouble / a.mdhdTimescale * a.rate))
          else None
        if ((a.format == "sowt" || a.format == "twos") && a.bits == 16) {
          var sumSq = 0.0; var pk = 0.0; var n = 0L
          val ok = foreachPcmSample(b, a) { s =>
            sumSq += s * s; val x = math.abs(s); if (x > pk) pk = x; n += 1
          }
          if (ok && n > 0)
            (frames.orElse(Some(n / math.max(1, a.channels))),
              Some(math.sqrt(sumSq / n)), Some(pk))
          else (frames, None, None)
        } else (frames, None, None) // compressed bitstream: stub seam
      case None => (videoSamples, None, None)
    }

    Some(IsobmffMeta(mime,
      videoDims.map(_._1), videoDims.map(_._2),
      audio.map(_.channels), audio.map(_.rate).filter(_ > 0), audio.map(_.bits),
      nSamples, duration, rms, peak))
  }

  /** Stream every normalized PCM sample of a `sowt`/`twos` audio track
    * through `f`, walking the stsc/stsz/stco chunk maps exactly as a
    * demuxer would.  `true` when the maps were well-formed and every
    * referenced byte range fit the payload. */
  private def foreachPcmSample(b: Array[Byte], a: AudioTrack)(f: Double => Unit): Boolean = {
    val little = a.format == "sowt"
    val res = for {
      (szs, sze) <- findBox(b, a.stblStart, a.stblEnd, "stsz")
      (scs, sce) <- findBox(b, a.stblStart, a.stblEnd, "stsc")
      co <- findBox(b, a.stblStart, a.stblEnd, "stco").map((_, false))
        .orElse(findBox(b, a.stblStart, a.stblEnd, "co64").map((_, true)))
    } yield {
      val ((cos, coe), wide) = co
      val constSize = u32(b, szs + 4).toInt
      val sampleCount = u32(b, szs + 8)
      val nChunks = u32(b, cos + 4).toInt
      val nRuns = u32(b, scs + 4).toInt
      // LONG-space table bounds: nChunks * 8 overflowed Int for a
      // claimed entry_count >= 2^28, letting the guard pass and the
      // loop read offsets past the box
      if (nChunks < 0 || cos + 8 + nChunks.toLong * (if (wide) 8L else 4L) > coe) return false
      if (nRuns <= 0 || scs + 8 + nRuns.toLong * 12L > sce) return false
      // total-work cap: a crafted table can alias every chunk onto the
      // same in-bounds byte range with a 2^32-1 sample count — the
      // audio analogue of the image decoders' pixel caps (PNG 2^26)
      val maxTotalSamples = 1L << 26
      var emitted = 0L
      var sampleIdx = 0L
      var run = 0
      var chunk = 1 // 1-based per spec
      while (chunk <= nChunks && sampleIdx < sampleCount) {
        // advance the stsc run whose first_chunk covers this chunk
        while (run + 1 < nRuns && u32(b, scs + 8 + (run + 1) * 12) <= chunk) run += 1
        val perChunk = u32(b, scs + 8 + run * 12 + 4)
        var off =
          if (wide) u64(b, cos + 8 + (chunk - 1) * 8)
          else u32(b, cos + 8 + (chunk - 1) * 4)
        var s = 0L
        while (s < perChunk && sampleIdx < sampleCount) {
          val size =
            if (constSize > 0) constSize
            else {
              val at = szs + 12 + sampleIdx * 4
              if (at + 4 > sze) return false
              u32(b, at.toInt).toInt
            }
          if (size % 2 != 0 || off < 0 || off + size > b.length) return false
          var p = off.toInt
          val end = p + size
          while (p + 1 < end) {
            val raw =
              if (little) ((b(p) & 0xff) | (b(p + 1) << 8)).toShort
              else (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)).toShort
            f(raw / 32768.0)
            emitted += 1
            if (emitted > maxTotalSamples) return false
            p += 2
          }
          off += size
          s += 1; sampleIdx += 1
        }
        chunk += 1
      }
      sampleIdx == sampleCount
    }
    res.getOrElse(false)
  }

  /** Amplitude-histogram hook matching [[Flac.foreachSample]]: streams
    * normalized samples when the payload is an MP4 whose audio track
    * is decodable PCM; None otherwise. */
  private[graft] def foreachSample(b: Array[Byte])(f: Double => Unit): Option[Unit] =
    try {
      if (!looksIsobmff(b)) None
      else {
        var track: Option[AudioTrack] = None
        for {
          (ms, me) <- findBox(b, 0, b.length, "moov")
        } foreachBox(b, ms, me) { (t, ps, pe) =>
          if (t == "trak" && track.isEmpty) {
            val isSoun = (for {
              (mds, mde) <- findBox(b, ps, pe, "mdia")
              (hs, _)    <- findBox(b, mds, mde, "hdlr")
            } yield fourcc(b, hs + 8)).contains("soun")
            if (isSoun) track = for {
              (mds, mde) <- findBox(b, ps, pe, "mdia")
              (mhs, _)   <- findBox(b, mds, mde, "mdhd")
              (mis, mie) <- findBox(b, mds, mde, "minf")
              (sts, ste) <- findBox(b, mis, mie, "stbl")
              (sds, sde) <- findBox(b, sts, ste, "stsd")
              // same sample-entry span validation as parseMovie's walk:
              // the entry must cover the 16.16 rate field (>= 36 bytes)
              // before fs+16 is read — this duplicate path previously
              // leaned on the blanket Exception catch instead
              if sds + 8 + 8 <= sde && u32(b, sds + 8) >= 36
            } yield {
              val entry = sds + 8
              val fmt = fourcc(b, entry + 4)
              val fs = entry + 16
              val mv = b(mhs) & 0xff
              val (mts, mdur) =
                if (mv == 1) (u32(b, mhs + 20), u64(b, mhs + 24))
                else (u32(b, mhs + 12), u32(b, mhs + 16))
              AudioTrack(fmt, u16(b, fs + 8), u16(b, fs + 10),
                (u32(b, fs + 16) >> 16).toInt, mts, mdur, sts, ste)
            }
          }
        }
        track.filter(a => (a.format == "sowt" || a.format == "twos") && a.bits == 16)
          .flatMap(a => if (foreachPcmSample(b, a)(f)) Some(()) else None)
      }
    } catch { case _: Exception => None }

  // ------------------------------------------------------------ encode

  private final class BoxWriter {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): BoxWriter = { out.write((v >> 8) & 0xff); out.write(v & 0xff); this }
    def u32(v: Long): BoxWriter = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt); this
    }
    def cc(s: String): BoxWriter = { out.write(s.getBytes("ISO-8859-1"), 0, 4); this }
    def bytes(bs: Array[Byte]): BoxWriter = { out.write(bs, 0, bs.length); this }
    def box(typ: String)(body: BoxWriter => Unit): BoxWriter = {
      val inner = new BoxWriter; body(inner)
      val payload = inner.out.toByteArray
      u32(8L + payload.length); cc(typ); bytes(payload)
    }
    def fullbox(typ: String, version: Int = 0, flags: Int = 0)(body: BoxWriter => Unit): BoxWriter =
      box(typ) { w => w.u32(((version & 0xff).toLong << 24) | (flags & 0xffffff)); body(w) }
  }

  /** Spec-valid fixture MP4 carrying interleaved PCM16 as a QuickTime
    * `sowt` audio track — ftyp + mdat + moov{mvhd, trak{tkhd,
    * mdia{mdhd, hdlr(soun), minf{smhd, dinf/dref, stbl{stsd(sowt),
    * stts, stsc, stsz, stco}}}}}.  One chunk, constant sample size;
    * the same external-tool-openable discipline as synthWav /
    * encodeFlac, so [[parseIsobmff]] exercises the real demux path. */
  private[graft] def encodeMp4Pcm(pcm: Array[Short], channels: Int, sampleRate: Int,
                                  bigEndian: Boolean = false): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "channels in [1,8]")
    require(sampleRate >= 1 && sampleRate <= 65535, "16.16 rate field — rate in [1, 65535]")
    require(pcm.length % channels == 0, "partial interleave frame")
    val frames = pcm.length / channels
    val bytesPerFrame = channels * 2

    val ftyp = new BoxWriter().box("ftyp") { w =>
      w.cc("isom").u32(512).cc("isom").cc("iso2").cc("mp41")
    }.out.toByteArray
    val mdatPayloadOff = ftyp.length + 8L

    val mdat = new BoxWriter().box("mdat") { w =>
      val raw = new Array[Byte](pcm.length * 2)
      var i = 0
      while (i < pcm.length) { // sowt = little-endian, twos = big-endian
        val (lo, hi) = if (bigEndian) (2 * i + 1, 2 * i) else (2 * i, 2 * i + 1)
        raw(lo) = (pcm(i) & 0xff).toByte
        raw(hi) = ((pcm(i) >> 8) & 0xff).toByte
        i += 1
      }
      w.bytes(raw)
    }.out.toByteArray

    val moov = new BoxWriter().box("moov") { m =>
      m.fullbox("mvhd") { w =>
        w.u32(0).u32(0) // creation / modification
          .u32(sampleRate).u32(frames) // timescale, duration
          .u32(0x00010000).u16(0x0100).u16(0) // rate 1.0, volume 1.0, reserved
          .u32(0).u32(0)
        Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(w.u32)
        (0 until 6).foreach(_ => w.u32(0)) // pre_defined
        w.u32(2) // next track id
      }
      m.box("trak") { t =>
        t.fullbox("tkhd", flags = 7) { w =>
          w.u32(0).u32(0).u32(1).u32(0).u32(frames) // track 1, duration
            .u32(0).u32(0).u16(0).u16(0).u16(0x0100).u16(0)
          Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(w.u32)
          w.u32(0).u32(0) // width, height (audio)
        }
        t.box("mdia") { md =>
          md.fullbox("mdhd") { w =>
            w.u32(0).u32(0).u32(sampleRate).u32(frames).u16(0x55c4).u16(0) // und
          }
          md.fullbox("hdlr") { w =>
            w.u32(0).cc("soun").u32(0).u32(0).u32(0)
            w.bytes("SoundHandler ".getBytes("ISO-8859-1"))
          }
          md.box("minf") { mi =>
            mi.fullbox("smhd")(w => { w.u16(0).u16(0); () })
            mi.box("dinf")(d => {
              d.fullbox("dref") { w =>
                w.u32(1)
                w.fullbox("url ", flags = 1)(_ => ()) // self-contained
              }
              ()
            })
            mi.box("stbl") { st =>
              st.fullbox("stsd") { w =>
                w.u32(1)
                w.box(if (bigEndian) "twos" else "sowt") { e =>
                  e.u16(0).u16(0).u16(0).u16(1) // reserved, data_ref_index
                  e.u16(0).u16(0).u32(0) // version 0, revision, vendor
                  e.u16(channels).u16(16).u16(0).u16(0) // bits, compression, packet
                  e.u32(sampleRate.toLong << 16) // 16.16 rate
                }
              }
              st.fullbox("stts")(w => { w.u32(1).u32(frames).u32(1); () })
              st.fullbox("stsc")(w => { w.u32(1).u32(1).u32(frames).u32(1); () })
              st.fullbox("stsz")(w => { w.u32(bytesPerFrame).u32(frames); () })
              st.fullbox("stco")(w => { w.u32(1).u32(mdatPayloadOff); () })
            }
          }
        }
      }
    }.out.toByteArray

    val out = new java.io.ByteArrayOutputStream(ftyp.length + mdat.length + moov.length)
    out.write(ftyp, 0, ftyp.length)
    out.write(mdat, 0, mdat.length)
    out.write(moov, 0, moov.length)
    out.toByteArray
  }

  /** Structurally-valid fixture AVIF: real ftyp/meta/iprp/ipco/ispe/
    * pixi metadata boxes around a placeholder `mdat` payload (the AV1
    * bitstream is the stub seam — metadata parsers agree with any
    * external tool; pixel decode is out of scope by design). */
  private[graft] def encodeAvifMeta(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "positive dimensions")
    val w = new BoxWriter()
    w.box("ftyp")(x => { x.cc("avif").u32(0).cc("avif").cc("mif1").cc("miaf"); () })
    w.fullbox("meta") { mt =>
      mt.fullbox("hdlr") { h =>
        h.u32(0).cc("pict").u32(0).u32(0).u32(0)
        h.bytes("PictureHandler ".getBytes("ISO-8859-1"))
      }
      mt.fullbox("pitm")(p => { p.u16(1); () })
      mt.box("iprp") { ip =>
        ip.box("ipco") { co =>
          co.fullbox("ispe")(s => { s.u32(width).u32(height); () })
          co.fullbox("pixi")(p => { p.out.write(3); p.out.write(8); p.out.write(8); p.out.write(8) })
        }
        ip.fullbox("ipma") { a =>
          a.u32(1).u16(1).out.write(2)
          a.out.write(0x81); a.out.write(0x02) // item 1 → props 1 (essential), 2
        }
      }
    }
    w.box("mdat")(x => { x.bytes(payload); () })
    w.out.toByteArray
  }
}
