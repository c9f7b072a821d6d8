package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.operators.{DistinctSketch, HeavyHitters, QuantileSketch}

/** Frozen golden fixtures for the THREE persistable sketch wire
  * formats (HLL = DistinctSketch, GK rank summaries = QuantileSketch,
  * SpaceSaving = HeavyHitters), each in both regimes.
  *
  * Why: q118/q119/q120 make "write the sketch now, merge it later —
  * possibly months later, under a newer build" a product promise.
  * Round-trip specs that re-serialize with CURRENT code cannot catch a
  * silent format change (both sides drift together); these fixtures
  * pin the exact committed bytes, so a deliberate one-byte change to
  * any codec fails the suite, and bytes written by an OLD build are
  * proven decodable by asserting pinned estimates/bounds from the
  * committed blobs alone.
  *
  * Fixtures are .hex files (hex text, diff-friendly) under
  * src/test/resources/golden/sketches.  To regenerate after an
  * INTENTIONAL format
  * bump (which must also bump the version byte):
  * `GOLDEN_REGEN=1 sbt "testOnly graft.SketchWireFormatSpec"` and
  * commit the diff — then update the pinned assertions below.
  */
class SketchWireFormatSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val goldenDir = new File("src/test/resources/golden/sketches")
  private val regen = sys.env.contains("GOLDEN_REGEN")

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.trim.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def fixture(name: String, bytes: => Array[Byte]): Array[Byte] = {
    val f = new File(goldenDir, s"$name.hex")
    if (regen) {
      goldenDir.mkdirs()
      Files.write(f.toPath, (hex(bytes) + "\n").getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $name (${bytes.length} bytes)")
      bytes
    } else {
      assert(f.isFile, s"missing committed fixture $f — run GOLDEN_REGEN=1")
      unhex(new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
    }
  }

  // ---- deterministic construction recipes (fixed streams) ----------

  private def hllSparse: DistinctSketch.Hll = {
    val h = new DistinctSketch.Hll(12, 4096)
    (0 until 10).foreach(i => h.add(s"user_$i"))
    h
  }
  private def hllDense: DistinctSketch.Hll = {
    val h = new DistinctSketch.Hll(7, 16)
    (0 until 100).foreach(i => h.add(s"user_$i"))
    h
  }
  private def gkLossless: QuantileSketch.Summary = {
    val s = new QuantileSketch.Summary(32)
    (0 until 100).foreach(i => s.insert(((i * i) % 17).toDouble))
    s.flush(); s
  }
  private def gkLossy: QuantileSketch.Summary = {
    val s = new QuantileSketch.Summary(8)
    (0 until 100).foreach(i => s.insert(i.toDouble))
    s.flush(); s
  }
  private def ssExact: HeavyHitters.SpaceSaving = {
    val ss = new HeavyHitters.SpaceSaving(8)
    (0 until 50).foreach(i => ss.offer(s"k${i % 5}"))
    ss
  }
  /** Post-eviction AND post-lossy-merge: carries everEvicted + a
    * positive floor — the regime the offer-after-merge fix guards. */
  private def ssLossy: HeavyHitters.SpaceSaving = {
    val small = new HeavyHitters.SpaceSaving(2)
    (1 to 3).foreach(_ => small.offer("u"))
    Seq("x1", "x2", "x3", "x4", "x1", "x2", "x3", "x4").foreach(small.offer(_))
    val acc = new HeavyHitters.SpaceSaving(4)
    acc.merge(small)
    acc.offer("u") // below-capacity insert charged with the merge floor
    acc
  }

  // ---- format freeze: current serialize() must equal the blobs -----

  private val frozen = Seq[(String, () => Array[Byte])](
    "hll_sparse" -> (() => DistinctSketch.serialize(hllSparse)),
    "hll_dense" -> (() => DistinctSketch.serialize(hllDense)),
    "gk_lossless" -> (() => QuantileSketch.serialize(gkLossless)),
    "gk_lossy" -> (() => QuantileSketch.serialize(gkLossy)),
    "ss_exact" -> (() => HeavyHitters.serialize(ssExact)),
    "ss_lossy" -> (() => HeavyHitters.serialize(ssLossy)))

  for ((name, build) <- frozen) {
    test(s"wire format frozen: $name serializes to the committed bytes") {
      val committed = fixture(name, build())
      assert(hex(build()) == hex(committed),
        s"$name wire format CHANGED — stored sketches written by released builds " +
          "would be orphaned; if intentional, bump the version byte, keep a " +
          "decoder for version 1, regenerate, and update the pins")
    }
  }

  // ---- decode the COMMITTED bytes; assert pinned estimates/bounds --

  test("committed hll_sparse decodes: exact 10 distinct, sparse mode") {
    val h = DistinctSketch.deserialize(fixture("hll_sparse", DistinctSketch.serialize(hllSparse)))
    val (n, exact) = h.result
    assert(n == 10L && exact, s"pinned (10, exact) got ($n, $exact)")
  }

  test("committed hll_dense decodes: pinned dense estimate") {
    val h = DistinctSketch.deserialize(fixture("hll_dense", DistinctSketch.serialize(hllDense)))
    val (n, exact) = h.result
    assert(!exact, "dense sketch must report approximate")
    assert(n == PIN_HLL_DENSE, s"pinned $PIN_HLL_DENSE got $n")
  }

  test("committed gk_lossless decodes: exact median, collapsed interval") {
    val s = QuantileSketch.deserialize(fixture("gk_lossless", QuantileSketch.serialize(gkLossless)))
    assert(s.n == 100L && s.isExact)
    val t = s.query(0.5)
    assert(t.rmin == t.rmax, "lossless summary must carry collapsed intervals")
    assert(t.v == PIN_GK_MEDIAN, s"pinned median $PIN_GK_MEDIAN got ${t.v}")
  }

  test("committed gk_lossy decodes: pinned smallest retained value reaching the target rank") {
    val s = QuantileSketch.deserialize(fixture("gk_lossy", QuantileSketch.serialize(gkLossy)))
    assert(s.n == 100L && !s.isExact)
    // query returns the smallest RETAINED value whose rmax reaches the
    // target rank ⌈0.5·100⌉ = 50; thinning keeps exact ranks on the
    // retained tuples, so its interval is collapsed but sits above 50
    val t = s.query(0.5)
    assert(t.rmax >= 50L && t.rmin <= t.rmax && t.rmax <= s.n)
    assert(t.v == PIN_GK_LOSSY_V && t.rmin == PIN_GK_LOSSY_RMIN && t.rmax == PIN_GK_LOSSY_RMAX,
      s"pinned ($PIN_GK_LOSSY_V, $PIN_GK_LOSSY_RMIN, $PIN_GK_LOSSY_RMAX) " +
        s"got (${t.v}, ${t.rmin}, ${t.rmax})")
  }

  test("committed ss_exact decodes: exact counts, zero bounds") {
    val ss = HeavyHitters.deserialize(fixture("ss_exact", HeavyHitters.serialize(ssExact)))
    assert(ss.absentBound == 0L)
    (0 until 5).foreach(i => assert(ss.counts(s"k$i") == 10L && ss.errs(s"k$i") == 0L))
  }

  test("committed ss_lossy decodes: pinned floor and interval for the re-offered item") {
    val ss = HeavyHitters.deserialize(fixture("ss_lossy", HeavyHitters.serialize(ssLossy)))
    assert(ss.absentBound == PIN_SS_FLOOR, s"pinned floor $PIN_SS_FLOOR got ${ss.absentBound}")
    // "u" truly occurred 4 times in the merged stream; the committed
    // interval must bracket it (the offer-after-merge soundness fix)
    val (lo, hi) = (ss.counts("u") - ss.errs("u"), ss.counts("u"))
    assert(lo <= 4L && hi >= 4L, s"true 4 outside [$lo, $hi]")
    assert(lo == PIN_SS_U_LO && hi == PIN_SS_U_HI,
      s"pinned [$PIN_SS_U_LO, $PIN_SS_U_HI] got [$lo, $hi]")
  }

  // pinned values — computed once from the committed fixtures
  private val PIN_HLL_DENSE = 101L
  private val PIN_GK_MEDIAN = 8.0
  private val PIN_GK_LOSSY_V = 70.0
  private val PIN_GK_LOSSY_RMIN = 71L
  private val PIN_GK_LOSSY_RMAX = 71L
  private val PIN_SS_FLOOR = 5L
  private val PIN_SS_U_LO = 1L
  private val PIN_SS_U_HI = 6L

  // ---- corrupt-input contract: ONE loud exception type -------------

  test("truncated bytes fail loudly as IllegalArgumentException in all three codecs") {
    val blobs = Seq[(Array[Byte], Array[Byte] => Any)](
      (DistinctSketch.serialize(hllSparse), DistinctSketch.deserialize(_)),
      (DistinctSketch.serialize(hllDense), DistinctSketch.deserialize(_)),
      (QuantileSketch.serialize(gkLossy), QuantileSketch.deserialize(_)),
      (HeavyHitters.serialize(ssLossy), HeavyHitters.deserialize(_)))
    for ((bytes, decode) <- blobs; cut <- Seq(1, bytes.length / 2, bytes.length - 1)) {
      intercept[IllegalArgumentException](decode(bytes.take(cut)))
    }
  }

  test("mutation fuzz: corrupt bytes decode or throw IllegalArgumentException, nothing else") {
    // the fail-loudly contract is ONE exception type: a random
    // corruption may still decode (flipping a count byte yields a
    // different valid sketch) but must never escape as EOFException /
    // NegativeArraySizeException / OOM-sized allocation / etc.
    val rnd = new scala.util.Random(42)
    val blobs = Seq[(String, Array[Byte], Array[Byte] => Any)](
      ("hll_sparse", DistinctSketch.serialize(hllSparse), DistinctSketch.deserialize(_)),
      ("hll_dense", DistinctSketch.serialize(hllDense), DistinctSketch.deserialize(_)),
      ("gk_lossless", QuantileSketch.serialize(gkLossless), QuantileSketch.deserialize(_)),
      ("gk_lossy", QuantileSketch.serialize(gkLossy), QuantileSketch.deserialize(_)),
      ("ss_exact", HeavyHitters.serialize(ssExact), HeavyHitters.deserialize(_)),
      ("ss_lossy", HeavyHitters.serialize(ssLossy), HeavyHitters.deserialize(_)))
    for ((name, bytes, decode) <- blobs; trial <- 1 to 200) {
      val mutated = bytes.clone()
      // 1-3 random byte flips, occasionally a truncation or extension
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val candidate = rnd.nextInt(10) match {
        case 0 => mutated.take(rnd.nextInt(mutated.length))
        case 1 => mutated ++ Array.fill(1 + rnd.nextInt(8))(rnd.nextInt(256).toByte)
        case _ => mutated
      }
      try { decode(candidate); () }
      catch {
        case _: IllegalArgumentException => () // the documented loud failure
        case e: Throwable =>
          fail(s"$name trial $trial: ${e.getClass.getName} escaped the decode contract: ${e.getMessage}")
      }
    }
  }

  test("structurally invalid payloads are rejected, not silently accepted") {
    // GK: swap the first two tuples' values (unsorted) — craft by
    // editing the first tuple's float64 to exceed the second's
    val gk = QuantileSketch.serialize(gkLossless)
    val unsorted = gk.clone()
    // header: 1 version + 4 cap + 8 n + 1 lossless + 4 len = 18; first
    // tuple v at 18
    java.nio.ByteBuffer.wrap(unsorted, 18, 8).putDouble(1e9)
    intercept[IllegalArgumentException](QuantileSketch.deserialize(unsorted))
    // GK: rmin > rmax in the first tuple (rmin at 18+16, rmax at 18+24)
    val badRank = gk.clone()
    java.nio.ByteBuffer.wrap(badRank, 18 + 16, 8).putLong(999L)
    intercept[IllegalArgumentException](QuantileSketch.deserialize(badRank))
    // HLL dense: out-of-range register byte (header is 7 bytes)
    val hd = DistinctSketch.serialize(hllDense)
    val badReg = hd.clone()
    badReg(7) = 70.toByte // > 65 - p = 58
    intercept[IllegalArgumentException](DistinctSketch.deserialize(badReg))
    // SpaceSaving: err > count in the first item — find it by
    // re-crafting: header 1+4+1+8+4 = 18, first item len at 18
    val ssb = HeavyHitters.serialize(ssExact)
    val badSs = ssb.clone()
    val itemLen = java.nio.ByteBuffer.wrap(badSs, 18, 4).getInt
    // count at 18+4+itemLen, err at 18+4+itemLen+8
    java.nio.ByteBuffer.wrap(badSs, 18 + 4 + itemLen + 8, 8).putLong(Long.MaxValue)
    intercept[IllegalArgumentException](HeavyHitters.deserialize(badSs))
  }
}
