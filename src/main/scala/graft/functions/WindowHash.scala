package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash sliding-window kernel for exact-substring dedup: ALL
  * width-`width` window hashes of a string in ONE O(len) pass, as an
  * `Array[Long]` to feed `posexplode`.
  *
  * The naive formulation — `explode(sequence(1, cnt))` then
  * `xxhash64(substr(norm, pos, width))` — pays O(width) hash work per
  * window AND O(pos) per `substr` (UTF8String indexes characters by
  * scanning bytes from the start), i.e. O(len·width + len²) per
  * document; at sf0.1 that hash pass alone was ~2 s of q88's 6 s.
  * This kernel is a polynomial rolling hash
  * (h(i+1) = (h(i) − b(i)·B^(width−1))·B + b(i+width), mod 2⁶⁴, odd
  * base B): O(len) per document, ~10× less work at width 60.
  *
  * Input is the [[graft.operators.TextAnalysis.normalize]]d text,
  * ASCII by construction ([a-z0-9 ] only), so the byte windows the
  * kernel hashes ARE the character windows the span semantics define —
  * same contract as [[SpanCut]].
  *
  * Collision regime: same non-cryptographic 64-bit class as the
  * xxhash64 path it replaces — for natural (non-adversarial) corpora
  * the pairwise collision bound is ≈ D²/2⁶⁴ over D distinct spans.  A
  * fixed-base polynomial hash additionally admits CRAFTED collisions
  * (Thue–Morse-style inputs) that xxhash64 does not; pipelines that
  * must resist adversarial text should group on the md5-based portable
  * path ([[graft.operators.Dedup.repeatedSpans]] `portableHash`),
  * which only uses these lanes as a pre-grouping key whose false
  * merges are then re-keyed by real md5.  Two lanes with independent
  * odd bases ([[lane1]]/[[lane2]]) give a ~2⁻¹²⁸-class bound for that
  * pre-grouping.
  */
object WindowHash {

  /** FNV-1a prime — lane-1 base. */
  val lane1: Long = 0x100000001b3L
  /** Odd golden-ratio constant — lane-2 base. */
  val lane2: Long = 0x9E3779B97F4A7C15L

  /** Prime > 2³² closing the portable affine-permutation family
    * (aᵢ·h + bᵢ) mod P over [[md5WindowHashes]]-style 32-bit base
    * hashes: aᵢ < 2³⁰ keeps every product < 2⁶², inside checked
    * 64-bit arithmetic on ANY engine.  Constants derived once from
    * md5("a&lt;i&gt;")/md5("b&lt;i&gt;"); SparkEntry interpolates this
    * SAME table into the oracle SQL, and the portable minhash
    * ([[graft.operators.Dedup.portableMinhashLanes]]) and portable
    * bloom ([[BloomGate.PortableBloom]]) both consume it. */
  val portableP: Long = 4294967311L
  /** [[portablePerms]] as flat primitive arrays — the m·k hot loops
    * (portable minhash, portable bloom) index these instead of paying
    * Vector + boxed-Tuple2 indirection per iteration. */
  lazy val portablePermA: Array[Long] = portablePerms.map(_._1).toArray
  lazy val portablePermB: Array[Long] = portablePerms.map(_._2).toArray
  val portablePerms: IndexedSeq[(Long, Long)] = Vector(
    (373311599L, 944895323L), (176928720L, 767210581L), (691707871L, 1006346980L),
    (492862057L, 980358411L), (156203053L, 1040078385L), (852485826L, 579023709L),
    (927847696L, 310989682L), (110253606L, 410029771L), (683942788L, 903451652L),
    (1025415122L, 936150354L), (143138164L, 589606286L), (288620850L, 340073898L),
    (757115229L, 721240334L), (291586649L, 411226204L), (560535623L, 855913338L),
    (478807605L, 24291534L), (397561450L, 552200276L), (580969426L, 675736485L),
    (343776099L, 331196159L), (1035043779L, 429909077L), (352798821L, 1048321081L),
    (556200807L, 713426011L), (609809345L, 629967628L), (614988953L, 556791554L),
    (607944512L, 631419490L), (944796540L, 873333012L), (1005733489L, 558570141L),
    (128849211L, 358830271L), (59766970L, 366112762L), (705264783L, 936176456L),
    (753229967L, 797832165L), (567159616L, 769510940L))

  /** All width-window rolling hashes of `s` (empty array when
    * `s.numBytes < width`). */
  def windowHashes(s: UTF8String, width: Int, base: Long): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val m = n - width + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var pow = 1L // base^(width-1), the drop-out multiplier
    var k = 1
    while (k < width) { pow *= base; k += 1 }
    var h = 0L
    var i = 0
    while (i < width) { h = h * base + (bytes(i) & 0xffL) + 1L; i += 1 }
    out(0) = h
    var p = 1
    while (p < m) {
      h = (h - ((bytes(p - 1) & 0xffL) + 1L) * pow) * base + (bytes(p + width - 1) & 0xffL) + 1L
      out(p) = h
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column surface: array of all width-window hashes of `text`. */
  def windowHashes(text: Column, width: Int, base: Long = lane1): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(WindowHashesExpr(GraftBridge.expression(text), width, base))
  }

  /** Both lanes fused in ONE byte pass, as `array<struct<h1,h2>>` —
    * a plain codegen'd expression where `zip_with` of the two lane
    * arrays would run its lambda interpreted per element (higher-order
    * functions sit outside whole-stage codegen; the lambda route
    * measured ~1 s / 1.2M windows at sf0.1, this kernel ~0.1 s). */
  def windowHashPairs(s: UTF8String, width: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val m = n - width + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var pow1 = 1L; var pow2 = 1L
    var k = 1
    while (k < width) { pow1 *= lane1; pow2 *= lane2; k += 1 }
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < width) {
      val b = (bytes(i) & 0xffL) + 1L
      h1 = h1 * lane1 + b; h2 = h2 * lane2 + b
      i += 1
    }
    out(0) = InternalRow(h1, h2)
    var p = 1
    while (p < m) {
      val drop = (bytes(p - 1) & 0xffL) + 1L
      val add = (bytes(p + width - 1) & 0xffL) + 1L
      h1 = (h1 - drop * pow1) * lane1 + add
      h2 = (h2 - drop * pow2) * lane2 + add
      out(p) = InternalRow(h1, h2)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column surface: array of (lane-1, lane-2) window-hash structs. */
  def windowHashPairs(text: Column, width: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(WindowHashPairsExpr(GraftBridge.expression(text), width))
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5 of bytes[pos, pos+width) packed as the unsigned 32-bit value
    * of the first 4 digest bytes — ONE definition shared by
    * [[md5WindowHashes]] and [[portableMinhashSig]]: the portable
    * contract requires both to stay bit-identical to the oracle SQL
    * forever, and a tweak applied to one hand-kept copy but not the
    * other would silently break oracle hash-equality. */
  @inline private def md5Window32(md: java.security.MessageDigest,
                                  bytes: Array[Byte], pos: Int, width: Int): Long = {
    md.reset()
    md.update(bytes, pos, width)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** The PORTABLE base hash of every width-window in one pass: the
    * first 4 md5 bytes of the window as an unsigned 32-bit value —
    * bit-identical to `conv(substr(md5(substr(text, p, w)), 1, 8), 16,
    * 10)` (and to `('0x' || substr(md5(s), 1, 8))::BIGINT` in SQL),
    * without the O(pos) UTF8String substr scan, the hex-string
    * round-trip, or the per-call digest allocation that made the
    * expression-composed form the dominant cost of the portable
    * minhash queries.  md5 itself is the irreducible portable price —
    * only its packaging is fused away. */
  def md5WindowHashes(s: UTF8String, width: Int): ArrayData = {
    val bytes = s.getBytes
    val m = bytes.length - width + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = md5Local.get()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = md5Window32(md, bytes, i, width)
      i += 1
    }
    // fromPrimitiveArray, not GenericArrayData: the generic ctor boxes
    // every long — one java.lang.Long per WINDOW per row on the kernel
    // whose whole purpose is removing per-window overhead
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column surface: array of md5-derived 32-bit window base hashes. */
  def md5WindowHashes(text: Column, width: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(Md5WindowHashesExpr(GraftBridge.expression(text), width))
  }

  /** FUSED portable minhash signature: all k affine-permutation lane
    * minima over the document's md5 window hashes in ONE pass — the
    * portable counterpart of [[MinHash]]'s fused xxhash64 kernel, and
    * the same explode-elimination story: the exploded formulation
    * pushed one row per window through a 32-min-column aggregate (the
    * dominant cost of the portable queries once hashing was fused);
    * here the minima update in-place in the scan stage, ZERO shuffle.
    * Returns null when the text has no window (the
    * [[graft.operators.Dedup.minhashSignatures]] no-row contract). */
  def portableMinhashSig(s: UTF8String, width: Int, k: Int): ArrayData = {
    val bytes = s.getBytes
    val m = bytes.length - width + 1
    if (m <= 0) return null
    val md = md5Local.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = md5Window32(md, bytes, i, width)
      var j = 0
      while (j < k) {
        val v = (portablePermA(j) * h + portablePermB(j)) % portableP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Column surface: k-lane portable minhash signature array. */
  def portableMinhashSig(text: Column, width: Int, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(PortableMinhashSigExpr(GraftBridge.expression(text), width, k))
  }

  /** First `hexChars` hex digits of md5(s) as a long — bit-identical
    * to `conv(substring(md5(s), 1, hexChars), 16, 10)::BIGINT` (and to
    * the SQL oracle's `('0x' || substr(md5(s), 1, N))::BIGINT`), in
    * one digest pass with no hex-string materialization, no substring,
    * and no base-16 string parse.  The composed form ran three string
    * kernels per ROW in the engine's hottest deterministic-hash paths
    * (DSIR gram buckets, sampling keys, portable simhash tokens);
    * md5 itself is the irreducible portable price — only the packaging
    * is fused away (same story as [[md5WindowHashes]]).
    * `hexChars` ≤ 15 keeps the value inside a signed long. */
  def md5PrefixLong(s: UTF8String, hexChars: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v64 = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    v64 >>> (64 - 4 * hexChars)
  }

  /** Column surface: md5 hex-prefix key as a long (string child). */
  def md5Prefix(text: Column, hexChars: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(Md5PrefixExpr(GraftBridge.expression(text), hexChars))
  }
}

/** All width-`width` rolling window hashes of an ASCII string column,
  * as `array<long>`. */
case class WindowHashesExpr(child: Expression, width: Int, base: Long)
    extends UnaryExpression {
  require(width >= 1, s"window_hashes needs width >= 1, got $width")

  // analysis-time reject of a wrong-typed child: without this, codegen
  // fails to Janino-compile (stage drops to interpreted) and the
  // interpreted path throws ClassCastException mid-job instead of a
  // clean AnalysisException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string child, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(s: Any): Any =
    WindowHash.windowHashes(s.asInstanceOf[UTF8String], width, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WindowHash.windowHashes($s, $width, ${base}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused k-lane portable minhash signature of an ASCII string column,
  * as `array<long>` (null when no window). */
case class PortableMinhashSigExpr(child: Expression, width: Int, k: Int)
    extends UnaryExpression {
  require(width >= 1 && k >= 1 && k <= WindowHash.portablePerms.size,
    s"portable_minhash_sig needs width >= 1 and k in [1, ${WindowHash.portablePerms.size}]")

  // analysis-time reject of a wrong-typed child: without this, codegen
  // fails to Janino-compile (stage drops to interpreted) and the
  // interpreted path throws ClassCastException mid-job instead of a
  // clean AnalysisException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string child, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "portable_minhash_sig"

  override def nullSafeEval(s: Any): Any =
    WindowHash.portableMinhashSig(s.asInstanceOf[UTF8String], width, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.functions.WindowHash.portableMinhashSig($s, $width, $k);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All md5-derived 32-bit window base hashes of an ASCII string
  * column, as `array<long>` — the portable-minhash shingle feed. */
case class Md5WindowHashesExpr(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1, s"md5_window_hashes needs width >= 1, got $width")

  // analysis-time reject of a wrong-typed child: without this, codegen
  // fails to Janino-compile (stage drops to interpreted) and the
  // interpreted path throws ClassCastException mid-job instead of a
  // clean AnalysisException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string child, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_window_hashes"

  override def nullSafeEval(s: Any): Any =
    WindowHash.md5WindowHashes(s.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WindowHash.md5WindowHashes($s, $width);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused two-lane rolling window hashes of an ASCII string column, as
  * `array<struct<h1:long,h2:long>>` — the 128-bit-class pre-grouping
  * key of [[graft.operators.Dedup.repeatedSpans]]'s portable path. */
case class WindowHashPairsExpr(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1, s"window_hash_pairs needs width >= 1, got $width")

  // analysis-time reject of a wrong-typed child: without this, codegen
  // fails to Janino-compile (stage drops to interpreted) and the
  // interpreted path throws ClassCastException mid-job instead of a
  // clean AnalysisException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string child, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "window_hash_pairs"

  override def nullSafeEval(s: Any): Any =
    WindowHash.windowHashPairs(s.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WindowHash.windowHashPairs($s, $width);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5 hex-prefix key of a string column as a long (see
  * [[WindowHash.md5PrefixLong]]) — the codegen'd twin of
  * `conv(substring(md5(s), 1, hexChars), 16, 10)::BIGINT`. */
case class Md5PrefixExpr(child: Expression, hexChars: Int)
    extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15,
    s"md5_prefix needs hexChars in [1,15] (signed-long range), got $hexChars")

  // analysis-time reject of a wrong-typed child: without this, codegen
  // fails to Janino-compile (stage drops to interpreted) and the
  // interpreted path throws ClassCastException mid-job instead of a
  // clean AnalysisException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string child, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix"

  override def nullSafeEval(s: Any): Any =
    WindowHash.md5PrefixLong(s.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WindowHash.md5PrefixLong($s, $hexChars);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
