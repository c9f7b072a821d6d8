package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass MinHash signature kernel.
  *
  * The explode/groupBy formulation ([[graft.operators.Dedup.minhashSignatures]]
  * r3) is linear, but it materializes one ROW per (doc, shingle) and
  * shuffles all of them through a hash aggregate — at sf0.1 that is
  * ~40M rows of (long, long) through an exchange just to compute k
  * running minima per document.  At 100 TB that shuffle IS the
  * candidate-generation cost.
  *
  * This expression computes the whole k-element signature in one pass
  * over the text, inside whole-stage codegen, with zero shuffle: for
  * each shingle position it hashes the n-char window once
  * (`xxhash64(shingle)` semantics) and folds it into k running minima
  * (`min(xxhash64(i, h))` semantics).  The ONLY shuffle left in
  * MinHash-LSH is the band-key join itself.
  *
  * Bit-for-bit identical to the r3 pipeline (pinned by spec
  * `MinHashFusedSpec`): shingle hash = `XXH64.hashUTF8String(sub, 42)`
  * exactly as Spark's `xxhash64(col)`, permutation i =
  * `XXH64.hashLong(h, XXH64.hashInt(i, 42))` exactly as
  * `xxhash64(lit(i), col("h"))`.  Docs with no shingle (normalized
  * length < n) return NULL, mirroring the groupBy formulation where
  * such docs simply had no rows to aggregate.
  *
  * Reference semantics: candidate-pair MinHash per SURVEY.md §2.10
  * (training-pipeline dedup tier); cf. Broder's shingling construction.
  */
object MinHash {

  /** k per-permutation seeds: seed_i = XXH64.hashInt(i, 42) — the
    * prefix Spark's XxHash64(lit(i), h) computes before folding h.
    * Cached per k (tiny; k ≤ 512 in practice). */
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def seeds(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, kk => Array.tabulate(kk)(i => XXH64.hashInt(i, 42L)))

  /** Codepoint → byte-offset table for a multi-byte string (offsets(i)
    * = byte start of codepoint i; offsets(nChars) = total bytes).  One
    * O(L) pass, so the multi-byte shingle loops hash byte spans in
    * place instead of paying substringSQL's O(pos) re-scan per window
    * (which made non-ASCII documents O(L²)). */
  private def cpOffsets(norm: UTF8String, nChars: Int): Array[Int] = {
    val o = new Array[Int](nChars + 1)
    var b = 0; var c = 0
    while (c < nChars) {
      o(c) = b
      b += UTF8String.numBytesForFirstByte(norm.getByte(b))
      c += 1
    }
    o(nChars) = norm.numBytes()
    o
  }

  /** xxhash64(substr(norm, pos+1, n)) — hashes the byte window IN
    * PLACE; multi-byte positions come from the precomputed offset
    * table.  ONE definition shared by the signature and verification
    * kernels: their bit-identity (to each other and to Spark's
    * xxhash64) is spec-pinned, and a fix applied to one hand-kept
    * copy but not the other would silently desynchronize LSH
    * candidates from exact-Jaccard verification. */
  @inline private def windowHash(norm: UTF8String, offs: Array[Int],
                                 ascii: Boolean, pos: Int, n: Int): Long =
    if (ascii)
      XXH64.hashUnsafeBytes(norm.getBaseObject, norm.getBaseOffset + pos, n, 42L)
    else
      XXH64.hashUnsafeBytes(norm.getBaseObject, norm.getBaseOffset + offs(pos),
        offs(pos + n) - offs(pos), 42L)

  /** Single-pass signature: min_i over shingles s of
    * hashLong(hashUTF8String(s, 42), hashInt(i, 42)).
    * Returns null when the text yields no shingle. */
  def minhashData(norm: UTF8String, n: Int, k: Int): ArrayData = {
    val nChars = norm.numChars()
    val cnt = nChars - (n - 1)
    if (cnt < 1) return null
    val sd = seeds(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val ascii = norm.numBytes() == nChars
    val offs = if (ascii) null else cpOffsets(norm, nChars)
    var pos = 0
    while (pos < cnt) {
      val h = windowHash(norm, offs, ascii, pos, n)
      var i = 0
      while (i < k) {
        val hi = XXH64.hashLong(h, sd(i))
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
      pos += 1
    }
    // fromPrimitiveArray, not GenericArrayData: the generic ctor boxes
    // every long (one java.lang.Long per lane per ROW on this hot path)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Column surface: `minhashSig(normalizedText, n, k)`. */
  def minhashSig(text: Column, n: Int, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(text), n, k))
  }

  /** Sorted distinct shingle-hash SET of a (normalized) string — the
    * exact-Jaccard verification primitive: set sizes are array sizes,
    * set intersection is a merge walk ([[sortedIntersectCount]]).
    * Null when the text yields no shingle (mirrors the exploded
    * formulation, which produced no rows).  One pass + one sort per
    * document, inside the scan stage — replaces exploding candidate
    * docs into (pair, hash) rows through two hash aggregates.
    *
    * Memory bound: a document of L normalized chars yields ≤ L longs
    * (8·L bytes) in ONE row — fine for web-scale documents (MBs);
    * callers chunk pathological inputs upstream. */
  def shingleHashSetData(norm: UTF8String, n: Int): ArrayData = {
    val nChars = norm.numChars()
    val cnt = nChars - (n - 1)
    if (cnt < 1) return null
    val hs = new Array[Long](cnt)
    val ascii = norm.numBytes() == nChars
    val offs = if (ascii) null else cpOffsets(norm, nChars)
    var pos = 0
    while (pos < cnt) {
      hs(pos) = windowHash(norm, offs, ascii, pos, n)
      pos += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedupe of the sorted run
    var w = 1
    var r = 1
    while (r < cnt) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      if (w == cnt) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** |A ∩ B| of two SORTED distinct long arrays via a merge walk.
    * The sorted contract is CHECKED as the walk consumes elements (one
    * comparison per step, the span_cut discipline): an unsorted input
    * silently undercounts the intersection, which then inflates every
    * downstream Jaccard verdict.  Elements past the shorter side's
    * exhaustion are never read, so only the consumed prefix is checked
    * — partial loudness over silent corruption. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    // null elements carry no membership evidence — skip them (a
    // user-built array<long> may have containsNull=true)
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    if (i >= na || j >= nb) return 0L
    var x = a.getLong(i); var y = b.getLong(j)
    // each element is read ONCE, on advance, and compared against the
    // previous element of its own side right there — so the contract
    // check is one branch per consumed element, not per loop turn
    def unsorted(side: String, prev: Long, nxt: Long): Nothing =
      throw new IllegalArgumentException(
        s"sorted_intersect_count: $side array must be sorted ascending with DISTINCT " +
          s"elements (got $nxt after $prev)")
    while (true) {
      if (x == y) c += 1
      val advanceA = x <= y; val advanceB = y <= x
      if (advanceA) {
        i += 1
        while (i < na && a.isNullAt(i)) i += 1
        if (i >= na) return c
        val nx = a.getLong(i)
        // <=: a DUPLICATE element (contract says sorted DISTINCT)
        // would re-count the same set member and inflate containment
        // past 1.0 downstream — loud, like the order violation
        if (nx <= x) unsorted("left", x, nx)
        x = nx
      }
      if (advanceB) {
        j += 1
        while (j < nb && b.isNullAt(j)) j += 1
        if (j >= nb) return c
        val ny = b.getLong(j)
        if (ny <= y) unsorted("right", y, ny)
        y = ny
      }
    }
    c // unreachable; the loop returns on exhaustion
  }

  def shingleHashSet(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ShingleHashSetExpr(GraftBridge.expression(text), n))
  }

  def intersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    // cast to array<long> like VectorSim.agreeCount: a user-built
    // array<int> would otherwise read 8-byte strides over 4-byte
    // slots (garbage counts) or ClassCastException interpreted
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a.cast(ArrayType(LongType))),
      GraftBridge.expression(b.cast(ArrayType(LongType)))))
  }
}

/** `array<long>` MinHash signature of a (normalized) string column;
  * null for texts shorter than the shingle width. */
case class MinHashSigExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n >= 1 && k >= 1, s"minhash_sig needs n >= 1 and k >= 1, got n=$n k=$k")

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
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(s: Any): Any =
    MinHash.minhashData(s.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHash.minhashData($c, $n, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct `array<long>` shingle-hash set of a (normalized)
  * string column; null for texts shorter than the shingle width. */
case class ShingleHashSetExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle_hash_set needs n >= 1, got $n")

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
  override def prettyName: String = "shingle_hash_set"

  override def nullSafeEval(s: Any): Any =
    MinHash.shingleHashSetData(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHash.shingleHashSetData($c, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merge-walk |A ∩ B| over two sorted distinct `array<long>` columns. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  // analysis-time reject: both sides must be array<long> (the Column
  // surface casts; a direct constructor caller gets a clean
  // AnalysisException instead of garbage 8-byte strides over int slots)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> children, got ${l.catalogString} and ${r.catalogString}")
    }
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHash.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MinHash.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
