package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass SimHash fingerprint kernel.
  *
  * The explode/groupBy formulation
  * ([[graft.operators.Dedup.simhashExploded]]) is linear but
  * materializes one ROW per (doc, token) and pushes all of them through
  * a 64-aggregate hash aggregate — the exact shape the fused MinHash
  * kernel ([[MinHashSigExpr]]) eliminated for signature generation, and
  * the reason q27 was the one bench entry over baseline in round 4.
  *
  * This expression computes the whole 64-bit fingerprint in one pass
  * over the normalized text, inside whole-stage codegen, with ZERO
  * shuffle: tokens are the maximal runs between ASCII spaces (exactly
  * what `split(norm, " ")` + `length > 0` yields — the normalizer
  * collapses whitespace to single 0x20 bytes, and 0x20 never occurs
  * inside a UTF-8 multi-byte sequence, so byte scanning is exact); each
  * token is hashed once with `xxhash64(tok)` semantics
  * (`XXH64.hashUnsafeBytes(bytes, 42)` — identical to Spark's
  * `XxHash64` over a string), votes +1/-1 on each of the 64 bits, and
  * the per-bit vote sign forms the fingerprint
  * (bit i set iff sum > 0, matching `when(sum > 0, 1L << i)`).
  *
  * Bit-for-bit identical to the exploded pipeline (pinned by
  * `SimHashFusedSpec`).  Docs with no token (normalized text empty)
  * return NULL, mirroring the groupBy formulation where such docs
  * simply had no rows to aggregate.
  *
  * Reference semantics: SimHash dedup tier per SURVEY.md §2.10
  * (training-pipeline extension); cf. Charikar's simhash construction.
  */
object SimHash {

  /** One-pass 64-bit SimHash of a (normalized) string; null (boxed)
    * when the text yields no token. */
  def simhashData(norm: UTF8String): java.lang.Long = {
    val base = norm.getBaseObject
    val off = norm.getBaseOffset
    val nb = norm.numBytes()
    // votes(i) = (#tokens with bit i set) - (#tokens with bit i clear)
    val votes = new Array[Int](64)
    var nTokens = 0
    var start = 0
    var i = 0
    while (i <= nb) {
      val atSpace = i < nb &&
        org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20.toByte
      if (i == nb || atSpace) {
        val len = i - start
        if (len > 0) {
          nTokens += 1
          // xxhash64(token) — hash the byte window in place, exactly
          // what XxHash64 computes for the exploded token column
          val h = XXH64.hashUnsafeBytes(base, off + start, len, 42L)
          var b = 0
          while (b < 64) {
            // +1 when bit set, -1 when clear: votes += 2*bit - 1
            votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (nTokens == 0) return null
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  /** Column surface: `simhash64(normalizedText)`. */
  def simhash64(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SimHashExpr(GraftBridge.expression(text)))
  }
}

/** 64-bit SimHash fingerprint of a (normalized) string column; null for
  * texts with no token. */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(s: Any): Any =
    SimHash.simhashData(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("simhash")
      s"""
        java.lang.Long $tmp = graft.functions.SimHash.simhashData($c);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
