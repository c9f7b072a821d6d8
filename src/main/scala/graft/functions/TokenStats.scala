package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass token-repetition statistics kernel.
  *
  * The explode/two-level-groupBy formulation
  * ([[graft.operators.TextAnalysis.repetitionSignalsExploded]])
  * materializes one ROW per (doc, token) and shuffles all of them
  * through a hash aggregate just to compute four per-document counters
  * — the exact shape the fused MinHash ([[MinHash]]) and SimHash
  * ([[SimHash]]) kernels eliminated for signature generation.  At
  * 100 TB that token shuffle IS the repetition-filter cost.
  *
  * This expression computes all five counters (incl. entropy) in one pass over the
  * already-split token array, inside whole-stage codegen, with ZERO
  * shuffle: token multiplicities via one open hash map (exact string
  * keys — no hashing shortcut, so two distinct tokens can never
  * merge), adjacent-bigram distincts via a set of `tokA + ' ' + tokB`
  * concatenations (injective: tokens cannot contain the split
  * delimiter).  Bit-for-bit identical to the exploded pipeline
  * (pinned by spec), including the empty-token semantics of
  * `split(text, " ")` (consecutive separators yield "" tokens, which
  * count like any other token).
  *
  * Null input (null text upstream) returns a null struct, mirroring
  * the exploded formulation where such docs had no rows to aggregate.
  *
  * Reference semantics: Gopher-style repetition quality filters per
  * SURVEY.md §2.10 (training-pipeline extension).
  */
object TokenStats {

  val outputType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("d2raw", DoubleType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  private val SpaceUtf8 = UTF8String.fromString(" ")

  /** One-pass (n_tokens, n_distinct, top_cnt, d2raw, entropy) over a
    * token array. */
  def tokenStatsData(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    // cap the pre-size: n*2 buckets per DOCUMENT is O(n_tokens) of
    // transient garbage for low-distinct docs (and overflows Int past
    // 2^30); beyond the cap the map grows as needed
    val cap = Math.max(16, Math.min(n.toLong * 2L, 1L << 20).toInt)
    val counts = new java.util.HashMap[UTF8String, Integer](cap)
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(toks.getUTF8String(i), Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > top) top = c.intValue
      i += 1
    }
    var distinctBigrams = 0
    if (n >= 2) {
      val seen = new java.util.HashSet[UTF8String](cap)
      var j = 0
      while (j < n - 1) {
        // tokens never contain the delimiter, so the concatenation is
        // an injective encoding of the (tokA, tokB) pair
        val bg = UTF8String.concat(toks.getUTF8String(j), SpaceUtf8,
          toks.getUTF8String(j + 1))
        if (seen.add(bg)) distinctBigrams += 1
        j += 1
      }
    }
    // same arithmetic as size(array_distinct(bigrams)).cast(double) /
    // size(bigrams).cast(double): int-to-double is exact, the division
    // is one IEEE op — bit-identical to the Column formulation
    val d2raw =
      if (n >= 2) 1.0 - distinctBigrams.toDouble / (n - 1).toDouble else 0.0
    // Shannon token entropy, in the algebraic form log2(n) - Σc·log2(c)/n
    // whose TERMS a SQL oracle mirrors exactly (c = 1 contributes 0, so
    // the sum runs only over repeated tokens).  The SUM itself is not
    // order-pinned: this map-iteration order differs from a SQL
    // engine's aggregation order, so the value can differ in the last
    // ulp and the downstream round(6) is what both sides compare on —
    // the same float discipline as every avg/sum-based gate query
    // (boundary-landing odds are ~1e-7 per document).
    var sumCLog2C = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > 1) sumCLog2C += c * (Math.log(c) / Math.log(2.0))
    }
    val entropy =
      if (n == 0) 0.0
      else Math.log(n) / Math.log(2.0) - sumCLog2C / n
    new GenericInternalRow(Array[Any](n.toLong, counts.size.toLong, top.toLong,
      d2raw, entropy))
  }

  /** Column surface: `tokenStats(split(text, " "))`. */
  def tokenStats(toks: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(TokenStatsExpr(GraftBridge.expression(toks)))
  }
}

/** struct(n_tokens, n_distinct, top_cnt, d2raw, entropy) of a token-array
  * column; null when the array is null (null upstream text). */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStats.outputType
  override def nullable: Boolean = true
  override def prettyName: String = "token_stats"

  override def nullSafeEval(a: Any): Any =
    TokenStats.tokenStatsData(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStats.tokenStatsData($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
