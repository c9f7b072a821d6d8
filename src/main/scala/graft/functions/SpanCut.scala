package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Span-surgery kernel for exact-substring dedup REMOVAL: given a
  * string and the sorted 1-based start positions of width-`width`
  * windows to delete, cut the union of those [pos, pos+width) ranges
  * in one pass.
  *
  * Positions refer to CHARACTERS of the normalized text
  * ([[graft.operators.TextAnalysis.normalize]]), which is ASCII by
  * construction (the normalizer keeps only [a-z0-9 ]), so byte offsets
  * equal character offsets and the cut is a straight byte-range copy —
  * no codepoint walking.  Overlapping windows merge naturally: the
  * copy skips while inside ANY pending range.
  *
  * Reference semantics: the removal policy of exact-substring dedup
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better"): cut the repeated span, keep the first document's copy —
  * [[graft.operators.Dedup.removeRepeatedSpans]] composes the policy;
  * this kernel is the string surgery.
  */
object SpanCut {

  /** Cut the union of [p, p+width) char ranges (1-based sorted
    * positions) from an ASCII string. */
  def cutData(s: UTF8String, positions: ArrayData, width: Int): UTF8String = {
    val n = positions.numElements()
    if (n == 0) return s
    val bytes = s.getBytes // ASCII contract: bytes == chars
    val len = bytes.length
    val out = new Array[Byte](len)
    var w = 0
    var i = 0 // byte/char cursor, 0-based
    var pi = 0
    var cutEnd = -1 // exclusive end of the active cut range
    var prevSt = Int.MinValue // sorted-contract check rides the merge loop
    while (i < len) {
      // open/extend the active range with every window starting here.
      // Positions are 1-BASED Longs but the cursor is an Int: validate
      // the RAW Long before truncating — a value in [2^32, 2^32+len]
      // wraps through toInt to a small POSITIVE int and would silently
      // cut a wrong range (negative wraps were caught by an st < 0
      // check, positive wraps were not).
      while (pi < n && {
        val pL = positions.getLong(pi)
        if (pL < 1L || pL > Int.MaxValue.toLong) throw new IllegalArgumentException(
          s"span_cut: positions are 1-based and must be in [1, 2^31-1], got $pL")
        pL.toInt - 1 <= i
      }) {
        val st = positions.getLong(pi).toInt - 1
        // an unsorted array would open late ranges after their bytes
        // were already copied — silently WRONG output; fail loudly
        // (one comparison per position, the sketch-codec discipline)
        if (st < prevSt) throw new IllegalArgumentException(
          s"span_cut: positions must be sorted ascending (got ${st + 1} after ${prevSt + 1})")
        prevSt = st
        val en = st + width
        if (en > cutEnd) cutEnd = en
        pi += 1
      }
      if (i >= cutEnd) { out(w) = bytes(i); w += 1 }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, w))
  }

  /** Column surface: `cutSpans(normText, sortedPositions, width)`. */
  def cutSpans(text: Column, positions: Column, width: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SpanCutExpr(GraftBridge.expression(text),
      GraftBridge.expression(positions), width))
  }
}

/** Cut sorted 1-based `width`-wide char ranges out of an ASCII string
  * column. */
case class SpanCutExpr(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {
  require(width >= 1, s"span_cut needs width >= 1, got $width")

  override def dataType: DataType = StringType
  override def prettyName: String = "span_cut"

  override def nullSafeEval(s: Any, p: Any): Any =
    SpanCut.cutData(s.asInstanceOf[UTF8String], p.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) =>
      s"${ev.value} = graft.functions.SpanCut.cutData($s, $p, $width);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
