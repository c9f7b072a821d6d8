package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE ENCODE kernel — applies a trained merge table
  * ([[graft.operators.TextAnalysis.bpeTopMerges]] output) to text:
  * each whitespace word starts as character symbols and the merges
  * apply IN RANK ORDER, each left-to-right non-overlapping — exactly
  * the trainer's own vocab-transformation step, so a word seen in
  * training segments identically to its final training-vocab form.
  *
  * The merge table is driver-bounded by construction (`rounds` rows)
  * and rides into generated code as a codegen reference object; the
  * encode is a scan-stage kernel — zero shuffle, the token stream
  * never leaves the row. */
object BpeEncode {

  /** Left-to-right non-overlapping single-merge pass (the trainer's
    * mergeTokens, over UTF8String symbols). */
  private def mergePass(toks: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) { out += (l + r); i += 2 }
      else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Tokens of the (normalized) text under the merge table. */
  def encodeData(s: UTF8String, merges: Array[(String, String)]): ArrayData = {
    val words = s.toString.split(" ")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var toks = w.map(_.toString).toArray
        var mi = 0
        while (mi < merges.length && toks.length > 1) {
          val (l, r) = merges(mi)
          toks = mergePass(toks, l, r)
          mi += 1
        }
        toks.foreach(t => out += UTF8String.fromString(t))
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column surface: token array of `text` (normalize it first) under
    * the rank-ordered merge list. */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(BpeEncodeExpr(GraftBridge.expression(text), merges.toArray))
  }
}

/** Token array of a (normalized) string column under a trained BPE
  * merge table. */
case class BpeEncodeExpr(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(s: Any): Any =
    BpeEncode.encodeData(s.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw-typed reference: janino has no generics, and Scala's
    // Array[(String, String)] erases to Tuple2[] anyway
    val mRef = ctx.addReferenceObj("bpeMerges", merges, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.encodeData($c, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
