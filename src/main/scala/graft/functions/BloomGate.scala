package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-membership hit counter — the sketch-side contamination
  * prefilter kernel: counts how many elements of a long-array column
  * might be members of a Bloom filter.
  *
  * A Bloom filter has NO FALSE NEGATIVES, so a document whose shingle
  * set truly overlaps the benchmark set always reports hits ≥ its true
  * overlap — the prefilter can only over-keep (by the configured fpp),
  * never lose a contaminated document.  The filter rides into
  * generated code as a codegen reference object (the standard Spark
  * mechanism for sketch-carrying expressions), so the scan stays
  * whole-stage-codegen with zero shuffle and zero joins.
  */
object BloomGate {

  /** Count of array elements the filter might contain. */
  def hitCountData(arr: ArrayData, bf: BloomFilter): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (bf.mightContainLong(arr.getLong(i))) c += 1
      i += 1
    }
    c
  }

  /** Column surface: `bloomHitCount(longArrayCol, filter)`. */
  def bloomHitCount(arr: Column, bf: BloomFilter): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(BloomHitCountExpr(GraftBridge.expression(arr), bf))
  }
}

/** Count of `array<long>` elements that might be members of the
  * captured Bloom filter. */
case class BloomHitCountExpr(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hit_count"

  override def nullSafeEval(a: Any): Any =
    BloomGate.hitCountData(a.asInstanceOf[ArrayData], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomGate.hitCountData($c, $bfRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
