package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd vector similarity kernels over `array<double>` columns.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`/`transform`)
  * have no `doGenCode` — they evaluate INTERPRETED, allocating a lambda
  * frame per element.  For similarity search that interpreter tax is
  * the hot loop (measured: brute-force pairs over dim-64 vectors spent
  * ~25 s of a 28 s query inside interpreted HOF eval).  These
  * expressions emit a tight Java loop via a static call, so dot/cosine
  * participate in whole-stage codegen like any builtin (same pattern
  * as [[Healpix]], SURVEY.md §4.3 custom-Expression rung).
  *
  * Semantics (shared by eval and codegen):
  *  - element count = min(|a|, |b|) (defensive; normal inputs agree),
  *  - null ELEMENTS count as 0.0,
  *  - zero-norm input → cosine NaN, never an ANSI divide error
  *    (a failed encode / padding vector must not kill the job).
  */
object VectorSim {

  def dotData(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }

  def cosineData(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (a.isNullAt(i)) 0.0 else a.getDouble(i)
      val yi = if (b.isNullAt(i)) 0.0 else b.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) Double.NaN else dot / denom
  }

  def l2Data(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (a.isNullAt(i)) 0.0 else a.getDouble(i)
      val yi = if (b.isNullAt(i)) 0.0 else b.getDouble(i)
      val d = xi - yi
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** Count of positions where two long arrays agree — the MinHash
    * full-signature agreement estimator's kernel (est_jaccard =
    * agree / k).  A zip_with/filter/size composition is interpreted
    * AND lands in join conditions and distinct grouping keys, where it
    * runs once per band-collision row; an unrolled element_at tree
    * keeps codegen but explodes the expression tree k-fold.  This is
    * the tiny-tree + codegen middle path. */
  def agreeCountData(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def agreeCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ArrayAgreeCount(
      GraftBridge.expression(a.cast(ArrayType(LongType))),
      GraftBridge.expression(b.cast(ArrayType(LongType)))))
  }

  private def lift(c: Column): Expression = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.expression(c.cast(ArrayType(DoubleType)))
  }

  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(VectorSimExpr("cosine", lift(a), lift(b)))
  }

  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(VectorSimExpr("dot", lift(a), lift(b)))
  }

  def l2(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(VectorSimExpr("l2", lift(a), lift(b)))
  }
}

/** One expression for the three kernels; `kind` selects the static
  * method both `nullSafeEval` and the generated code call. */
case class VectorSimExpr(kind: String, left: Expression, right: Expression)
    extends BinaryExpression {
  require(Set("cosine", "dot", "l2").contains(kind), s"unknown kernel '$kind'")

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"vector_$kind"

  private def method: String = kind match {
    case "cosine" => "cosineData"
    case "dot" => "dotData"
    case "l2" => "l2Data"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    kind match {
      case "cosine" => VectorSim.cosineData(x, y)
      case "dot" => VectorSim.dotData(x, y)
      case "l2" => VectorSim.l2Data(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorSim.$method($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Agreement count over two `array<long>` columns (see
  * [[VectorSim.agreeCountData]]). */
case class ArrayAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "array_agree_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorSim.agreeCountData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorSim.agreeCountData($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
