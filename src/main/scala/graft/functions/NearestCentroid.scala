package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Matrix-referenced nearest-centroid search: the `n` cells nearest a
  * vector, ordered by (l2, centroid_id) — the assignment kernel under
  * cellAssigned / ivfAssign / ivfTopK / PQ coarse quantization.
  *
  * Replaces the unrolled literal argmin
  * (`array_min(array(struct(l2(v, lit(c0)), cid0), ...))`), whose
  * generated code grew LINEARLY with the centroid count: past ~80
  * centroids the projection blew Janino's 64 KB method limit and the
  * whole stage fell back to interpreted eval — exactly when the
  * population discipline (k ≈ n/targetCell) makes k large.  Here the
  * centroid matrix rides along as a REFERENCED object
  * (`ctx.addReferenceObj`), the generated code is one static call
  * regardless of k, and the projection stays inside whole-stage
  * codegen at any centroid count (the [[VectorSim]] pattern).
  *
  * Semantics are bit-identical to the literal formulation and pinned
  * by every assignment oracle (q47/q72/q87/q89/q91/q96/q127):
  *  - distance = [[VectorSim.l2Data]]'s fold: element count
  *    min(|v|, |c|), null vector ELEMENTS as 0.0, sqrt at the end;
  *  - ordering = Spark's struct ordering on (d, cid):
  *    `java.lang.Double.compare` (NaN sorts greatest) then cid asc.
  */
case class NearestCentroids(child: Expression, cids: Array[Long],
                            cents: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  require(cids.length == cents.length && cids.nonEmpty, "cids/cents must align and be non-empty")
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroids.topN(v.asInstanceOf[ArrayData], cids, cents, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCentroids.topN($c, $cidsRef, $centsRef, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {

  /** The `min(n, k)` nearest centroids by (l2, cid), ascending.  n is
    * tiny (1 for assignment, nprobe for probes), so repeated selection
    * is O(n·k) with zero allocation beyond the result. */
  def topN(vec: ArrayData, cids: Array[Long], cents: Array[Array[Double]], n: Int): ArrayData = {
    val k = cids.length
    val ds = new Array[Double](k)
    var j = 0
    while (j < k) { ds(j) = l2(vec, cents(j)); j += 1 }
    val m = math.min(n, k)
    val used = new Array[Boolean](k)
    val out = new Array[Any](m)
    var p = 0
    while (p < m) {
      var best = -1
      var bd = 0.0
      var bc = 0L
      var i = 0
      while (i < k) {
        if (!used(i)) {
          val cmp = if (best < 0) -1 else java.lang.Double.compare(ds(i), bd)
          if (cmp < 0 || (cmp == 0 && cids(i) < bc)) { best = i; bd = ds(i); bc = cids(i) }
        }
        i += 1
      }
      used(best) = true
      out(p) = InternalRow(ds(best), cids(best))
      p += 1
    }
    new GenericArrayData(out)
  }

  // VectorSim.l2Data's exact fold with the centroid side as a plain
  // array (centroids are driver-collected and never null)
  private def l2(a: ArrayData, c: Array[Double]): Double = {
    val n = math.min(a.numElements(), c.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (a.isNullAt(i)) 0.0 else a.getDouble(i)
      val d = xi - c(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }
}
