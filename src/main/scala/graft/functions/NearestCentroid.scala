package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

  // loud analysis-time reject of anything but array<double>: an
  // array<float> child would otherwise read 8-byte strides over 4-byte
  // storage in getDouble — garbage distances, silently wrong cells
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "nearest_centroids"

  // case-class equality on Array fields is REFERENCE equality, which
  // would break semanticEquals / plan canonicalization (cache reuse,
  // exchange reuse, subexpression elimination) for structurally
  // identical centroid sets collected twice — compare contents
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroids =>
      child == o.child && n == o.n &&
        java.util.Arrays.equals(cids, o.cids) &&
        cents.length == o.cents.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), o.cents(i)))
    case _ => false
  }
  override def hashCode(): Int = {
    var h = child.hashCode() * 31 + n
    h = h * 31 + java.util.Arrays.hashCode(cids)
    var i = 0
    while (i < cents.length) { h = h * 31 + java.util.Arrays.hashCode(cents(i)); i += 1 }
    h
  }

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

  /** The `min(n, k)` nearest centroids by (l2, cid), ascending.
    * Single pass with one m-sized insertion buffer (m is 1 for
    * assignment, nprobe for probes): O(k·m) compares, and per-row
    * allocation scales with m, never k — this kernel runs per ROW, so
    * k-sized scratch (the old two-array selection) turned large-k
    * assignment into a GC benchmark. */
  def topN(vec: ArrayData, cids: Array[Long], cents: Array[Array[Double]], n: Int): ArrayData = {
    val k = cids.length
    val m = math.min(n, k)
    val bd = new Array[Double](m)
    val bc = new Array[Long](m)
    var filled = 0
    var j = 0
    while (j < k) {
      val d = l2(vec, cents(j))
      val c = cids(j)
      if (filled < m || lessThan(d, c, bd(filled - 1), bc(filled - 1))) {
        var p = if (filled < m) filled else m - 1
        while (p > 0 && lessThan(d, c, bd(p - 1), bc(p - 1))) {
          bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1
        }
        bd(p) = d; bc(p) = c
        if (filled < m) filled += 1
      }
      j += 1
    }
    val out = new Array[Any](filled)
    var p = 0
    while (p < filled) { out(p) = InternalRow(bd(p), bc(p)); p += 1 }
    new GenericArrayData(out)
  }

  @inline private def lessThan(d1: Double, c1: Long, d2: Double, c2: Long): Boolean = {
    val cmp = java.lang.Double.compare(d1, d2)
    cmp < 0 || (cmp == 0 && c1 < c2)
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
