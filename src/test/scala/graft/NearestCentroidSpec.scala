package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.NearestCentroids

/** The matrix-argmin kernel against a direct Scala model of the OLD
  * unrolled formulation's semantics: l2 with min-length fold and
  * null-elements-as-0, Double.compare ordering (NaN greatest), ties
  * toward the lowest centroid id, top-n ascending. */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def expr(vec: org.apache.spark.sql.Column, cids: Array[Long],
                   cents: Array[Array[Double]], n: Int) =
    GraftBridge.column(NearestCentroids(
      GraftBridge.expression(vec.cast(ArrayType(DoubleType))), cids, cents, n))

  private def modelL2(v: Seq[Option[Double]], c: Array[Double]): Double = {
    val n = math.min(v.size, c.length)
    math.sqrt((0 until n).map { i =>
      val x = v(i).getOrElse(0.0) - c(i); x * x
    }.sum)
  }

  private def modelTop(v: Seq[Option[Double]], cids: Array[Long],
                       cents: Array[Array[Double]], n: Int): Seq[(Double, Long)] =
    cids.zip(cents).map { case (cid, c) => (modelL2(v, c), cid) }
      .sortWith { case ((d1, c1), (d2, c2)) =>
        val cmp = java.lang.Double.compare(d1, d2)
        cmp < 0 || (cmp == 0 && c1 < c2)
      }.take(n).toSeq

  test("matches the model over random vectors, ties, NaN elements, and length mismatches") {
    val rnd = new scala.util.Random(7)
    val k = 13
    val dim = 6
    val cids = Array.tabulate(k)(j => (j * 3 + 1).toLong)
    val cents = Array.fill(k)(Array.fill(dim)(math.floor(rnd.nextDouble() * 4) / 2))
    // duplicate one centroid exactly → guaranteed distance tie, the
    // lower cid must win
    cents(7) = cents(2).clone()
    val vecs: Seq[Seq[Option[Double]]] =
      Seq.fill(40)(Seq.fill(dim)(Some(math.floor(rnd.nextDouble() * 4) / 2))) ++ Seq(
        Seq.fill(dim)(Some(0.0)),
        Seq(Some(1.0), None, Some(2.0)),                  // null elements → 0.0
        Seq(Some(1.0), Some(2.0)),                        // shorter than centroids
        Seq.fill(dim + 3)(Some(1.0)),                     // longer than centroids
        Seq(Some(Double.NaN)) ++ Seq.fill(dim - 1)(Some(1.0))) // NaN distance sorts last
    for (v <- vecs; n <- Seq(1, 3, k + 5)) {
      val got = Seq(Tuple1(v)).toDF("v")
        .select(expr(col("v"), cids, cents, n).as("r"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getLong(1)))
      val want = modelTop(v, cids, cents, n)
      assert(got.size == math.min(n, k))
      // compare with Double.compare so NaN == NaN positionally
      assert(got.size == want.size && got.zip(want).forall { case ((gd, gc), (wd, wc)) =>
        java.lang.Double.compare(gd, wd) == 0 && gc == wc
      }, s"v=$v n=$n: got $got want $want")
    }
  }

  test("null vector yields null; codegen and interpreted agree; large k stays in codegen") {
    val k = 300 // far past the old unrolled formulation's ~80-centroid Janino cliff
    val cids = Array.tabulate(k)(_.toLong)
    val cents = Array.tabulate(k)(j => Array.tabulate(4)(d => (j * 4 + d).toDouble))
    val df = Seq(Tuple1(Seq(5.0, 6.0, 7.0, 8.0))).toDF("v")
      .unionByName(Seq(Tuple1(null.asInstanceOf[Seq[Double]])).toDF("v"))
    val out = df.select(expr(col("v"), cids, cents, 2).as("r")).collect()
    val hit = out.map(r => Option(r.getSeq[org.apache.spark.sql.Row](0)))
    assert(hit.count(_.isEmpty) == 1) // the null row stays null
    val top = hit.flatten.head.map(_.getLong(1)).toSeq
    assert(top == Seq(1L, 2L)) // (5,6,7,8): d(c1)=2, d(c2)=6, d(c0)=10
    // the plan's projection carries the kernel (WholeStageCodegen span)
    val plan = df.select(expr(col("v"), cids, cents, 1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("nearest_centroids") || plan.contains("WholeStageCodegen"), plan)
  }
}
