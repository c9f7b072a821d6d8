package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operators Spark lacks as builtins, composed from
  * shuffle-friendly primitives (preference (a) of the custom-operator
  * ladder — no custom plan node needed, so Catalyst/AQE keep planning
  * freedom).
  */
object Relational {

  /** As-of join (backward): each left row picks the latest right row
    * with `right.ts <= left.ts` within the same key group.
    *
    * Composition: union both sides on (keys, ts), then one
    * partitionBy(keys).orderBy(ts) window carries the most recent
    * right-side values forward (`last(ignoreNulls)` over unbounded
    * preceding).  ONE shuffle + sort over |L|+|R| rows — contrast a
    * naive theta-join (|L|·|R|).  Equal timestamps are inclusive:
    * right rows sort before left rows at the same instant.
    *
    * @param rightCols right columns carried to the output (renamed as
    *                  given in the map: rightName -> outputName)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Map[String, String]): DataFrame = {
    val sideCol = "_graft_side"
    val tsCol = "_graft_ts"
    val l = left
      .withColumn(sideCol, lit(1))
      .withColumn(tsCol, col(leftTs))
    val r0 = right.select((keys.map(col) :+ col(rightTs).as(tsCol)) ++
      rightCols.map { case (from, to) => col(from).as(to) }: _*)
      .withColumn(sideCol, lit(0))
    val unioned = l.unionByName(r0, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.values.foldLeft(unioned) { (df, out) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    carried.filter(col(sideCol) === 1).drop(sideCol, tsCol)
  }

  /** Range (interval) join on event time: pairs within `windowSec`
    * seconds of each other, same key.  Composition: both sides bucket
    * to floor(epoch / windowSec); each left row joins buckets
    * {b-1, b, b+1} and the exact predicate filters — equi-join shuffle
    * on (key, bucket) instead of a nested-loop theta join.  Candidate
    * blowup is 3x, not |L|·|R|.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTs: String, rightTs: String, windowSec: Long,
                rightCols: Map[String, String]): DataFrame = {
    // microsecond-exact arithmetic (unix_timestamp would truncate to
    // seconds and silently change the predicate)
    val winUs = windowSec * 1000000L
    val lb = "_graft_bucket"
    val l = left.withColumn(lb,
      explode(array(Seq(-1L, 0L, 1L).map(d => floor(unix_micros(col(leftTs)) / winUs) + d): _*)))
    val r = right.select((keys.map(col) :+ col(rightTs).as("_graft_rts")) ++
        rightCols.map { case (from, to) => col(from).as(to) }: _*)
      .withColumn(lb, floor(unix_micros(col("_graft_rts")) / winUs))
    l.join(r, keys :+ lb)
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col("_graft_rts"))) <= winUs)
      .drop(lb)
      .withColumnRenamed("_graft_rts", "matched_ts")
  }
}
