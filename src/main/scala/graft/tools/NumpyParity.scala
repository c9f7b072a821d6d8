package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Engine side of the NumPy differential-parity harness
  * (tools/numpy_parity.py): evaluates each expression from the exprs
  * file over the generated data parquet through the REAL user surface
  * — [[graft.core.EzFrame.evalexpr]] — and writes one output column
  * per expression (`e0`, `e1`, ...) preserving the engine's result
  * TYPES, so the python checker can diff both values and dtype class
  * against real NumPy.  All expressions are evaluated in one
  * projection: this also exercises the translator's claim that every
  * expression stays inside whole-stage codegen (a non-codegen node
  * among ~100 parallel expressions would surface as a plan anomaly,
  * not just a wrong value).
  *
  * Usage: runMain graft.tools.NumpyParity <data.parquet> <exprs.txt> <out.parquet>
  */
object NumpyParity {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: NumpyParity <data.parquet> <exprs.txt> <out.parquet>")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exprSrc = scala.io.Source.fromFile(args(1), "UTF-8")
    val exprs =
      try exprSrc.getLines().map(_.trim).filter(_.nonEmpty).toList
      finally exprSrc.close()
    val fr = graft.core.EzFrame(spark.read.parquet(args(0)))
    // chunked projections, one output dir per chunk: hundreds of
    // compound expressions in ONE select (or one join tree over the
    // chunks) blow the codegen / driver-heap budget — the standing
    // "never inline a big expression k×" caveat.  The checker merges
    // the chunk files on row_id.
    exprs.zipWithIndex.grouped(48).zipWithIndex.foreach { case (chunk, ci) =>
      fr.df.select(col("row_id") +: chunk.map { case (e, k) =>
        fr.evalexpr(e).as(s"e$k")
      }: _*).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"${args(2)}/chunk$ci")
    }
    println(s"evaluated ${exprs.length} expressions -> ${args(2)}")
    spark.stop()
  }
}
