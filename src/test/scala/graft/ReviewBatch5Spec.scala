package graft

import org.apache.spark.sql.functions._
import graft.core.EzFrame

/** Regressions for the round-17 advisor batch: negative-decimals
  * round, span_cut positive Long-wrap positions, pack-key chunk_id
  * bound, stack default type casting. */
class ReviewBatch5Spec extends SparkSpec {
  import spark.implicits._

  test("round(x, -n) rounds to tens/hundreds like numpy") {
    // round(x, -1) parses as Un("-", Num(1)) — it must compile to
    // bround(x, -1), not die on 'decimals must be an integer literal'
    val df = Seq(1234.567, 45.0, -1251.0).toDF("x")
    val e = EzFrame(df)
    val r1 = df.select(e.evalexpr("round(x, -1)").cast("double")).collect().map(_.getDouble(0))
    assert(r1.toSeq == Seq(1230.0, 40.0, -1250.0)) // half-to-even at the tens digit
    val r2 = df.select(e.evalexpr("round(x, -2)").cast("double")).collect().map(_.getDouble(0))
    assert(r2.toSeq == Seq(1200.0, 0.0, -1300.0))
    // a fractional negative scale is still rejected loudly
    val err = intercept[IllegalArgumentException] { e.evalexpr("round(x, -1.5)") }
    assert(err.getMessage.contains("literal"))
  }

  test("span_cut rejects positions that wrap to small POSITIVE ints") {
    // 2^32 + 2 truncates through toInt to +2 — before the raw-Long
    // guard it bypassed the st < 0 check and silently cut [2, 2+w)
    val wrap = (1L << 32) + 2L
    val df = Seq(("abcdefghij", Array(wrap))).toDF("t", "pos")
    val e = intercept[Exception] {
      df.select(graft.functions.SpanCut.cutSpans(col("t"), col("pos"), 3).as("c")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => String.valueOf(x.getMessage)).toSeq
    assert(messages(e).exists(_.contains("[1, 2^31-1]")))
    // negative-wrap (past 2^31) and pos <= 0 land in the same guard
    val neg = Seq(("abcdefghij", Array((1L << 31) + 1L))).toDF("t", "pos")
    val e2 = intercept[Exception] {
      neg.select(graft.functions.SpanCut.cutSpans(col("t"), col("pos"), 3).as("c")).collect()
    }
    assert(messages(e2).exists(_.contains("[1, 2^31-1]")))
    // in-range positions still cut correctly
    val ok = Seq(("abcdefghij", Array(2L, 8L))).toDF("t", "pos")
      .select(graft.functions.SpanCut.cutSpans(col("t"), col("pos"), 3).as("c"))
      .head().getString(0)
    assert(ok == "aefg")
  }

  test("pack key asserts BOTH bounds: chunk_id overflow fails loudly") {
    // a chunk_id >= 2^20 would bleed into the doc bits of the
    // synthetic pack key and corrupt pack ordering silently — the
    // in-plan assert must catch it, not just the doc_id bound
    import graft.operators.Pipeline
    val bad = Seq((1L, 1L << Pipeline.ChunkKeyShift)).toDF("doc_id", "chunk_id")
    val e = intercept[Exception] {
      bad.select(Pipeline.packOrder.as("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => String.valueOf(x.getMessage)).toSeq
    assert(messages(e).exists(_.contains("chunk_id")))
    // valid keys are strictly ordered across the (doc, chunk) grid
    val ok = Seq((0L, 5L), (1L, 0L), (1L, 3L)).toDF("doc_id", "chunk_id")
      .select(Pipeline.packOrder.as("k")).collect().map(_.getLong(0))
    assert(ok.sameElements(ok.sorted) && ok.distinct.length == 3)
  }

  test("stack casts compatible defaults to the present side's type") {
    // default 0 (int literal) for a DOUBLE column must union cleanly —
    // the lit(0) used to arrive as IntegerType and fail unionByName
    val a = EzFrame(Seq((1L, "x")).toDF("id", "tag"))
    val b = EzFrame(Seq((2L, 7.5)).toDF("id", "w"))
    val out = a.stack(b, defaults = Map("w" -> 0, "tag" -> "NONE")).df.orderBy("id")
    assert(out.schema("w").dataType == org.apache.spark.sql.types.DoubleType)
    val rows = out.collect()
    assert(rows(0).getAs[Double]("w") == 0.0 && rows(1).getAs[String]("tag") == "NONE")
  }
}
