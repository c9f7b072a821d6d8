package graft

import org.apache.spark.sql.functions._
import graft.core.EzFrame
import graft.operators.{Binned, Chunking, Packing, Pipeline, TextAnalysis}

/** Regressions for the third adversarial operator-review batch:
  * degenerate-axis loudness, packing key-type and key-range contracts,
  * empty-token/empty-fingerprint text edges, span-cut sorted contract. */
class ReviewBatch3Spec extends SparkSpec {
  import spark.implicits._

  test("Axis with a degenerate range fails loudly instead of silently last-binning") {
    val e = intercept[IllegalArgumentException] {
      Binned.Axis("x", col("x"), 2.0, 2.0, 4)
    }
    assert(e.getMessage.contains("degenerate"))
    intercept[IllegalArgumentException] { Binned.Axis("x", col("x"), 0.0, 1.0, 0) }
  }

  test("padDegenerate widens a constant extent; hist of a constant column works") {
    assert(Binned.padDegenerate(3.0, 3.0) == (2.5, 3.5))
    assert(Binned.padDegenerate(1.0, 2.0) == (1.0, 2.0))
    val ez = EzFrame(Seq(5.0, 5.0, 5.0).toDF("v"))
    val h = new graft.plot.Plotter(ez).hist("v", bins = 4)
    // all three rows land in ONE real bin (not silently clamped with
    // collapsed centers), and the total count is preserved
    val counts = h.data.map(r => r("count").asInstanceOf[Long])
    assert(counts.sum == 3L && counts.max == 3L)
  }

  test("sequentialBins rejects a fractional order key loudly") {
    val df = Seq((1.5, 10L), (1.7, 20L)).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      Packing.sequentialBins(df, col("k"), col("w"), budget = 16L)
    }
    assert(e.getMessage.contains("integral"))
    // the global twin enforces the same contract
    intercept[IllegalArgumentException] {
      Packing.sequentialBinsGlobal(df, col("k"), col("w"), budget = 16L)
    }
  }

  test("pretrainCorpus refuses 64-bit-hash doc ids (pack-key overflow/collision)") {
    val docs = Seq(
      (Long.MaxValue - 17L, ("quality words and the text of a document " * 8).trim),
      (3L, ("other fine prose with the usual words included here " * 8).trim)
    ).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Pipeline.pretrainCorpus(docs, col("doc_id"), col("text"),
        minTokens = 5, maxPunctRatio = 1.0, width = 80, stride = 60, budget = 64L).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("pack key"))
    // in-range ids still pack fine
    val ok = Pipeline.pretrainCorpus(
      docs.withColumn("doc_id", col("doc_id") % 1000L),
      col("doc_id"), col("text"),
      minTokens = 5, maxPunctRatio = 1.0, width = 80, stride = 60, budget = 64L).collect()
    assert(ok.nonEmpty)
  }

  test("countOccurrences refuses an empty token (silent divide-by-zero)") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.countOccurrences(col("t"), "")
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("repeatedSentences does not merge punctuation-only sentences via md5(empty)") {
    val docs = Seq(
      (1L, "hello there friend. ???. more words here."),
      (2L, "totally different text. !!!. other words there.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedSentences(docs, col("doc_id"), col("text"), minDocs = 2)
      .collect()
    // "???" and "!!!" both normalize to "" — before the fix they shared
    // md5("") and surfaced as one fake cross-doc boilerplate row
    assert(out.isEmpty)
    // real cross-doc repeats still surface
    val dup = Seq((1L, "same boilerplate line. unique one."),
      (2L, "same boilerplate line. unique two.")).toDF("doc_id", "text")
    val hits = TextAnalysis.repeatedSentences(dup, col("doc_id"), col("text"), minDocs = 2)
      .collect()
    assert(hits.length == 1 && hits.head.getAs[Long]("n_docs") == 2L)
  }

  test("span_cut fails loudly on unsorted positions instead of corrupting output") {
    val df = Seq(("abcdefghij", Array(8L, 2L))).toDF("t", "pos")
    val e = intercept[Exception] {
      df.select(graft.functions.SpanCut.cutSpans(col("t"), col("pos"), 3).as("c")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => String.valueOf(x.getMessage)).toSeq
    assert(messages(e).exists(_.contains("sorted ascending")))
    // sorted positions still cut the union correctly
    val ok = Seq(("abcdefghij", Array(2L, 8L))).toDF("t", "pos")
      .select(graft.functions.SpanCut.cutSpans(col("t"), col("pos"), 3).as("c"))
      .head().getString(0)
    assert(ok == "aefg") // cut [2,5) "bcd" and [8,11) "hij"
  }
}
