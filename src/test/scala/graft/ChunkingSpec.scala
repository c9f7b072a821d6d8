package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Contamination, TextAnalysis}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk boundaries: coverage, overlap, tail, empty and null text") {
    val df = Seq(
      (1L, "a" * 1000),   // 1000 chars, width 500 stride 400 -> starts 0,400,800 (wait: ceil(500/400)=2 -> 3 chunks)
      (2L, "b" * 500),    // exactly one window
      (3L, "c" * 501),    // one char past -> 2 chunks
      (4L, ""),           // empty -> one empty chunk
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val c = Chunking.chunk(df, col("doc_id"), col("text"), width = 500, stride = 400)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len")))
    val byDoc = c.groupBy(_._1)
    assert(byDoc(1L).map(x => (x._3, x._4)).sorted.toSeq == Seq((0L, 500L), (400L, 500L), (800L, 200L)))
    assert(byDoc(2L).map(x => (x._3, x._4)).toSeq == Seq((0L, 500L)))
    assert(byDoc(3L).map(x => (x._3, x._4)).sorted.toSeq == Seq((0L, 500L), (400L, 101L)))
    assert(byDoc(4L).map(x => (x._3, x._4)).toSeq == Seq((0L, 0L)))
    assert(!byDoc.contains(5L))
    // every char of doc 1 is covered by at least one chunk
    val covered = byDoc(1L).flatMap(x => x._3 until (x._3 + x._4)).toSet
    assert(covered == (0L until 1000L).toSet)
  }

  test("chunk fingerprints dedupe identical windows") {
    val df = Seq((1L, "xyz" * 200), (2L, "xyz" * 200)).toDF("doc_id", "text")
    val fp = Chunking.chunkFingerprints(df, col("doc_id"), col("text"), 300, 300)
    val groups = fp.groupBy("chunk_id", "fp").count().collect()
    assert(groups.forall(_.getAs[Long]("count") == 2L)) // same window -> same fp across docs
  }

  test("contamination: planted benchmark prefix scores 1.0, unrelated low") {
    val docs = Seq(
      (1L, "the solar wind carries charged particles outward from the corona into interplanetary space all year"),
      (2L, "completely different musings about database engines and columnar storage formats and shuffles"),
      (3L, "the solar wind carries charged particles outward plus extra trailing words beyond the prefix"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the solar wind carries charged particles outward"))
      .toDF("bid", "btext")
    val out = Contamination.containment(docs, col("doc_id"), col("text"),
        bench, col("bid"), col("btext"), n = 5, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id"),
        r.getAs[Double]("containment"))).toList
    val byDoc = out.map(x => x._1 -> x._3).toMap
    assert(byDoc(1L) == 1.0)          // full benchmark text inside doc 1
    assert(byDoc(3L) == 1.0)          // and inside doc 3
    assert(!byDoc.contains(2L))       // unrelated doc below threshold
    assert(out.forall(_._2 == 100L))
  }

  test("removeBenchmarkSpans cuts exactly the benchmark's windows; Scala reference") {
    // doc 1 embeds the planted benchmark run; doc 2 is clean; doc 3 IS
    // the benchmark source (self-decontamination cuts its prefix too)
    val planted = "the solar wind carries charged particles"  // 40 chars normalized
    val docs = Seq(
      (1L, s"intro words here $planted and trailing content follows after"),
      (2L, "completely different musings about database engines and storage"),
      (3L, s"$planted outward from the corona"))
      .toDF("doc_id", "text")
    val bench = Seq(planted).toDF("btext")
    val width = 20
    val out = Contamination.removeBenchmarkSpans(docs, col("doc_id"), col("text"),
        bench, col("btext"), width = width)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // Scala reference: cut every width-window of normalized doc text
    // that occurs in the normalized benchmark text, union the ranges
    def norm(s: String) = s.toLowerCase.replaceAll("[^a-z0-9 ]", "")
      .replaceAll(" +", " ").trim
    val bwin = norm(planted).sliding(width).toSet
    for ((id, raw) <- Seq(1L -> s"intro words here $planted and trailing content follows after",
                          2L -> "completely different musings about database engines and storage",
                          3L -> s"$planted outward from the corona")) {
      val t = norm(raw)
      val cuts = (0 to t.length - width).filter(p => bwin(t.substring(p, p + width)))
      val keep = Array.fill(t.length)(true)
      cuts.foreach(p => (p until p + width).foreach(keep(_) = false))
      val expect = t.zipWithIndex.collect { case (c, i) if keep(i) => c }.mkString
      assert(out(id)._1 == expect, s"doc $id: got '${out(id)._1}' want '$expect'")
      assert(out(id)._2 == cuts.length.toLong, s"doc $id cut count")
    }
    assert(out(2L)._2 == 0L && out(1L)._2 > 0L && out(3L)._2 > 0L)
  }

  test("bloomPrefilter: no false negatives vs exact overlap; fpp-bounded extras") {
    // controlled corpus: 300 docs of unique seeded words; the
    // benchmark sentence is planted verbatim into 5 of them
    val rnd = new scala.util.Random(7)
    val benchSentence = "planted benchmark item that must always be caught verbatim"
    val docs = (0 until 300).map { i =>
      val body = Seq.fill(30)(f"w${rnd.nextInt(1000000)}%06d t$i").mkString(" ")
      val text = if (i % 60 == 0) s"$body $benchSentence $body" else body
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val planted = (0 until 300 by 60).map(_.toLong).toSet
    val bench = Seq((1L, benchSentence)).toDF("bid", "btext")
    val keptRows = Contamination.bloomPrefilter(docs, col("doc_id"), col("text"),
        bench, col("btext"), n = 20, threshold = 0.8, fpp = 0.01)
      .collect()
    // the derived cut is surfaced (constant per run) so a collapse
    // toward 1 — one degenerate short benchmark item — is observable
    val cuts = keptRows.map(_.getAs[Long]("cut")).toSet
    assert(cuts.size == 1 && cuts.head > 1L,
      s"expected one well-above-1 derived cut, got $cuts")
    val kept = keptRows.map(_.getLong(0)).toSet
    // exact ground truth: docs the containment gate itself would flag
    val exact = Contamination.containment(docs, col("doc_id"), col("text"),
        bench, col("bid"), col("btext"), n = 20, threshold = 0.8)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(exact == planted, s"ground truth should be the planted docs: $exact")
    assert(exact.subsetOf(kept),
      s"bloom prefilter lost contaminated docs: ${exact.diff(kept)}")
    // the threshold-derived cut actually filters: spurious survivors
    // need ~0.8*|bench set| independent FP hits — essentially none
    assert(kept.size <= exact.size + 5,
      s"prefilter kept ${kept.size} vs exact ${exact.size}")
    // composing prefilter -> exact stage loses nothing
    val surv = docs.join(Seq(kept.toSeq: _*).toDF("doc_id"), Seq("doc_id"), "left_semi")
    val composed = Contamination.containment(surv, col("doc_id"), col("text"),
        bench, col("bid"), col("btext"), n = 20, threshold = 0.8)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(composed == exact)

    // PORTABLE bloom twin: same no-false-negative contract and
    // fpp-bounded over-keep under md5-permutation lane bits (different
    // hash family -> different false positives, same true positives)
    val keptP = Contamination.bloomPrefilter(docs, col("doc_id"), col("text"),
        bench, col("btext"), n = 20, threshold = 0.8, fpp = 0.01, portableHash = true)
      .collect()
    val keptPIds = keptP.map(_.getLong(0)).toSet
    assert(exact.subsetOf(keptPIds),
      s"portable bloom lost contaminated docs: ${exact.diff(keptPIds)}")
    assert(keptPIds.size <= exact.size + 5,
      s"portable prefilter kept ${keptPIds.size} vs exact ${exact.size}")
    assert(keptP.map(_.getAs[Long]("cut")).toSet == cuts,
      "cut derivation must not depend on the hash family")
  }
}

class PipelineSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Pipeline

  test("pretrainCorpus: every gate drops what it should, packing conserves tokens") {
    val words = (1 to 60).map(i => s"word$i").mkString(" ")   // 60 tokens, no punct
    val docs = Seq(
      (1L, words),
      (2L, words),                                      // exact dup of 1 -> dropped
      (3L, "too short to pass the gate"),               // < 50 tokens -> dropped
      (4L, (1 to 60).map(_ => "x.").mkString(" ")),     // punct_ratio 1/3 -> dropped
      (5L, words + " mail me at A.B@c-d.ORG today now")) // passes; email scrubbed
      .toDF("doc_id", "text")
    val out = Pipeline.pretrainCorpus(docs, col("doc_id"), col("text"),
      minTokens = 50, maxPunctRatio = 0.1, width = 100, stride = 80, budget = 64)
    val rows = out.orderBy("bin_id").collect()
    // survivors: docs 1 and 5 only
    assert(rows.map(_.getAs[Long]("first_doc")).min == 1L)
    val totalTokens = rows.map(_.getAs[Long]("sum_tokens")).sum
    // chunk overlap re-counts boundary tokens, so total >= the two
    // docs' own counts and every bin is nonempty
    assert(totalTokens >= 60 + 67 && rows.forall(_.getAs[Long]("n_chunks") > 0))
    // the scrub happened BEFORE chunking: no chunk of doc 5 contains '@'
    val chunks = graft.operators.Chunking.chunk(
      graft.operators.Dedup.deduplicated(
        docs.filter(col("doc_id").isin(1L, 5L))
          .select(col("doc_id"), graft.operators.TextAnalysis.scrubPii(col("text")).as("text")),
        col("text"), col("doc_id")),
      col("doc_id"), col("text"), 100, 80)
    assert(chunks.filter(col("chunk_text").contains("@")).count() == 0)
    assert(chunks.filter(col("chunk_text").contains("<EMAIL>")).count() >= 1)
  }

  test("observed pipeline: same result, stage counters ride the one plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Pipeline.pretrainCorpusObserved(docs, col("doc_id"), col("text"))
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet
    val plain = Pipeline.pretrainCorpus(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rows == plain, "observe nodes must not change the result")
    // counters agree with independently computed stage counts
    val m = out.queryExecution.observedMetrics
    val sig = graft.operators.TextAnalysis.qualitySignals(col("text")).toMap
    val nGated = docs.filter(sig("n_tokens") >= 50 && sig("punct_ratio") <= 0.1).count()
    assert(m("gate").getAs[Long]("n_gated") == nGated)
    val nDeduped = m("dedup").getAs[Long]("n_deduped")
    assert(nDeduped > 0 && nDeduped <= nGated)
    val nChunks = m("chunks").getAs[Long]("n_chunks")
    assert(nChunks >= nDeduped, "every surviving doc yields at least one chunk")
    assert(rows.toSeq.map(_._2).sum == nChunks, "packed chunks are exactly the observed chunks")
    assert(m("chunks").getAs[Long]("n_tokens") ==
      rows.toSeq.map(_._4).sum, "token totals conserved through packing")
  }
}
