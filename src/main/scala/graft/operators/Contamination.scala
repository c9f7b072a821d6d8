package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark-contamination check for training corpora: for each
  * (document, benchmark item) pair, the n-gram containment
  * `|shingles(bench) ∩ shingles(doc)| / |shingles(bench)|` — 1.0 when
  * the benchmark text appears (modulo normalization) inside the
  * document; the standard decontamination score.
  *
  * Scale shape: the benchmark side is small by construction (eval
  * sets), so its shingle-hash sets — one codegen'd pass each
  * ([[graft.functions.MinHash.shingleHashSet]]) — broadcast; the
  * corpus pays ONE linear scan computing its own set per doc and one
  * merge-walk intersection per (doc, bench) pair.  No shuffle of the
  * corpus at all: the cross join is broadcast-nested-loop against a
  * handful of benchmark rows.
  */
object Contamination {

  /** Benchmark DECONTAMINATION by span surgery — the removal ACTION
    * the detection surfaces ([[containment]], [[bloomPrefilter]]) feed:
    * every width-`width` window of a document's normalized text that
    * also appears anywhere in the benchmark's normalized text is CUT
    * (overlapping cut windows merge — the same
    * [[graft.functions.SpanCut]] kernel as
    * [[Dedup.removeRepeatedSpans]]), so no benchmark `width`-gram
    * survives into training.  This is the standard eval-
    * decontamination action (cut the overlap, keep the document).
    *
    * Scale shape: the benchmark evidence is its DISTINCT window-hash
    * set — small by construction (eval sets), broadcast by AQE — so
    * the corpus pays one linear rolling-hash scan and a broadcast
    * semi-join per window; no corpus shuffle on the span hash.  The
    * per-doc surgery is one sorted position list into the codegen'd
    * cut kernel.  Span matching uses the 64-bit lane-1 rolling hash
    * (collision bound as documented at [[Dedup.repeatedSpans]]).
    *
    * SHORT-ITEM CAVEAT (the same class [[bloomPrefilter]] documents):
    * a benchmark item whose NORMALIZED text is shorter than `width`
    * has no width-char window and contributes nothing to the evidence
    * — its contamination is NOT cut by this operator.  Pick `width` ≤
    * the shortest benchmark item you must cover, or route short items
    * through [[containment]] with a small shingle `n` instead.
    *
    * @return (doc_id, text_clean, n_spans_cut) — cleaned NORMALIZED
    *         text, like [[Dedup.removeRepeatedSpans]] */
  def removeBenchmarkSpans(docs: DataFrame, docId: Column, docText: Column,
                           bench: DataFrame, benchText: Column,
                           width: Int = 50): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    import graft.functions.WindowHash
    val normed = docs.select(docId.as("doc_id"), TextAnalysis.normalize(docText).as("norm"))
    val evidence = bench
      .select(TextAnalysis.normalize(benchText).as("bnorm"))
      .filter(length(col("bnorm")) - lit(width - 1) >= 1)
      .select(explode(WindowHash.windowHashes(col("bnorm"), width)).as("h"))
      .distinct()
    val hits = normed.filter(length(col("norm")) - lit(width - 1) >= 1)
      .select(col("doc_id"),
        posexplode(WindowHash.windowHashes(col("norm"), width)).as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("pos"), col("h"))
      .join(evidence, Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("cut_positions"),
           count(lit(1)).as("n_spans_cut"))
    Dedup.applySpanCuts(normed, hits, width)
  }

  /** All (doc, bench) pairs with containment ≥ `threshold`.
    *
    * @param docs    corpus (idCol, textCol)
    * @param bench   benchmark items (benchIdCol, benchTextCol); SMALL —
    *                it is broadcast
    * @param n       shingle width (chars, over normalized text)
    */
  def containment(docs: DataFrame, docId: Column, docText: Column,
                  bench: DataFrame, benchId: Column, benchText: Column,
                  n: Int = 5, threshold: Double = 0.8): DataFrame = {
    // the bloomPrefilter tier's contract, enforced here too: a
    // degenerate threshold (<= 0) would silently emit the full
    // doc x bench cross product instead of a pruned result
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must lie in (0, 1], got $threshold")
    require(n >= 1, s"shingle width must be >= 1, got $n")
    val dsets = docs.select(docId.as("doc_id"),
        graft.functions.MinHash.shingleHashSet(TextAnalysis.normalize(docText), n).as("dhs"))
      .filter(col("dhs").isNotNull)
    val bsets = bench.select(benchId.as("bench_id"),
        graft.functions.MinHash.shingleHashSet(TextAnalysis.normalize(benchText), n).as("bhs"))
      .filter(col("bhs").isNotNull)
    dsets.crossJoin(broadcast(bsets))
      .withColumn("n_overlap",
        graft.functions.MinHash.intersectCount(col("dhs"), col("bhs")))
      .withColumn("containment",
        round(col("n_overlap").cast(DoubleType) / size(col("bhs")).cast(DoubleType), 6))
      // gate on the ROUNDED value the caller sees (the exactPairs /
      // lshPairs convention): filtering the raw ratio while reporting
      // the rounded one could exclude a row whose visible containment
      // equals the threshold exactly
      .filter(col("containment") >= threshold)
      .select(col("doc_id"), col("bench_id"), col("n_overlap"), col("containment"))
  }

  /** Bloom-sketch contamination PREFILTER — the tier before
    * [[containment]] when the benchmark suite is too large to pay a
    * per-(doc, bench) merge walk for every document: ONE Bloom filter
    * over ALL benchmark shingle hashes (a driver-bounded sketch,
    * ~1.2 MB at a million shingles / 1% fpp) and one codegen'd
    * membership count per document — zero joins, zero shuffle, and the
    * overwhelmingly-clean corpus majority drops out before the exact
    * pairwise stage runs on the survivors.
    *
    * NO FALSE NEGATIVES vs the `threshold` containment gate: a doc
    * with containment ≥ threshold against SOME benchmark item carries
    * at least threshold·|that item's shingle set| of the filter's true
    * members, and a Bloom filter never misses a member — so the keep
    * cut `n_suspect ≥ ⌊threshold · min_item_set_size⌋` can only
    * over-keep.  The cut must be well above 1: per-shingle false
    * positives compound per document (a 300-shingle doc at fpp 1% has
    * a ~95% chance of ≥1 spurious hit), so an any-hit prefilter keeps
    * everything — the threshold-derived cut is what makes the tier
    * filter at all (spec-verified against the exact stage).
    *
    * CUT-DERIVATION CAVEAT: the cut comes from the SINGLE SMALLEST
    * benchmark item's shingle-set size, so one degenerate short item
    * (a one-line answer, an empty-ish row) collapses the cut toward 1
    * and the prefilter passes nearly the whole corpus — still correct
    * (over-keep only; the exact stage downstream decides), but the
    * tier stops saving work.  Filter or split very short benchmark
    * items before building the sketch; the chosen cut is surfaced in
    * the output (`cut` column) so a pipeline can alert on collapse.
    *
    * @return surviving docs: (doc_id, n_shingles, n_suspect, cut) */
  def bloomPrefilter(docs: DataFrame, docId: Column, docText: Column,
                     bench: DataFrame, benchText: Column,
                     n: Int = 5, threshold: Double = 0.8,
                     fpp: Double = 0.01,
                     portableHash: Boolean = false): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp in (0,1), got $fpp")
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    if (portableHash)
      return bloomPrefilterPortable(docs, docId, docText, bench, benchText, n, threshold, fpp)
    // the bench shingle pipeline feeds THREE driver-side actions
    // (distinct count for sizing, the filter aggregate, the min item
    // size) — persist it so the suite is normalized and shingled once,
    // and drop the cache before returning (the returned frame only
    // carries the driver-side sketch and cut, never this plan)
    val benchSets = bench
      .select(graft.functions.MinHash.shingleHashSet(
        TextAnalysis.normalize(benchText), n).as("bhs"))
      .filter(col("bhs").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val (bf, minSuspect) =
      try {
        val benchHashes = benchSets.select(explode(col("bhs")).as("h")).distinct()
        // expected-item count from the actual benchmark (small by
        // contract); max(1, ...) keeps the sketch constructor legal on
        // an empty suite (the filter then matches nothing — correct)
        val nItems = math.max(1L, benchHashes.count())
        val filt = benchHashes.stat.bloomFilter("h", nItems, fpp)
        val minItem = benchSets.agg(min(size(col("bhs")))).collect()(0)
        val cut =
          if (minItem.isNullAt(0)) Long.MaxValue // no benchmark shingles: keep nothing
          else math.max(1L, math.floor(threshold * minItem.getInt(0)).toLong)
        (filt, cut)
      } finally { benchSets.unpersist(); () }
    docs
      .select(docId.as("doc_id"),
        graft.functions.MinHash.shingleHashSet(
          TextAnalysis.normalize(docText), n).as("dhs"))
      .filter(col("dhs").isNotNull)
      .select(col("doc_id"), size(col("dhs")).cast(LongType).as("n_shingles"),
        graft.functions.BloomGate.bloomHitCount(col("dhs"), bf).as("n_suspect"))
      .filter(col("n_suspect") >= minSuspect)
      // surface the derived cut (constant per run): a cut that
      // collapsed toward 1 — one short benchmark item — is visible to
      // the caller instead of silently defeating the tier
      .withColumn("cut", lit(minSuspect))
  }

  /** Portable twin of [[bloomPrefilter]]: shingle hashes come from the
    * md5-window kernel and the sketch is
    * [[graft.functions.BloomGate.PortableBloom]] — every bit position
    * is plain 64-bit integer arithmetic a SQL oracle repeats verbatim,
    * so even the FALSE POSITIVES match and the query hash-checks.
    * Same no-false-negative contract, same fpp-bounded over-keep, same
    * output schema; the Spark-BloomFilter path stays the production
    * default (its Murmur bits cost less than md5). */
  private def bloomPrefilterPortable(docs: DataFrame, docId: Column, docText: Column,
                                     bench: DataFrame, benchText: Column,
                                     n: Int, threshold: Double, fpp: Double): DataFrame = {
    import graft.functions.{BloomGate, WindowHash}
    val benchSets = bench
      .select(array_distinct(WindowHash.md5WindowHashes(
        TextAnalysis.normalize(benchText), n)).as("bhs"))
      .filter(col("bhs").isNotNull && size(col("bhs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val (bf, minSuspect) =
      try {
        // bench suites are driver-bounded by contract (eval sets);
        // fail fast rather than building an unbounded driver set
        val hashes = benchSets.select(explode(col("bhs")).as("h")).distinct()
          .limit(4000001).collect().map(_.getLong(0))
        require(hashes.length <= 4000000,
          "bloomPrefilter(portableHash): benchmark suite exceeds 4M distinct " +
            "shingles — shard the suite or use the Spark-BloomFilter path")
        val nItems = math.max(1L, hashes.length.toLong)
        val filt = BloomGate.PortableBloom.build(hashes, nItems, fpp)
        val minItem = benchSets.agg(min(size(col("bhs")))).collect()(0)
        val cut =
          if (minItem.isNullAt(0)) Long.MaxValue
          else math.max(1L, math.floor(threshold * minItem.getInt(0)).toLong)
        (filt, cut)
      } finally { benchSets.unpersist(); () }
    docs
      .select(docId.as("doc_id"),
        array_distinct(WindowHash.md5WindowHashes(
          TextAnalysis.normalize(docText), n)).as("dhs"))
      .filter(col("dhs").isNotNull)
      .select(col("doc_id"), size(col("dhs")).cast(LongType).as("n_shingles"),
        BloomGate.portableBloomHitCount(col("dhs"), bf).as("n_suspect"))
      .filter(col("n_suspect") >= minSuspect)
      .withColumn("cut", lit(minSuspect))
  }
}
