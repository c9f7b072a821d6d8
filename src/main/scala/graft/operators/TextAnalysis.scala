package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting.  Beyond-reference extension (SURVEY.md §7.2 M6) —
  * every function is a pure Column composition so it stays inside
  * whole-stage codegen and scales linearly with no shuffle.
  */
object TextAnalysis {

  /** Occurrences of a literal substring, via length differencing —
    * avoids regex engines (dialect-portable and codegen'd). */
  def countOccurrences(text: Column, token: String): Column = {
    // the length-differencing formula divides by token.length — an
    // empty token would be a silent divide-by-zero (null under ANSI
    // off), not the "0 occurrences" a caller might expect
    require(token.nonEmpty, "countOccurrences: token must be non-empty")
    ((length(text) - length(replace(text, lit(token), lit("")))) / token.length).cast(LongType)
  }

  /** Whitespace token count: non-empty space-separated segments.
    * On a single-space-normalized corpus this is exactly spaces + 1
    * (the oracle-mirrored contract); leading/trailing/repeated spaces
    * are collapsed first so padded raw text cannot inflate the count
    * (" a b " is 2 tokens, "   " is 0 — each stray space used to add a
    * phantom token). */
  def tokenCount(text: Column): Column = {
    // fast path for the common clean row: the regex squeeze costs real
    // scan time (q66's gate + per-chunk counts regressed ~2x paying it
    // unconditionally), and on text with no leading/trailing/repeated
    // spaces both formulas agree exactly
    val dirty = text.startsWith(" ") || text.endsWith(" ") || text.contains("  ")
    val plain = when(length(text) === 0, lit(0L))
      .otherwise(countOccurrences(text, " ") + 1L)
    val squeezed = regexp_replace(trim(text), " +", " ")
    val squeezedCount = when(length(squeezed) === 0, lit(0L))
      .otherwise(countOccurrences(squeezed, " ") + 1L)
    when(!dirty, plain).otherwise(squeezedCount)
  }

  /** BPE-ish subword-boundary token count: runs of letters, runs of
    * digits, runs of other symbols (each optionally space-prefixed) —
    * the GPT-2 pre-tokenizer shape reduced to a dialect-portable
    * regex.  Counts merge units, not whitespace tokens. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), lit(0))).cast(LongType)

  /** Average token length in characters (empty text → 0, not an ANSI
    * divide-by-zero). */
  def avgTokenLength(text: Column): Column =
    (length(replace(text, lit(" "), lit(""))).cast(DoubleType) /
      greatest(tokenCount(text), lit(1L)).cast(DoubleType))

  /** Quality signals: length, token count, punctuation ratio,
    * stopword ratio, uppercase ratio.  Heuristics in the spirit of
    * C4/Gopher-style quality filters. */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast(LongType)
    val nTokens = tokenCount(text)
    val punct = Seq(".", ",", "!", "?", ";", ":").map(countOccurrences(text, _)).reduce(_ + _)
    // pad like langId: the space-delimited markers can't otherwise
    // match a stopword at the very start/end of the document, biasing
    // stop_ratio low on short texts
    val padded = concat(lit(" "), text, lit(" "))
    val stop = Seq(" the ", " and ", " of ", " to ", " a ").map(countOccurrences(padded, _)).reduce(_ + _)
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "punct_ratio" -> round(punct.cast(DoubleType) / greatest(nChars, lit(1L)).cast(DoubleType), 6),
      "stop_ratio" -> round(stop.cast(DoubleType) / greatest(nTokens, lit(1L)).cast(DoubleType), 6),
      "avg_token_len" -> round(avgTokenLength(text), 6))
  }

  /** Language-ID by stopword evidence: per-language marker-word counts,
    * argmax with a deterministic tie-break (language order).  An n-gram
    * heuristic, not a model — deterministic and SQL-expressible so the
    * correctness oracle can mirror it. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " los "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "))

  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> markers.map(countOccurrences(padded, _)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce(greatest(_, _))
    // first language reaching the max wins; all-zero → "und"
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Repetition signals (Gopher-style quality filters): per-document
    * duplicate-token ratio, duplicate-2-gram ratio, and top-token
    * frequency ratio — the filters that catch boilerplate and
    * degenerate repetition exact-dedup misses.
    *
    * Fused one-pass formulation: all four counters come from a single
    * codegen'd kernel over the split token array
    * ([[graft.functions.TokenStats]]) — ZERO shuffle; the whole query
    * is one scan-stage projection.  The r5 explode + two-level groupBy
    * ([[repetitionSignalsExploded]], kept as the spec twin) pushed one
    * row per (doc, token) through a hash aggregate just to count
    * multiplicities; at 100 TB that shuffle IS the filter's cost.
    * Output is bit-for-bit identical (spec-pinned) and mirrored 1:1 by
    * the same DuckDB unnest/group-by oracle.
    *
    * @return (doc_id, n_tokens, dup_token_ratio, dup_2gram_ratio,
    *         top_token_ratio) */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame, id: Column,
                        text: Column): org.apache.spark.sql.DataFrame =
    df.select(id.as("doc_id"),
        graft.functions.TokenStats.tokenStats(split(text, " ")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"),
        col("s.n_tokens").as("n_tokens"),
        round(lit(1.0) - col("s.n_distinct").cast(DoubleType) /
          col("s.n_tokens").cast(DoubleType), 6).as("dup_token_ratio"),
        round(col("s.d2raw"), 6).as("dup_2gram_ratio"),
        round(col("s.top_cnt").cast(DoubleType) /
          col("s.n_tokens").cast(DoubleType), 6).as("top_token_ratio"))

  /** Shannon token entropy per document — the complexity side of the
    * quality panel: boilerplate and degenerate repetition score LOW
    * (repetitionSignals catches the ratio view; entropy catches the
    * distribution view in one number).  Computed by the same fused
    * [[graft.functions.TokenStats]] kernel — scan-stage projection,
    * ZERO shuffle — in the algebraic form log2(n) − Σ c·log2(c) / n
    * that a SQL oracle mirrors term-for-term.
    *
    * @return (doc_id, n_tokens, token_entropy) */
  def tokenEntropy(df: org.apache.spark.sql.DataFrame, id: Column,
                   text: Column): org.apache.spark.sql.DataFrame =
    df.select(id.as("doc_id"),
        graft.functions.TokenStats.tokenStats(split(text, " ")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s.n_tokens").as("n_tokens"),
        round(col("s.entropy"), 6).as("token_entropy"))

  /** The r5 explode + two-level-groupBy formulation (one row per
    * (doc, token), multiplicity counts via hash aggregates).  Kept as
    * the independent reference implementation the fused kernel is
    * spec-verified against. */
  private[graft] def repetitionSignalsExploded(df: org.apache.spark.sql.DataFrame,
                                               id: Column,
                                               text: Column): org.apache.spark.sql.DataFrame = {
    val toks = df.select(id.as("doc_id"), split(text, " ").as("toks"))
    // sequence(0, -1) generates a DESCENDING [0, -1] — guard 1-token rows
    val bigrams = when(size(col("toks")) >= 2,
        transform(sequence(lit(0), size(col("toks")) - 2),
          i => concat(element_at(col("toks"), i + 1), lit(" "),
                      element_at(col("toks"), i + 2))))
      .otherwise(array().cast(ArrayType(StringType)))
    val perRow = toks.select(col("doc_id"), col("toks"),
      when(size(bigrams) > 0,
          lit(1.0) - size(array_distinct(bigrams)).cast(DoubleType) /
            size(bigrams).cast(DoubleType))
        .otherwise(lit(0.0)).as("d2raw"))
    perRow
      .select(col("doc_id"), col("d2raw"), explode(col("toks")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("cnt"), min(col("d2raw")).as("d2raw"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
           count(lit(1)).as("n_distinct"),
           max(col("cnt")).as("top_cnt"),
           min(col("d2raw")).as("d2raw"))
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 6).as("dup_token_ratio"),
        round(col("d2raw"), 6).as("dup_2gram_ratio"),
        round(col("top_cnt").cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 6).as("top_token_ratio"))
  }

  /** Corpus vocabulary: exact global top-k terms by frequency
    * (deterministic term-asc tiebreak) — the frequency pass behind
    * tokenizer-vocab extraction.  One explode into a partial+final
    * count aggregate; the bounded top-k compiles to
    * TakeOrderedAndProject (no global sort), so the only full shuffle
    * is the term count. */
  def topTerms(df: org.apache.spark.sql.DataFrame, text: Column,
               k: Int = 1000): org.apache.spark.sql.DataFrame =
    df.select(explode(split(text, " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)

  /** Unigram-LM quality scoring — the language-model perplexity filter
    * of the CCNet-style pretraining pipeline (Wenzek et al. 2020)
    * reduced to its order-0 core: train token frequencies over the
    * corpus in ONE aggregate, then score each document by the mean
    * log-probability of its tokens under that model.  Low scorers are
    * rare-token soup (boilerplate, codes, lorem); high scorers are
    * common-word prose — the same signal CCNet thresholds on.
    *
    * Scale shape: two scans of the source (tokenize twice rather than
    * persist an exploded token table that is ~10× the corpus), one
    * count aggregate to |vocab| rows, a hash join token→count (the
    * vocab side is the SMALL side at any corpus size — Spark/AQE
    * broadcast it when it fits), a broadcast 1-row total, and one
    * final per-doc aggregate.  No driver materialization anywhere.
    *
    * @return (doc_id, n_tokens, avg_logp) */
  def unigramLogLik(df: org.apache.spark.sql.DataFrame, id: Column,
                    text: Column): org.apache.spark.sql.DataFrame = {
    def toks = df.select(id.as("doc_id"), explode(split(normalize(text), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("tc"))
    val total = counts.agg(sum(col("tc")).as("ttot"))
    toks.join(counts, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("tc").cast(DoubleType) / col("ttot"))), 6).as("avg_logp"))
  }

  /** BPE merge training over the corpus — tokenizer induction's core
    * loop (Sennrich et al.): repeatedly merge the most frequent
    * adjacent symbol pair, weighted by word frequency.
    *
    * Scale shape (the standard trainer): the corpus is reduced ONCE to
    * a word-frequency vocabulary (one shuffle — the only corpus-scale
    * aggregation), and every merge round runs on the vocab alone:
    * adjacent-pair counts via one explode + sum aggregate over ≤|vocab|
    * rows, the argmax collected to the driver (bounded state, like the
    * kmeansFit centroids), and the merge applied with a left-to-right
    * non-overlapping lookaround replace (Java regex scans left to
    * right — exactly BPE's application order).  Words are
    * character-seeded from the NORMALIZED text ([a-z0-9] symbols, so
    * the space-separated symbol encoding is unambiguous); no
    * end-of-word marker (documented simplification — merges can span
    * to the word boundary).
    *
    * Deterministic throughout: ties break by (count desc, left asc,
    * right asc); stops early when no pair remains.
    *
    * After the initial reduction the vocab is DRIVER-SIZED by
    * construction (one short row per distinct normalized word), so the
    * merge loop itself runs on the driver when the vocab fits under
    * `driverVocabLimit` rows (probed with a limit+1 collect — one job,
    * bounded memory: 2^20 words × tens of chars ≈ low hundreds of MB
    * worst case).  The former all-Spark loop paid one full job per
    * merge round — 12 rounds ≈ 4.5 s of pure scheduling latency at
    * ANY data size, and rounds=4096 would be hours of overhead with
    * zero data cost.  The distributed loop remains as the fallback for
    * vocabularies over the bound (spec-pinned equal to the local one).
    *
    * @return (merge_rank starting at 1, left, right, pair_count) */
  def bpeTopMerges(df: org.apache.spark.sql.DataFrame, text: Column,
                   rounds: Int, driverVocabLimit: Int = 1 << 20): org.apache.spark.sql.DataFrame = {
    require(rounds >= 1 && rounds <= 4096, s"rounds in [1, 4096], got $rounds")
    require(driverVocabLimit >= 0, s"driverVocabLimit must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab0 = df.select(explode(split(normalize(text), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wcount"))
      .select(col("wcount"),
        concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" ")).as("syms"))
    val probe = vocab0.limit(driverVocabLimit + 1).collect()
    val merges =
      if (probe.length <= driverVocabLimit)
        bpeMergesLocal(probe.map(r => (r.getLong(0), r.getString(1).trim.split(" "))), rounds)
      else bpeMergesDistributed(vocab0, rounds)
    merges.toDF("merge_rank", "left", "right", "pair_count")
  }

  /** ENCODE with a trained merge table — the apply side of
    * [[bpeTopMerges]], closing the tokenizer train→apply loop: each
    * normalized word starts as character symbols and the merges apply
    * in rank order ([[graft.functions.BpeEncode]] kernel, scan-stage,
    * zero shuffle), so words seen in training segment exactly as their
    * final training-vocab form (spec-pinned).  `merges` is the
    * driver-bounded (merge_rank, left, right, …) frame the trainer
    * returned; `maxMerges` fails fast on an unbounded table rather
    * than building a giant literal plan.
    *
    * @return (doc_id, tokens array&lt;string&gt;, n_tokens) */
  def bpeEncode(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
                merges: org.apache.spark.sql.DataFrame,
                maxMerges: Int = 65536): org.apache.spark.sql.DataFrame = {
    val rows = merges.select(col("merge_rank"), col("left"), col("right"))
      .orderBy(col("merge_rank").asc).limit(maxMerges + 1).collect()
    require(rows.length <= maxMerges,
      s"bpeEncode: merge table exceeds $maxMerges rows — raise maxMerges deliberately")
    val table = rows.map(r => (r.getString(1), r.getString(2))).toSeq
    df.select(id.as("doc_id"),
        graft.functions.BpeEncode.encode(normalize(text), table).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast(org.apache.spark.sql.types.LongType))
  }

  /** Driver-side merge loop over the collected vocab — semantics
    * identical to [[bpeMergesDistributed]] (same pair counting over
    * adjacent symbols weighted by word count, same (count desc, left
    * asc, right asc) argmax, same left-to-right non-overlapping merge
    * application), at zero per-round scheduling cost. */
  private[graft] def bpeMergesLocal(vocab0: Array[(Long, Array[String])],
                                    rounds: Int): Seq[(Long, String, String, Long)] = {
    var vocab = vocab0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= rounds && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((wcount, toks) <- vocab; i <- 0 until toks.length - 1) {
        val key = (toks(i), toks(i + 1))
        counts(key) = counts.getOrElse(key, 0L) + wcount
      }
      if (counts.isEmpty) done = true
      else {
        // argmax by (count desc, left asc, right asc) — counts are
        // positive, so negation cannot overflow
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        merges += ((rank.toLong, l, r, n))
        vocab = vocab.map { case (wcount, toks) => (wcount, mergeTokens(toks, l, r)) }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Left-to-right non-overlapping application of one merge — exactly
    * the distributed path's lookaround regexp_replace scan order. */
  private def mergeTokens(toks: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) { out += (l + r); i += 2 }
      else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** The all-Spark merge loop — one job per round; the fallback when
    * the vocabulary exceeds the driver bound. */
  private[graft] def bpeMergesDistributed(vocab0: org.apache.spark.sql.DataFrame,
                                          rounds: Int): Seq[(Long, String, String, Long)] = {
    import org.apache.spark.storage.StorageLevel
    var vocab = vocab0.persist(StorageLevel.MEMORY_AND_DISK_SER)
    // previous round's cache is dropped only AFTER the current round's
    // pair aggregate has materialized the current one — the aggregate
    // scans every vocab partition, so no separate count() job is spent
    // on materialization
    var prevVocab: org.apache.spark.sql.DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    try {
      var rank = 1
      var done = false
      while (rank <= rounds && !done) {
        val toks = split(trim(col("syms")), " ")
        val pairs = when(size(toks) >= 2,
            transform(sequence(lit(0), size(toks) - 2),
              i => struct(element_at(toks, i + 1).as("l"),
                          element_at(toks, i + 2).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))
        val top = vocab
          .select(col("wcount"), explode(pairs).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("wcount")).as("n"))
          .orderBy(col("n").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (prevVocab != null) { prevVocab.unpersist(); prevVocab = null }
        if (top.isEmpty) done = true
        else {
          val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((rank.toLong, l, r, n))
          // left-to-right non-overlapping merge: lookarounds keep the
          // separating spaces so adjacent occurrences still match
          val pat = "(?<= )" + java.util.regex.Pattern.quote(l) + " " +
            java.util.regex.Pattern.quote(r) + "(?= )"
          val rep = java.util.regex.Matcher.quoteReplacement(l + r)
          prevVocab = vocab
          vocab = vocab
            .withColumn("syms", regexp_replace(col("syms"), pat, rep))
            .persist(StorageLevel.MEMORY_AND_DISK_SER)
          rank += 1
        }
      }
      merges.toSeq
    } finally {
      vocab.unpersist()
      if (prevVocab != null) prevVocab.unpersist()
      ()
    }
  }

  /** Sentence boundary — deliberately the lookaround-free regex subset
    * (RE2-safe) so a DuckDB oracle splits identically: one or more of
    * .!? followed by whitespace.  The terminal punctuation of a
    * mid-text sentence is consumed by the split; the last sentence
    * keeps its (both engines agree). */
  val sentenceBoundary = "[.!?]+\\s+"

  /** Exploded sentences, one row per (doc, sentence), empty segments
    * dropped — the unit for sentence-level dedup and repeated-
    * boilerplate analysis.  Pure explode in the scan stage. */
  def sentences(df: org.apache.spark.sql.DataFrame, id: Column,
                text: Column): org.apache.spark.sql.DataFrame =
    df.select(id.as("doc_id"), explode(split(text, sentenceBoundary)).as("sentence"))
      .withColumn("sentence", trim(col("sentence")))
      .filter(length(col("sentence")) > 0)

  /** Per-document sentence statistics (count, mean/max length) — the
    * sentence-shape quality signal (machine-generated boilerplate has
    * abnormal sentence-length distributions). */
  def sentenceStats(df: org.apache.spark.sql.DataFrame, id: Column,
                    text: Column): org.apache.spark.sql.DataFrame =
    sentences(df, id, text)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sentences"),
        round(avg(length(col("sentence"))), 6).as("avg_sentence_chars"),
        max(length(col("sentence"))).cast(LongType).as("max_sentence_chars"))

  /** Cross-document repeated sentences — boilerplate detection at
    * sentence granularity (nav text, disclaimers, license headers):
    * sentences whose normalized fingerprint appears in ≥ `minDocs`
    * distinct documents.  One explode into one hash aggregate on the
    * fingerprint; the sentence-level complement of
    * [[Dedup.repeatedSpans]]' fixed-width windows. */
  def repeatedSentences(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
                        minDocs: Int = 2): org.apache.spark.sql.DataFrame =
    sentences(df, id, text)
      // sentences that NORMALIZE to empty (punctuation/symbol-only —
      // "¡¡¡" vs "???") carry no content evidence, yet all share the
      // md5("") fingerprint and would be falsely merged into one
      // "boilerplate" row; drop them (the normalized text is computed
      // once and reused for the fingerprint)
      .select(col("doc_id"), normalize(col("sentence")).as("_norm"))
      .filter(length(col("_norm")) > 0)
      .groupBy(md5(col("_norm").cast(BinaryType)).as("sentence_fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)

  /** Normalize text for fingerprinting: lowercase, strip all but
    * [a-z0-9 ], squeeze repeated spaces, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Content fingerprint (md5 hex): the NORMALIZED text when
    * normalization leaves anything, otherwise the RAW text behind a
    * NUL-framed prefix (collision-proof against any normalized
    * string, which is [a-z0-9 ] only).  Without the fallback every
    * document outside [a-z0-9 ] — CJK, Cyrillic, emoji-only — would
    * fingerprint to md5("") and falsely compare/cluster as identical
    * content (exactNormalized would merge distinct non-Latin docs
    * into one "duplicate" group; corpusDiff would report a total
    * rewrite as 'unchanged').  Null text still fingerprints to null —
    * absence of evidence, the documented rule. */
  def fingerprint(text: Column): Column = {
    val norm = normalize(text)
    md5(when(length(norm) > 0, norm)
      .otherwise(concat(lit("\u0000raw\u0000"), text)).cast(BinaryType))
  }

  /** Character n-gram (shingle) set of the normalized text — feeds
    * MinHash / Jaccard dedup. */
  def shingles(text: Column, n: Int = 5): Column =
    array_distinct(shinglesRaw(text, n))

  /** Shingle list *with* duplicates — cheaper when the consumer is
    * dedup-insensitive (MinHash: duplicates cannot change a min).
    *
    * PERFORMANCE HAZARD: higher-order functions are interpreted, and a
    * lambda that captures a non-attribute subtree re-evaluates it per
    * element — O(len²) regex work when `text` is a raw column (the
    * `normalize` call gets inlined into the lambda).  For bulk
    * pipelines use [[shingleHashes]], which materializes the
    * normalized text once per row before exploding. */
  def shinglesRaw(text: Column, n: Int = 5): Column = {
    val norm = normalize(text)
    val cnt = length(norm) - lit(n - 1)
    // sequence(1, 0) would generate a *descending* [1, 0] — guard short texts
    when(cnt <= 0, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), cnt), i => norm.substr(i, lit(n))))
  }

  /** Exploded, hashed shingles: one row per (id, shingle-hash).  The
    * normalized text is computed ONCE per document (it crosses the
    * Generate boundary as data, not as an expression), and each
    * position pays only a substr + xxhash64.  This is the linear-time
    * primitive behind MinHash and Jaccard at scale. */
  def shingleHashes(df: org.apache.spark.sql.DataFrame, text: Column, id: Column,
                    n: Int = 5): org.apache.spark.sql.DataFrame = {
    val normed = df.select(id.as("doc_id"), normalize(text).as("norm"))
    val cnt = greatest(length(col("norm")) - lit(n - 1), lit(0))
    normed
      .select(col("doc_id"), col("norm"),
        explode(when(cnt >= 1, sequence(lit(1), cnt))
          .otherwise(array().cast(ArrayType(IntegerType)))).as("pos"))
      .select(col("doc_id"), xxhash64(col("norm").substr(col("pos"), lit(n))).as("h"))
  }

  /** PII patterns — the dialect-portable regex subset (no lookaround,
    * no shorthand classes) so the DuckDB/RE2 oracle matches Java
    * regex semantics exactly. */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phonePattern = "[0-9]{3}-[0-9]{4}"

  /** PII detection signals for pre-training scrubbing: match counts
    * per pattern + an any-hit flag.  Counting (not extracting) keeps
    * the output fixed-width; the redaction pass is [[scrubPii]]. */
  def piiSignals(text: Column): Seq[(String, Column)] = {
    val t = lower(text)
    val emails = regexp_count(t, lit(emailPattern)).cast(LongType)
    val phones = regexp_count(t, lit(phonePattern)).cast(LongType)
    Seq(
      "n_emails" -> emails,
      "n_phones" -> phones,
      "has_pii" -> (emails > 0 || phones > 0))
  }

  /** Redact PII in place (training-corpus scrub): emails and phone
    * numbers collapse to fixed placeholder tokens.  Case-insensitive —
    * detection lowercases before matching, so the scrub must catch
    * Mixed.Case@Mail.COM too (a case-sensitive scrub would flag PII in
    * [[piiSignals]] yet leak it through the cleaned text). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "(?i)" + emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")
}
