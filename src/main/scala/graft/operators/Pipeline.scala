package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end pretraining-corpus preparation — the composition the
  * individual operators exist for, as one declarative plan:
  *
  *   quality gate → PII scrub → exact dedup → chunk → pack
  *
  * Every stage is a Column/operator composition, so Catalyst sees ONE
  * logical plan across the whole pipeline: the quality predicates and
  * the dedup semi-join prune before the chunk explode multiplies rows,
  * and the only shuffles are the dedup hash groupBy and the packing
  * bucket window.  The near-dup (MinHash-LSH) and contamination
  * stages are deliberately separate passes in practice — they are
  * candidate-generation + verification jobs of their own (see
  * [[Dedup.minhashLsh]], [[Contamination.containment]]); this
  * deterministic core is what a DuckDB oracle can verify end to end.
  *
  * Ordering contract for packing: chunks pack in (doc, chunk) order
  * via the synthetic key `doc_id · 2^20 + chunk_id` — exact as long as
  * chunk counts stay below 2^20 per document (a 500-wide/400-stride
  * chunker would need a ~420 M-char document to break that, beyond
  * any realistic web document and near Spark's 2 GB string ceiling)
  * AND doc ids stay in [0, 2^42): a 64-bit hash id would overflow the
  * multiply and can COLLIDE mod 2^44, silently violating packing's
  * unique-key contract — both bounds are asserted in the plan (rank or
  * zipWithIndex hash ids down first).
  */
object Pipeline {

  val ChunkKeyShift = 20

  /** doc_id bound for the synthetic pack key: doc_id · 2^20 + chunk_id
    * stays strictly inside a signed long for doc_id < 2^42. */
  val MaxDocId: Long = 1L << (62 - ChunkKeyShift)

  /** The synthetic (doc, chunk) pack key with its validity asserted
    * in-plan (the kmeansFit ragged-vector discipline: a dropped
    * standalone check column would be pruned and never evaluate). */
  private[graft] def packOrder: Column =
    when(assert_true(
        col("doc_id") >= 0 && col("doc_id") < MaxDocId &&
        col("chunk_id") >= 0 && col("chunk_id") < (1L << ChunkKeyShift),
        lit(s"pretrainCorpus: doc_id must be in [0, 2^${62 - ChunkKeyShift}) and " +
          s"chunk_id in [0, 2^$ChunkKeyShift) for the synthetic (doc, chunk) pack " +
          "key — 64-bit hash ids would overflow or collide, and an oversized " +
          "chunk_id would bleed into the doc bits; rank or zipWithIndex ids " +
          "down to a dense long first")).isNull,
      col("doc_id") * (1L << ChunkKeyShift) + col("chunk_id"))

  /** Per-packed-sequence summary of the cleaned, deduped, chunked,
    * packed corpus. */
  def pretrainCorpus(docs: DataFrame, id: Column, text: Column,
                     minTokens: Long = 50, maxPunctRatio: Double = 0.1,
                     width: Int = 500, stride: Int = 400,
                     budget: Long = 512): DataFrame =
    build(docs, id, text, minTokens, maxPunctRatio, width, stride, budget,
      observed = false)

  /** [[pretrainCorpus]] with OBSERVABILITY: the same single plan, with
    * `CollectMetrics` (df.observe) nodes riding the stage boundaries
    * so one execution reports how many documents survived the quality
    * gate and the dedup, and how many chunks/tokens were packed — at
    * 100 TB an extra count() per stage would re-run the whole
    * upstream plan; observed metrics are aggregated by the existing
    * tasks for free.
    *
    * Usage: run ONE action on the result, then read
    * `df.queryExecution.observedMetrics` — a Map of
    * "gate" → [n_gated], "dedup" → [n_deduped],
    * "chunks" → [n_chunks, n_tokens] Rows FROM THAT execution.
    * (Listener-style `Observation` objects are deliberately not used:
    * the packing stage bootstraps its bucket offsets with small
    * internal queries over the same plan, and a listener hands back
    * whichever execution finishes first — the per-execution
    * observedMetrics map is the authoritative read.) */
  def pretrainCorpusObserved(docs: DataFrame, id: Column, text: Column,
                             minTokens: Long = 50, maxPunctRatio: Double = 0.1,
                             width: Int = 500, stride: Int = 400,
                             budget: Long = 512): DataFrame =
    build(docs, id, text, minTokens, maxPunctRatio, width, stride, budget,
      observed = true)

  /** ONE plan definition for both public entry points — the observed
    * variant differs ONLY by the CollectMetrics nodes, and a hand-kept
    * twin body would let a stage-wiring fix (gate-before-scrub order,
    * the packOrder key, the final aggregate) silently land on one of
    * them. */
  private def build(docs: DataFrame, id: Column, text: Column,
                    minTokens: Long, maxPunctRatio: Double,
                    width: Int, stride: Int, budget: Long,
                    observed: Boolean): DataFrame = {
    val sig = TextAnalysis.qualitySignals(text).toMap
    // 1–2: quality gate, then scrub (scrub AFTER the gate: ratios are
    // judged on the original text, and <EMAIL> tokens must not skew them)
    val clean0 = docs
      .filter(sig("n_tokens") >= minTokens && sig("punct_ratio") <= maxPunctRatio)
      .select(id.as("doc_id"), TextAnalysis.scrubPii(text).as("text"))
    val clean = if (observed) clean0.observe("gate", count(lit(1)).as("n_gated")) else clean0
    // 3: exact dedup — keep the lowest doc id of each content group
    val deduped0 = Dedup.deduplicated(clean, col("text"), col("doc_id"))
    val deduped = if (observed) deduped0.observe("dedup", count(lit(1)).as("n_deduped"))
                  else deduped0
    // 4: overlapping chunks with whitespace token counts
    val chunks0 = Chunking.chunk(deduped, col("doc_id"), col("text"), width, stride)
      .withColumn("chunk_tokens", TextAnalysis.tokenCount(col("chunk_text")))
    val chunks = if (observed) chunks0.observe("chunks", count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).as("n_tokens"))
      else chunks0
    // 5: pack chunks into fixed token budgets, in (doc, chunk) order
    val keyed = chunks.withColumn("pack_order", packOrder)
    val binned = Packing.sequentialBins(
      keyed, col("pack_order"), col("chunk_tokens"), budget)
    binned.groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_chunks"),
           count_distinct(col("doc_id")).as("n_docs"),
           sum(col("chunk_tokens")).as("sum_tokens"),
           min(col("doc_id")).as("first_doc"))
  }
}
