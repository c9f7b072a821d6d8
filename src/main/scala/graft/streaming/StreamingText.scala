package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Ingestion-time cleaning for a streaming documents source — the
  * Structured-Streaming composition of the batch text operators.
  * Because every quality / language / PII transform is a pure Column
  * composition, they run UNCHANGED on a stream (stateless, per-row,
  * codegen'd); the only stateful operator in the query is the
  * within-watermark exact dedup at the end.
  *
  * Pipeline: quality gates (token count, punctuation ratio) →
  * language filter → PII scrub → content-hash dedup within the
  * watermark.  This is the streaming twin of the batch sequence
  * q19 (quality) + q20 (langid) + q62 (PII) + q18 (exact dedup).
  *
  * Scale posture: dedup state is one row per distinct content hash
  * inside the watermark horizon, sharded by hash — bounded by the
  * horizon, uniformly distributed, no skew.  Everything upstream is
  * embarrassingly parallel.
  */
object StreamingText {

  /** @param docs streaming frame with `ts` (timestamp), `doc_id`,
    *             `text` columns
    * @return cleaned stream: doc_id, ts, text (scrubbed), n_tokens,
    *         punct_ratio, lang_pred, content_hash */
  def cleanIngest(docs: DataFrame, ts: String, watermark: String,
                  minTokens: Long = 5, maxPunctRatio: Double = 0.2,
                  langs: Seq[String] = Seq("en")): DataFrame = {
    val sig = TextAnalysis.qualitySignals(col("text")).toMap
    docs.withWatermark(ts, watermark)
      .withColumn("n_tokens", sig("n_tokens"))
      .withColumn("punct_ratio", sig("punct_ratio"))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio)
      .filter(col("lang_pred").isin(langs: _*))
      .withColumn("text", TextAnalysis.scrubPii(col("text")))
      .withColumn("content_hash", TextAnalysis.fingerprint(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")
  }
}
