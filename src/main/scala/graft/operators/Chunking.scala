package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document chunking for training/RAG pipelines: slice each document
  * into fixed-width character windows with overlap (stride < width).
  *
  * Chunk i starts at `i * stride` (0-based); the last chunk is the
  * first one whose window reaches the end of the text, so every
  * character is covered and no degenerate tail chunk is emitted:
  * n_chunks = 1 + ceil(max(len - width, 0) / stride).
  *
  * Pure Column composition (sequence + explode + substr) — linear,
  * shuffle-free, stays in whole-stage codegen except the Generate.
  * Empty/null texts produce one empty chunk / no rows respectively
  * (null text yields a null sequence, which explode drops).
  */
object Chunking {

  def chunk(df: DataFrame, id: Column, text: Column,
            width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      s"need 1 <= stride <= width, got width=$width stride=$stride")
    val len = length(text).cast(LongType)
    val nChunks = lit(1L) +
      floor((greatest(len - width, lit(0L)) + lit(stride - 1L)) / lit(stride.toLong))
    df.select(id.as("doc_id"), text.as("_t"),
        // greatest() ignores nulls, so gate explicitly: null text -> no rows
        explode(when(text.isNotNull, sequence(lit(0L), nChunks - 1))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("chunk_start"),
        col("_t").substr((col("chunk_id") * stride + 1).cast(IntegerType), lit(width)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast(LongType))
  }

  /** Chunk fingerprint listing — the dedup-ready rendering (md5 per
    * chunk; chunk-level exact dedup joins on it). */
  def chunkFingerprints(df: DataFrame, id: Column, text: Column,
                        width: Int, stride: Int): DataFrame =
    chunk(df, id, text, width, stride)
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        col("chunk_len"), md5(col("chunk_text").cast(BinaryType)).as("fp"))
}
