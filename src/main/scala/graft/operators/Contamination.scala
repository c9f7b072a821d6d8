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
      .filter(col("n_overlap").cast(DoubleType) / size(col("bhs")).cast(DoubleType) >= threshold)
      .select(col("doc_id"), col("bench_id"), col("n_overlap"), col("containment"))
  }
}
