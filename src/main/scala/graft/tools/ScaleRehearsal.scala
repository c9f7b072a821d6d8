package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes the N× scale-rehearsal corpora for the dedup family
  * (BASELINE.md "sf-scale rehearsal"): N shifted copies of the sf0.1
  * documents table in one of two shapes —
  *
  *  - `rot` (default): each copy's letters are caesar-rotated by the
  *    copy index, so copies share NO shingles and the near-dup
  *    structure repeats per copy — "N× the clusters, same shape", the
  *    clean scaling measurement;
  *  - `tag`: each copy only appends a copy tag, so the 5 copies of a
  *    doc stay ~99% shingle-identical and every cluster grows 5× —
  *    the SKEW corpus that exposes the quadratic intra-bucket pair
  *    expansion of duplicate-heavy LSH buckets.
  *
  * Deterministic — no RNG, rerunnable to the same bytes.
  *
  * Usage: runMain graft.tools.ScaleRehearsal <srcSfDir> <outDir> <N> [rot|tag]
  * (writes <outDir>/documents.parquet; never touches the source). */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale5x"
    val n = if (args.length > 2) args(2).toInt else 5
    val mode = if (args.length > 3) args(3) else "rot"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$src/documents.parquet")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val copies = (0 until n).map { i =>
      val salted =
        if (i == 0) col("text")
        else if (mode == "tag") concat(col("text"), lit(s" copytag$i"))
        else { // rotate both cases by i: shingle sets become disjoint
          val rot = alpha.drop(i % 26) + alpha.take(i % 26)
          translate(col("text"), alpha + alpha.toUpperCase,
            rot + rot.toUpperCase)
        }
      d.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
        .withColumn("text", salted)
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    println(s"wrote ${n}x documents ($mode) to $out")
    spark.stop()
  }
}
