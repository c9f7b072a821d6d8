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
  *    expansion of duplicate-heavy LSH buckets;
  *  - `join` (round 13): the JOIN-family rehearsal — dims
  *    (region/nation/customer/supplier/part) copied verbatim, fact
  *    tables (orders/lineitem) replicated N× with shifted orderkeys,
  *    and — the skew probe — every non-first orders copy redirects the
  *    rows with `o_orderkey % 5 == 0` to ONE hot custkey, so ~16% of
  *    all orders land on a single customer.  q03/q55's
  *    orders⋈customer shuffle then has a hot key ~N·30k× the median —
  *    the 100×-scale failure mode AQE skew-join must absorb.
  *
  * Deterministic — no RNG, rerunnable to the same bytes.
  *
  * Usage: runMain graft.tools.ScaleRehearsal <srcSfDir> <outDir> <N> [rot|tag|join]
  * (writes the scaled tables under <outDir>; never touches the source). */
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
    if (mode == "join") { joinCorpus(spark, src, out, n); spark.stop(); return }
    if (mode == "ann") { annCorpus(spark, src, out, n); spark.stop(); return }
    val d = spark.read.parquet(s"$src/documents.parquet")
    // rot i ≡ 0 (mod 26) is the identity rotation — copies would share
    // ALL shingles, silently inverting the documented disjointness
    require(mode != "rot" || n <= 26,
      s"rot mode supports up to 26 disjoint copies (caesar rotations repeat mod 26), got $n")
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

  /** ANN-family rehearsal: N× embeddings where copy i's vectors are
    * cyclically coordinate-shifted by i — an orthogonal transform, so
    * every intra-copy cosine (and thus each copy's kNN structure) is
    * EXACTLY the original's, while cross-copy similarities decorrelate:
    * "N× the neighborhoods, same shape".  Then times
    * [[graft.operators.Similarity.knnGraph]] at 1× and N× (min-of-2,
    * fresh plan per run).  The scale mechanism under test is
    * plane auto-resolution: buckets grow with the corpus count, so
    * per-bucket occupancy — the quadratic term — stays constant and
    * the end-to-end cost scales ~linearly. */
  private def annCorpus(spark: SparkSession, src: String, out: String, n: Int): Unit = {
    val e = spark.read.parquet(s"$src/embeddings.parquet")
    // probe a NON-NULL row (same pitfall Similarity.probeDim documents:
    // an arbitrary null first vector would NPE the getInt)
    val dim = e.where(col("embedding").isNotNull)
      .selectExpr("size(embedding)").limit(1).collect().head.getInt(0)
    val copies = (0 until n).map { i =>
      val sh = i % dim
      val shifted =
        if (sh == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${sh + 1}, ${dim - sh}), slice(embedding, 1, $sh))")
      e.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
        .withColumn("embedding", shifted)
    }
    copies.reduce(_ unionByName _).repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    println(s"wrote ${n}x embeddings (cyclic-shift copies) to $out")
    def time(path: String): Double = {
      def once(): Double = {
        val c = spark.read.parquet(path)
        val t0 = System.nanoTime
        graft.operators.Similarity.knnGraph(c, "vec_id", "embedding", k = 5, tables = 2)
          .queryExecution.executedPlan.execute().count()
        (System.nanoTime - t0) / 1e9
      }
      math.min(once(), once())
    }
    val t1 = time(s"$src/embeddings.parquet")
    val tn = time(s"$out/embeddings.parquet")
    println(f"knnGraph k=5: 1x $t1%.2f s, ${n}x $tn%.2f s — ratio ${tn / t1}%.2f at ${n}x data")
  }

  /** Join-family rehearsal corpus: dims verbatim, facts N× with a hot
    * custkey — see the object doc.  Key shifts preserve the source
    * column dtypes so the scaled parquet schema is byte-identical. */
  private def joinCorpus(spark: SparkSession, src: String, out: String, n: Int): Unit = {
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$src/$dim.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$dim.parquet")
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val ckType = orders.schema("o_custkey").dataType
    def shifted(df: org.apache.spark.sql.DataFrame, key: String, i: Int) =
      df.withColumn(key, (col(key) + lit(i.toLong * 10000000L)).cast(df.schema(key).dataType))
    val oCopies = (0 until n).map { i =>
      val base = shifted(orders, "o_orderkey", i)
      if (i == 0) base
      else base.withColumn("o_custkey", // hot key: ~1/5 of each extra copy
        when(pmod(col("o_orderkey"), lit(5)) === 0, lit(1).cast(ckType))
          .otherwise(col("o_custkey").cast(ckType)))
    }
    val liCopies = (0 until n).map(i => shifted(lineitem, "l_orderkey", i))
    oCopies.reduce(_ unionByName _).repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")
    liCopies.reduce(_ unionByName _).repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")
    println(s"wrote ${n}x join corpus (hot custkey=1 on ${n - 1} copies) to $out")
  }
}
