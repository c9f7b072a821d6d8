package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, TextAnalysis}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("distributed sequential bins equal the global-window formulation") {
    // sparse, negative, shuffled keys across many partitions — bucket
    // math must not depend on physical layout or key density
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((0 until 3000).map(i => (i * 17L - 9000L, rnd.nextInt(400).toLong)))
    val df = spark.sparkContext.parallelize(rows, 16).toDF("k", "w")
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("bin_id")).toMap
    val dist = m(Packing.sequentialBins(df, col("k"), col("w"), budget = 1000L))
    val global = m(Packing.sequentialBinsGlobal(df, col("k"), col("w"), budget = 1000L))
    assert(dist.size == 3000 && dist == global)
    // bucket-count invariance: buckets only moves parallelism, never
    // values — the auto default (max(64, input partitions)) and two
    // explicit counts must all agree with the global definition
    assert(m(Packing.sequentialBins(df, col("k"), col("w"), 1000L, buckets = 7)) == global)
    assert(m(Packing.sequentialBins(df, col("k"), col("w"), 1000L, buckets = 500)) == global)
    // bins are contiguous, start at 0, and non-decreasing in key order
    val inOrder = dist.toSeq.sortBy(_._1).map(_._2)
    assert(inOrder.head == 0L)
    assert(inOrder.sliding(2).forall { case Seq(a, b) => b >= a && b - a >= 0 })
  }

  test("packing semantics: doc bin is where its first token lands") {
    // budget 10; weights 4,4,4 -> doc 3 starts at token 8 -> bin 0;
    // an oversized doc (25) starts in bin 1 and pushes the next to bin 3
    val df = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 25L), (5L, 2L))
      .toDF("k", "w")
    val bins = Packing.sequentialBins(df, col("k"), col("w"), budget = 10L)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("bin_id")).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 3L))
    // null weight counts 0; empty frame returns empty with the schema
    val withNull = Seq((1L, Some(4L)), (2L, None)).toDF("k", "w")
    val b2 = Packing.sequentialBins(withNull, col("k"), col("w"), budget = 10L)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("bin_id")).toMap
    assert(b2 == Map(1L -> 0L, 2L -> 0L))
    val empty = Packing.sequentialBins(Seq.empty[(Long, Long)].toDF("k", "w"),
      col("k"), col("w"), budget = 10L)
    assert(empty.columns.contains("bin_id") && empty.count() == 0)
  }

  test("packSummary folds docs and tokens per training sequence") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s = Packing.packSummary(docs, col("doc_id"),
      TextAnalysis.tokenCount(col("text")), budget = 512L)
    val rows = s.orderBy("bin_id").collect()
    assert(rows.nonEmpty)
    // every doc lands in exactly one bin; token totals conserve
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totalTokens = docs.select(sum(TextAnalysis.tokenCount(col("text"))))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum == totalTokens)
    // bins are the contiguous prefix 0..max
    assert(rows.map(_.getAs[Long]("bin_id")).toSeq ==
      (0L until rows.length.toLong))
  }

  test("no single-partition global window in the distributed plan") {
    val df = Seq((1L, 4L), (2L, 4L)).toDF("k", "w")
    val plan = Packing.sequentialBins(df, col("k"), col("w"), budget = 10L)
      .queryExecution.executedPlan.toString
    // every Window node must carry pack_bucket in its PARTITION spec
    // (the node prints as `Window [aggs], [partitionSpec], [orderSpec]`);
    // matching the whole plan string would pass on any join/project
    // that merely mentions the column
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, s"expected a bucket-partitioned window:\n$plan")
    windows.foreach { w =>
      assert("""Window \[[^\]]*\], \[pack_bucket#\d+""".r.findFirstIn(w).isDefined,
        s"window not partitioned by pack_bucket: $w")
    }
  }

  test("duplicate order keys fail loudly; full-range hashed keys pack exactly") {
    import graft.operators.Packing
    // tied keys share one RANGE-frame prefix — silent bin corruption
    // without the check (the null/fractional-key loudness convention)
    val dup = Seq((1L, 6L), (1L, 6L), (2L, 6L)).toDF("k", "w")
    val e = intercept[IllegalArgumentException](
      Packing.sequentialBins(dup, col("k"), col("w"), 10L).collect())
    assert(e.getMessage.contains("duplicate"))
    // keys spanning more than Long.MaxValue (the hash-the-key remedy
    // uses the full 2^64 range): long `hi - lo` wraps — the old double
    // path inverted bucket order and swapped the two rows' bins
    val wide = Seq((-(1L << 62), 6L), (1L << 62, 6L)).toDF("k", "w")
    val got = Packing.sequentialBins(wide, col("k"), col("w"), budget = 6L, buckets = 4)
      .select(col("k"), col("bin_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map((-(1L << 62)) -> 0L, (1L << 62) -> 1L),
      s"a span wider than Long.MaxValue must keep key order, got $got")
  }

  test("null order keys are rejected with a clear error") {
    val df = Seq((Some(1L), 4L), (None, 4L)).toDF("k", "w")
    val err = intercept[IllegalArgumentException](
      Packing.sequentialBins(df, col("k"), col("w"), budget = 10L))
    assert(err.getMessage.contains("order key contains nulls"))
  }
}

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "reach me at john.doe+spam@mail-host.org or 555-0123 anytime"),
    (2L, "two mails a@b.io c@d.co one phone 123-4567"),
    (3L, "clean document with no contact information at all"))
    .toDF("doc_id", "text")

  test("piiSignals counts emails and phones; has_pii flags any hit") {
    val sig = TextAnalysis.piiSignals(col("text"))
    val out = docs.select(col("doc_id") +: sig.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"), r.getAs[Boolean]("has_pii")))).toMap
    assert(out(1L) == ((1L, 1L, true)))
    assert(out(2L) == ((2L, 1L, true)))
    assert(out(3L) == ((0L, 0L, false)))
  }

  test("scrubPii redacts mixed-case PII that detection flagged") {
    val mixed = Seq((1L, "Reach John.Doe+x@Gmail.COM or JOHNdoe@Example.org now"))
      .toDF("doc_id", "text")
    val sig = TextAnalysis.piiSignals(col("text"))
    val flagged = mixed.select(sig.map { case (n, c) => c.as(n) }: _*).head()
    assert(flagged.getAs[Long]("n_emails") == 2L && flagged.getAs[Boolean]("has_pii"))
    val scrubbed = mixed.select(TextAnalysis.scrubPii(col("text")).as("t")).head().getString(0)
    assert(!scrubbed.contains("@"), s"leaked: $scrubbed")
    assert(scrubbed == "Reach <EMAIL> or <EMAIL> now", scrubbed)
  }

  test("scrubPii redacts in place") {
    val scrubbed = docs.select(TextAnalysis.scrubPii(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(scrubbed(0).contains("<EMAIL>") && scrubbed(0).contains("<PHONE>"))
    assert(!scrubbed(0).contains("@") && !scrubbed(1).contains("@"))
    assert(scrubbed(2) == "clean document with no contact information at all")
  }
}

class QuantilesSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Quantiles

  test("sort-based exact quantiles are bit-for-bit Spark's percentile aggregate") {
    val rnd = new scala.util.Random(3)
    // duplicates, negatives, NaN and null mixed in, many partitions
    val vals: Seq[java.lang.Double] = (0 until 5000).map {
      case i if i % 97 == 0 => null
      case i if i % 101 == 0 => java.lang.Double.valueOf(Double.NaN)
      case i if i % 5 == 0 => java.lang.Double.valueOf((i % 37).toDouble)
      case _ => java.lang.Double.valueOf(rnd.nextGaussian() * 100)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 13),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType, true))))
    val ps = Seq(0.0, 0.16, 0.5, 0.84, 0.99, 1.0)
    val mine = Quantiles.exact(df, col("v"), ps)
    val ref = df.where(!isnan(col("v")) || col("v").isNull)
      .agg(expr(s"percentile(v, array(${ps.mkString("D,")}D))")).head().getSeq[Double](0)
    assert(mine == ref.toList, s"\nmine $mine\nref  $ref")
    // lineitem real data
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val m2 = Quantiles.exact(li, col("l_extendedprice"), Seq(0.16, 0.5, 0.84))
    val r2 = li.agg(expr("percentile(l_extendedprice, array(0.16D,0.5D,0.84D))"))
      .head().getSeq[Double](0)
    assert(m2 == r2.toList)
    // empty input -> NaN per requested percentile
    val empty = Quantiles.exact(df.limit(0), col("v"), Seq(0.5))
    assert(empty.length == 1 && empty.head.isNaN)
  }

  test("integral value-histogram quantile path matches the percentile aggregate") {
    // the integral fast path (one groupBy(v).count, driver rank fold)
    // must reproduce Spark's percentile bit-for-bit, interpolation and
    // all — same bar as the sort path above
    val rnd = new scala.util.Random(11)
    val ints: Seq[java.lang.Long] = (0 until 4000).map {
      case i if i % 89 == 0 => null
      case i if i % 3 == 0 => java.lang.Long.valueOf((i % 23).toLong)
      case _ => java.lang.Long.valueOf(rnd.nextInt(500).toLong)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(ints.map(org.apache.spark.sql.Row(_)), 7),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType, true))))
    val ps = Seq(0.0, 0.1, 0.33, 0.5, 0.9, 1.0)
    val mine = Quantiles.exact(df, col("v"), ps)
    val ref = df.agg(expr(s"percentile(v, array(${ps.mkString("D,")}D))"))
      .head().getSeq[Double](0)
    assert(mine == ref.toList, s"\nmine $mine\nref  $ref")
    // real integral column: documents.n_chars (the q78 gate input)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m2 = Quantiles.exact(docs, col("n_chars"), Seq(0.1, 0.9))
    val r2 = docs.agg(expr("percentile(n_chars, array(0.1D,0.9D))"))
      .head().getSeq[Double](0)
    assert(m2 == r2.toList)
    // empty integral input -> NaN
    val empty = Quantiles.exact(df.limit(0), col("v"), Seq(0.5))
    assert(empty.length == 1 && empty.head.isNaN)
  }
}
