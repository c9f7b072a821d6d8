package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import graft.operators.{Binned, Dedup, Similarity, TextAnalysis}
import graft.functions.Astro

class BinnedSpec extends SparkSpec {

  test("review fixes: FP bucket boundary clamps, NaN/inf never poison axes or categories") {
    import graft.operators.Binned
    import spark.implicits._
    // 0.9999999999999999 used to floor to bucket 3 of [0, 3) and be
    // silently dropped by the dense-grid join
    val ax = Binned.Axis("x", col("x"), 0.0, 1.0, 3)
    val b = Seq(0.9999999999999999, 1.0, 0.0, 0.5).toDF("x")
      .select(ax.bucket.as("b")).collect().map(_.getLong(0))
    assert(b.toSeq == Seq(2L, 2L, 0L, 1L), s"buckets: ${b.toSeq}")
    // NaN/inf must not become the axis extent
    val vals = Seq(1.0, 2.0, 3.0, Double.NaN, Double.PositiveInfinity).toDF("v")
    val axis = Binned.guessBins(vals, col("v"))
    assert(axis.hi < 5.0 && axis.n < 100, s"axis poisoned: lo=${axis.lo} hi=${axis.hi} n=${axis.n}")
    // null categories are excluded from the pivot rather than crashing it
    val cat = Seq((0.1, 0.1, "a"), (0.2, 0.2, null.asInstanceOf[String]), (0.3, 0.3, "b"))
      .toDF("x", "y", "c")
    val r = Binned.rasterCat(cat, col("x"), col("y"),
      0.0, 1.0, 0.0, 1.0, widthPx = 2, heightPx = 2, cat = col("c"))
    assert(r.columns.toSet.intersect(Set("a", "b")) == Set("a", "b") && !r.columns.contains(null))
  }
  import spark.implicits._

  test("1-D dense histogram keeps empty bins (xarray reindex semantics)") {
    val df = Seq(0.5, 1.5, 1.6, 3.5, 4.0).toDF("x") // bins [0,1)[1,2)[2,3)[3,4]
    val h = Binned.histogram(df, col("x"), 0.0, 4.0, 4)
      .orderBy("x_bin").collect()
    assert(h.map(_.getAs[Long]("value")).toSeq == Seq(1L, 2L, 0L, 2L)) // 4.0 on upper edge -> last bin
    assert(h.map(_.getAs[Double]("x_center")).toSeq == Seq(0.5, 1.5, 2.5, 3.5))
  }

  test("2-D binned mean cube with empty cell null") {
    val df = Seq((0.5, 0.5, 10.0), (0.5, 0.6, 20.0), (1.5, 1.5, 30.0)).toDF("x", "y", "w")
    val cube = Binned.denseCube(df,
      Seq(Binned.Axis("x", col("x"), 0.0, 2.0, 2), Binned.Axis("y", col("y"), 0.0, 2.0, 2)),
      Seq(avg(col("w")).as("mean_w")))
    val m = cube.collect().map(r => (r.getAs[Long]("x_bin"), r.getAs[Long]("y_bin")) -> Option(r.getAs[Any]("mean_w"))).toMap
    assert(m((0L, 0L)).contains(15.0))
    assert(m((1L, 1L)).contains(30.0))
    assert(m((0L, 1L)).isEmpty && m((1L, 0L)).isEmpty)
    assert(cube.count() == 4)
  }

  test("guessBins: smallest gap drives the grid, across partition boundaries") {
    // reference formula (xarray.py guess_bins): dx = min consecutive
    // gap; edges min-0.5dx .. max+0.6dx
    val ax = Binned.guessBins(Seq(1.0, 2.0, 4.0, 7.0).toDF("x"), col("x"))
    assert(ax.lo == 0.5 && ax.n == 8 && math.abs(ax.width - 1.0) < 1e-12)
    // the min gap must be found even when its two values land in
    // DIFFERENT range partitions: 2000 values spaced 1.0 apart, one
    // extra value 0.25 beyond a grid point
    val vals = (0 until 2000).map(_.toDouble) :+ 1000.25
    val ax2 = Binned.guessBins(spark.sparkContext.parallelize(vals, 16).toDF("x"), col("x"))
    assert(math.abs(ax2.width - 0.25) < 1e-12, s"width ${ax2.width}")
    assert(ax2.lo == -0.125)
    // single distinct value: dx falls back to max(span, 1)
    val ax3 = Binned.guessBins(Seq(5.0, 5.0).toDF("x"), col("x"))
    assert(ax3.lo == 4.5 && ax3.n == 2)
    // all-null raises the documented error
    val err = intercept[IllegalArgumentException](
      Binned.guessBins(Seq.empty[Double].toDF("x"), col("x")))
    assert(err.getMessage.contains("explicit Axis"))
  }

  test("axis edges: negative ranges, single bin, out-of-range drop") {
    val df = Seq(-5.0, -2.5, 0.0, 7.0).toDF("x")
    // negative-lo axis: [-5, 0] in 2 bins; 7.0 is out of range and dropped
    val h = Binned.histogram(df, col("x"), -5.0, 0.0, 2)
      .orderBy("x_bin").collect()
    assert(h.map(_.getAs[Long]("value")).toSeq == Seq(1L, 2L)) // {-5}; {-2.5 inner edge, 0.0 upper edge}
    assert(h.map(_.getAs[Double]("x_center")).toSeq == Seq(-3.75, -1.25))
    // single-bin axis swallows everything in range
    val one = Binned.histogram(df, col("x"), -10.0, 10.0, 1).collect()
    assert(one.length == 1 && one.head.getAs[Long]("value") == 4L)
  }

  test("rasterCat pivots per-pixel category counts (count_cat)") {
    val df = Seq((0.1, 0.1, "a"), (0.2, 0.2, "a"), (0.3, 0.3, "b"), (0.9, 0.9, "b"))
      .toDF("x", "y", "c")
    val r = Binned.rasterCat(df, col("x"), col("y"), 0.0, 1.0, 0.0, 1.0, 2, 2, col("c"))
    val m = r.collect().map(row =>
      (row.getAs[Long]("px_bin"), row.getAs[Long]("py_bin")) -> (row.getAs[Long]("a"), row.getAs[Long]("b"))).toMap
    assert(m((0L, 0L)) == (2L, 1L))
    assert(m((1L, 1L)) == (0L, 1L))
  }

  test("histogramLike reuses a stored axis spec") {
    val axis = Binned.Axis("x", col("x"), 0.0, 4.0, 4)
    val a = Binned.histogramLike(Seq(0.5, 1.5).toDF("x"), Seq(axis), Seq(count(lit(1)).as("n")), Map("n" -> 0L))
    val b = Binned.histogramLike(Seq(3.5).toDF("x"), Seq(axis), Seq(count(lit(1)).as("n")), Map("n" -> 0L))
    assert(a.count() == 4 && b.count() == 4) // same dense grid shape
  }

  test("raster aggregation parses agg strings through Spark SQL") {
    val df = Seq((0.1, 0.1, 5.0), (0.9, 0.9, 7.0), (0.95, 0.95, 9.0)).toDF("x", "y", "z")
    val r = Binned.raster(df, col("x"), col("y"), 0.0, 1.0, 0.0, 1.0, 2, 2, "avg(z)")
    val m = r.collect().map(row => (row.getAs[Long]("px_bin"), row.getAs[Long]("py_bin")) -> row.getAs[Double]("value")).toMap
    assert(m((0L, 0L)) == 5.0 && m((1L, 1L)) == 8.0)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again today"), // near dup of 1
    (4L, "completely different content about spark query engines and shuffles"),
    (5L, "totally unrelated words concerning gardens flowers bees and honey"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical content") {
    val d = Dedup.exact(docs, col("text"), col("doc_id"))
    val dup = d.filter(col("n_copies") > 1).collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("keep_id") == 1L)
    assert(d.count() == 4)
    val kept = Dedup.deduplicated(docs, col("text"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L)) // doc 2 (copy of 1) dropped
  }

  test("minhash LSH surfaces exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, col("text"), col("doc_id"), shingleSize = 4, bands = 8, rowsPerBand = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("est_jaccard")))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)))
    assert(keys.contains((1L, 3L)) || keys.contains((2L, 3L)))
    assert(!keys.exists(p => p._2 == 5L || p._1 == 5L))
    val exact = pairs.find(p => (p._1, p._2) == (1L, 2L)).get
    assert(exact._3 == 1.0) // identical docs agree on every minhash
  }

  test("verifiedPairs equals minhashLsh |> est-filter |> ngramJaccard exactly") {
    // the fused one-scan formulation must reproduce the composed
    // operators value-for-value, in both hash families and with and
    // without the estimate prune
    for (portable <- Seq(false, true); minEst <- Seq(0.0, 0.5)) {
      val composed = Dedup.ngramJaccard(
        Dedup.minhashLsh(docs, col("text"), col("doc_id"),
            shingleSize = 4, bands = 8, rowsPerBand = 2, portableHash = portable)
          .filter(col("est_jaccard") >= minEst)
          .select("id_a", "id_b"),
        docs, col("doc_id"), col("text"), n = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val fused = Dedup.verifiedPairs(docs, col("text"), col("doc_id"),
          shingleSize = 4, bands = 8, rowsPerBand = 2, minEst = minEst,
          portableHash = portable)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fused == composed,
        s"portable=$portable minEst=$minEst: fused $fused vs composed $composed")
      assert(fused.nonEmpty, "fixture should yield at least the exact-dup pair")
    }
  }

  test("fused minhash signatures are bit-for-bit the explode/groupBy formulation") {
    // edge cases on top of the plain fixture: text exactly at/below the
    // shingle width (no signature), punctuation-only (normalizes to
    // empty), multi-byte text (non-ASCII kernel path), null text
    val tricky = Seq(
      (10L, "abcd"),                         // 4 norm chars < n=5 -> dropped
      (11L, "abcde"),                        // exactly one shingle
      (12L, "!!! ???"),                      // normalizes to empty -> dropped
      (13L, "café au lait café au lait"), // multi-byte before normalize
      (14L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val corpus = docs.unionByName(tricky)
    val fused = Dedup.minhashSignatures(corpus, col("text"), col("doc_id"), 5, 16)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toList).toMap
    val exploded = Dedup.minhashSignaturesExploded(corpus, col("text"), col("doc_id"), 5, 16)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toList).toMap
    assert(fused.keySet == exploded.keySet)
    assert(fused.keySet == Set(1L, 2L, 3L, 4L, 5L, 11L, 13L))
    fused.keys.foreach(k => assert(fused(k) == exploded(k), s"doc $k"))
    // and on real testdata documents
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val f2 = Dedup.minhashSignatures(real, col("text"), col("doc_id"), 5, 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toList).toMap
    val e2 = Dedup.minhashSignaturesExploded(real, col("text"), col("doc_id"), 5, 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toList).toMap
    assert(f2 == e2 && f2.nonEmpty)
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    val fp = Dedup.simhash(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fp(1L) == fp(2L))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(5L)))
  }

  test("fused simhash is bit-for-bit the explode/groupBy formulation") {
    // edge cases beyond the plain fixture: punctuation-only (normalizes
    // to empty -> dropped like the exploded no-rows case), single
    // token, repeated token (votes accumulate per occurrence), multi-
    // byte text (normalizer strips it, but the raw input exercises the
    // full path), null text
    val tricky = Seq(
      (10L, "!!! ???"),
      (11L, "solo"),
      (12L, "word word word other"),
      (13L, "café au lait café au lait"),
      (14L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val corpus = docs.unionByName(tricky)
    val fused = Dedup.simhash(corpus, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exploded = Dedup.simhashExploded(corpus, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.keySet == exploded.keySet)
    assert(!fused.keySet.contains(10L) && !fused.keySet.contains(14L))
    fused.keys.foreach(k => assert(fused(k) == exploded(k), s"doc $k"))
    // and on real testdata documents
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val f2 = Dedup.simhash(real, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e2 = Dedup.simhashExploded(real, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f2 == e2 && f2.nonEmpty)
  }

  test("simhash bit-band near-dup equals brute-force hamming for d <= bands-1") {
    // real corpus: brute-force all-pairs hamming over the fingerprints
    // is the ground truth; with maxHamming = bands - 1 the pigeonhole
    // guarantee makes band recall EXACT, so the sets must be equal
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fp = Dedup.simhash(real, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    def brute(maxHam: Int): Set[(Long, Long, Int)] = (for {
      (ia, ha) <- fp; (ib, hb) <- fp if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxHam
    } yield (ia, ib, d)).toSet
    def banded(bands: Int, maxHam: Int): Set[(Long, Long, Int)] =
      Dedup.simhashNearDup(real, col("text"), col("doc_id"), bands, maxHam)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b4 = banded(4, 3)
    assert(b4 == brute(3), "bands=4 maxHamming=3 must have exact recall")
    assert(b4.nonEmpty, "fixture corpus should contain near-dup pairs")
    // beyond the guarantee the banded set can only under-report
    assert(banded(4, 6).subsetOf(brute(6)))
    // other band widths keep the guarantee too
    assert(banded(8, 7) == brute(7))
  }

  test("ngram jaccard verifies candidate pairs") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(pairs, docs, col("doc_id"), col("text"), n = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 4L)) < 0.2)
  }

  test("fused ngram jaccard matches the exploded formulation, incl empty-side pairs") {
    val tricky = Seq(
      (10L, "abc"),                 // shorter than n=4 -> no shingles
      (11L, "zzz qqq www abcd"))
      .toDF("doc_id", "text")
    val corpus = docs.unionByName(tricky)
    // (1,2) identical; (1,4) unrelated; (1,10) one side empty;
    // (10,10) both sides empty -> dropped; (1,99) right id absent;
    // (98,99) both absent -> dropped; (1,2) duplicated -> collapsed
    val pairs = Seq((1L, 2L), (1L, 4L), (1L, 10L), (10L, 10L),
      (1L, 99L), (98L, 99L), (1L, 2L), (3L, 11L)).toDF("id_a", "id_b")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                org.apache.spark.sql.Column, org.apache.spark.sql.Column, Int) =>
                org.apache.spark.sql.DataFrame) =
      f(pairs, corpus, col("doc_id"), col("text"), 4)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
        .sortBy(_._1).toList
    val fused = run(Dedup.ngramJaccard)
    val exploded = run(Dedup.ngramJaccardExploded)
    assert(fused == exploded)
    assert(fused.map(_._1).toSet ==
      Set((1L, 2L), (1L, 4L), (1L, 10L), (1L, 99L), (3L, 11L)))
    assert(fused.toMap.apply((1L, 10L)) == 0.0 && fused.toMap.apply((1L, 99L)) == 0.0)
    // and on real testdata: verify the q40 candidate pipeline end to end
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cands = Dedup.minhashLsh(real, col("text"), col("doc_id"))
      .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
    val f2 = Dedup.ngramJaccard(cands, real, col("doc_id"), col("text"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    val e2 = Dedup.ngramJaccardExploded(cands, real, col("doc_id"), col("text"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(f2 == e2 && f2.nonEmpty)
  }

  test("embedding near-dup reports every pair of a large duplicate cluster (no k cap)") {
    // 25 identical vectors + 5 unrelated: all C(25,2) = 300 pairs must
    // surface (the r2 lshTopK(k=20) formulation silently capped this)
    val rnd = new scala.util.Random(7)
    val cluster = (0L until 25L).map(i => (i, Array(1.0f, 0.5f, -0.25f, 0.125f)))
    val others = (100L until 105L).map(i =>
      (i, Array.fill(4)(rnd.nextGaussian().toFloat)))
    val df = (cluster ++ others).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(df, "vec_id", "embedding",
        threshold = 0.999, planes = 4, tables = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val inCluster = pairs.filter { case (a, b) => a < 25L && b < 25L }
    assert(inCluster.length == 300, s"expected all 300 cluster pairs, got ${inCluster.length}")
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("repeatedSpans finds exactly the shared windows") {
    // docs 1 and 2 share a 30-char run ("the common shared span here x2"
    // normalized); doc 3 is disjoint
    val shared = "the common shared span here xyz"
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"other beginning $shared different tail"),
      (3L, "completely unrelated text with nothing repeated at all here")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, col("text"), col("doc_id"),
        width = 20, minDocs = 2, portableHash = true)
      .collect()
    assert(spans.nonEmpty, "shared windows must be reported")
    // every reported span is in both docs 1 and 2 -> first_doc = 1
    assert(spans.forall(r => r.getLong(1) == 2L && r.getLong(3) == 1L))
    // exactly the sliding windows inside the shared run appear in both;
    // the run is bounded by identical spaces on each side, so the
    // effective common run is 1 + 31 + 1 = 33 chars -> 14 windows
    assert(spans.length == 14, s"expected 14 shared windows, got ${spans.length}")
    // a doc repeating a span internally does NOT cross the minDocs bar
    val selfRep = Seq((9L, ("zz " * 30) + "unique")).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(selfRep, col("text"), col("doc_id"),
      width = 10, minDocs = 2).count() == 0L)
    // fast xxhash64 path groups identically to the portable md5 path
    val fast = Dedup.repeatedSpans(docs, col("text"), col("doc_id"), 20, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val portable = spans.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(fast == portable)
  }

  test("repeatedSpans/spanEvidenceBatch exclude null ids; two-level == countDistinct (r22)") {
    // r21 verdict "what's wrong" #4: with a null doc_id admitted, the
    // portable arm's level-2 count(1) counted a null-doc group that
    // countDistinct ignores.  The contract is now: a null id carries
    // no document identity — such rows are excluded from evidence
    // ENTIRELY, in both arms, so the two-level rewrite is
    // unconditionally equal to countDistinct over what remains.
    val shared = "the common shared span here xyz"
    val rows = Seq(
      (java.lang.Long.valueOf(1L), s"prefix one $shared suffix alpha"),
      (java.lang.Long.valueOf(2L), s"other beginning $shared different tail"),
      (null.asInstanceOf[java.lang.Long], s"a nulldoc copy $shared of the span"))
    val withNull = rows.toDF("doc_id", "text")
    val noNull = rows.filter(_._1 != null).toDF("doc_id", "text")
    // span_hash is a long in the fast arm, an md5 hex string in the
    // portable arm — canonicalize via toString for both
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (String.valueOf(r.get(0)), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    for (portable <- Seq(false, true)) {
      val a = canon(Dedup.repeatedSpans(withNull, col("text"), col("doc_id"),
        width = 20, minDocs = 2, portableHash = portable))
      val b = canon(Dedup.repeatedSpans(noNull, col("text"), col("doc_id"),
        width = 20, minDocs = 2, portableHash = portable))
      assert(a == b, s"portable=$portable: null-id doc leaked into span evidence")
      assert(a.nonEmpty)
    }
    val ev = Dedup.spanEvidenceBatch(withNull, col("text"), col("doc_id"), width = 20)
    val evRef = Dedup.spanEvidenceBatch(noNull, col("text"), col("doc_id"), width = 20)
    assert(ev.collect().toSet == evRef.collect().toSet)
    // and a corpus of ONLY null ids produces no evidence at all
    val allNull = Seq((null.asInstanceOf[java.lang.Long], shared + " " + shared))
      .toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(allNull, col("text"), col("doc_id"),
      width = 20, minDocs = 1, portableHash = true).count() == 0L)
  }

  test("span evidence: doc-disjoint batches merge to the whole-corpus report") {
    // the incremental span family's core claim: evidence computed per
    // batch and merged from the stored frames alone equals the global
    // repeatedSpans report — INCLUDING the cross-batch case, a span
    // unique inside every single batch (invisible to any per-batch
    // minDocs filter) that only the merge can see
    val shared = "the common shared span here xyz"
    val batchA = Seq((1L, s"prefix one $shared suffix alpha")).toDF("doc_id", "text")
    val batchB = Seq((2L, s"other beginning $shared different tail")).toDF("doc_id", "text")
    val batchC = Seq((3L, "completely unrelated text with nothing repeated at all here"))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val whole = canon(Dedup.repeatedSpans(batchA.union(batchB).union(batchC),
      col("text"), col("doc_id"), width = 20, minDocs = 2, portableHash = true))
    val evidence = Dedup.spanEvidenceBatch(batchA, col("text"), col("doc_id"), width = 20)
      .union(Dedup.spanEvidenceBatch(batchB, col("text"), col("doc_id"), width = 20))
      .union(Dedup.spanEvidenceBatch(batchC, col("text"), col("doc_id"), width = 20))
    val merged = canon(Dedup.mergeSpanEvidence(evidence, minDocs = 2))
    assert(merged == whole,
      s"stored-evidence merge diverged: missing=${whole -- merged} extra=${merged -- whole}")
    assert(merged.nonEmpty, "the cross-batch shared span must be discovered at the merge")
    // per-batch evidence alone never crosses minDocs (each batch holds
    // one doc) — the repeated verdict exists ONLY after merging
    assert(Dedup.mergeSpanEvidence(
      Dedup.spanEvidenceBatch(batchA, col("text"), col("doc_id"), width = 20),
      minDocs = 2).count() == 0L)
    // the algebra is associative: compact batches A+B into a stored
    // GENERATION (full evidence schema, no minDocs cut — a span that
    // only crosses the threshold in a later generation survives),
    // then merge the generation with batch C's fresh evidence
    val gen1 = Dedup.compactSpanEvidence(
      evidence.filter(col("first_doc") < 3L)) // batches A+B stored together
    val viaGenerations = canon(Dedup.mergeSpanEvidence(
      gen1.unionByName(
        Dedup.spanEvidenceBatch(batchC, col("text"), col("doc_id"), width = 20)),
      minDocs = 2))
    assert(viaGenerations == whole, "generation-wise merge must equal the one-shot merge")
    // the terminal REPORT is not re-mergeable — refuse loudly
    intercept[IllegalArgumentException](
      Dedup.mergeSpanEvidence(Dedup.mergeSpanEvidence(evidence, 2), 2))
  }

  test("removeRepeatedSpans cuts repeats from non-first docs; Scala reference") {
    // width 10 over normalized text; "common run here" repeated across
    // docs 1/2/3 — doc 1 (first) keeps its copy, 2 and 3 lose theirs
    // (its overlapping windows merge into ONE cut range per doc);
    // doc 4 is untouched; docs 5/6 share a LONG run whose many
    // overlapping repeated windows exercise the interval merge deeper
    val texts = Seq(
      1L -> "AAAA common run here tail one",
      2L -> "BBBB common run here tail two",
      3L -> "common run here CCCC",
      4L -> "nothing shared at all here",
      5L -> "prefix five shared overlapping boilerplate run block end five",
      6L -> "prefix six shared overlapping boilerplate run block end six")
    val docs = texts.toDF("doc_id", "text")
    val got = Dedup.removeRepeatedSpans(docs, col("text"), col("doc_id"), width = 10)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // Scala reference over the same normalized corpus
    def norm(s: String) = s.toLowerCase.replaceAll("[^a-z0-9 ]", "")
      .replaceAll(" +", " ").trim
    val corpus = texts.map { case (id, t) => id -> norm(t) }.toMap
    val w = 10
    val occ = corpus.toSeq.flatMap { case (id, t) =>
      (0 to t.length - w).map(p => (t.substring(p, p + w), id, p)) }
    val repeated = occ.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
      .map { case (s, os) => s -> os.map(_._2).min }
    val expected = corpus.map { case (id, t) =>
      val cuts = (0 to t.length - w)
        .filter(p => repeated.get(t.substring(p, p + w)).exists(_ != id))
      val keep = new StringBuilder
      var cutEnd = -1
      for (i <- 0 until t.length) {
        cuts.filter(_ <= i).foreach(p => cutEnd = math.max(cutEnd, p + w))
        if (i >= cutEnd) keep += t(i)
      }
      id -> ((keep.toString, cuts.size.toLong))
    }
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got(1L)._1 == norm(corpus(1L)) && got(1L)._2 == 0L,
      "first doc keeps its copy")
    assert(got(4L)._2 == 0L && got(4L)._1 == corpus(4L))
    assert(got(2L)._2 > 0 && got(2L)._1.length < corpus(2L).length)
    // overlap merging: doc 6 (non-first of the 5/6 pair) has MANY
    // overlapping repeated windows whose union collapses to one long
    // cut; doc 5 (first) keeps the shared run intact
    assert(got(6L)._2 >= 10, s"expected many overlapping windows cut: ${got(6L)}")
    assert(got(6L)._1.length <= corpus(6L).length - 20, s"merged cut too small: ${got(6L)}")
    assert(got(5L)._2 == 0L && got(5L)._1 == corpus(5L))
    // plan gate: span evidence is a two-level distinct aggregate the
    // window stream joins against — NO window-function pass (the old
    // shape sorted every (h, doc, positions) row corpus-wide by span
    // hash), no Expand (single distinct column plans two-level), and
    // the small evidence side broadcasts so the corpus window stream
    // never shuffles on the span hash
    val exec = Dedup.removeRepeatedSpans(docs, col("text"), col("doc_id"), width = 10)
      .queryExecution.executedPlan
    val plan = exec.toString
    assert(!plan.contains("Window"), s"no window-function pass expected:\n$plan")
    assert(!plan.contains("Expand"), s"single distinct column should plan two-level:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"span evidence should broadcast into the window stream:\n$plan")
  }

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val oldGen = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "gamma text"))
      .toDF("doc_id", "text")
    val newGen = Seq((1L, "alpha text"), (2L, "beta REVISED"), (4L, "delta text"))
      .toDF("doc_id", "text")
    val got = Dedup.corpusDiff(oldGen, newGen, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    // fingerprint semantics: punctuation/case-only edits are unchanged
    val fuzz = Dedup.corpusDiff(oldGen,
        Seq((1L, "ALPHA, text!")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fuzz(1L) == "unchanged")
  }

  test("corpusDiff: NULL text is a present row, not an absent one") {
    // doc 1: NULL text both sides -> unchanged (null-safe fp compare);
    // doc 2: null -> non-null edit -> changed (NOT 'added' — the row
    // was present in the old generation); doc 3: non-null -> null ->
    // changed (NOT 'removed')
    val oldGen = Seq((1L, null), (2L, null), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newGen = Seq((1L, null), (2L, "beta now real"), (3L, null))
      .toDF("doc_id", "text")
    val got = Dedup.corpusDiff(oldGen, newGen, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"))
  }

  test("non-Latin text never false-clusters: fingerprint falls back to raw text") {
    // every char outside [a-z0-9 ] normalizes away, so without the raw
    // fallback these all fingerprint to md5("") — two UNRELATED CJK
    // docs would group as "duplicates" and a full CJK rewrite would
    // diff as 'unchanged'
    val docs = Seq((1L, "你好世界"), (2L, "совершенно другой"), (3L, "你好世界"),
      (4L, "!!!"), (5L, "hello world")).toDF("doc_id", "text")
    val groups = Dedup.exactNormalized(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap // keep_id -> n_copies
    assert(groups == Map(1L -> 2L, 2L -> 1L, 4L -> 1L, 5L -> 1L),
      s"only the identical CJK pair may cluster, got $groups")
    val st = Dedup.corpusDiff(
        Seq((1L, "你好世界"), (2L, "!!!")).toDF("doc_id", "text"),
        Seq((1L, "完全不同的内容"), (2L, "!!!")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("connectedComponents: chain, clique, singleton, pair-only node") {
    // chain 1-2-3 (transitive: 1~3 never a pair), clique 10-11-12,
    // singleton 20, and node 30 appearing ONLY in pairs (not in nodes)
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L, 31L).toDF("nid")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
      (30L, 31L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "nid", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("connectedComponents: reliable-checkpoint path matches local, writes checkpoints") {
    // the fault-tolerant variant a real-cluster run would use: rounds
    // checkpoint to a DFS dir (here a tmp dir) instead of executor-
    // local blocks; the labeling must be identical and checkpoint
    // files must actually land under the dir
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toFile
    try {
      val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L, 31L).toDF("nid")
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
        (30L, 31L)).toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(nodes, "nid", pairs,
          reliableDir = Some(dir.getAbsolutePath), driverPairLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 30L -> 30L, 31L -> 30L))
      def countFiles(f: java.io.File): Int =
        if (f.isFile) 1 else Option(f.listFiles).map(_.map(countFiles).sum).getOrElse(0)
      assert(countFiles(dir) > 0, "reliable path must write checkpoint files")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("connectedComponents: long path needs diameter rounds, matches union-find") {
    // a 40-node path is the adversarial diameter case for label
    // propagation; plus seeded random edges, verified against an
    // in-test union-find ground truth
    val rnd = new scala.util.Random(7)
    val n = 120
    val path = (0 until 39).map(i => (i.toLong, (i + 1).toLong))
    val random = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val edges = path ++ random
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map { i =>
      // min id of i's component
      val root = find(i)
      i.toLong -> (0 until n).filter(find(_) == root).min.toLong
    }.toMap
    val got = Dedup.connectedComponents(
        (0 until n).map(_.toLong).toDF("nid"), "nid", edges.toDF("id_a", "id_b"),
        driverPairLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // the driver union-find tier must compute the identical labeling
    val gotDriver = Dedup.connectedComponents(
        (0 until n).map(_.toLong).toDF("nid"), "nid", edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDriver == expected)
  }

  test("connectedComponents: superseded round blocks are freed eagerly") {
    // a multi-round run must not leave one persisted RDD per round in
    // the block manager (the round-6 bench inflation mechanism): after
    // the result materializes, only the FINAL round's checkpoint (plus
    // whatever the suite's other tests hold) may remain
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val n = 64
    val path = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    val comps = Dedup.connectedComponents(
      (0 until n).map(_.toLong).toDF("nid"), "nid", path.toDF("id_a", "id_b"),
      driverPairLimit = 0)
    assert(comps.collect().forall(_.getLong(1) == 0L))
    val live = spark.sparkContext.getPersistentRDDs.size
    assert(live <= 1, s"expected at most the final round's checkpoint to stay " +
      s"persisted, found $live persistent RDDs")
  }

  test("incremental index dedup: batch-vs-index equals the self-join LSH") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // a corpus queried against its own index must reproduce minhashLsh
    // exactly (modulo self-matches and pair orientation)
    val index = Dedup.minhashBandIndex(docs, col("text"), col("doc_id"))
    val inc = Dedup.minhashLshAgainstIndex(docs, col("text"), col("doc_id"), index)
      .filter(col("batch_id") =!= col("index_id"))
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
                 math.max(r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    val self = Dedup.minhashLsh(docs, col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == self, "index path must agree with the self-join path")
    assert(self.nonEmpty)
    // a genuinely new near-dup batch doc hits its index original
    val batch = docs.filter(col("doc_id") === 7)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val hits = Dedup.minhashLshAgainstIndex(batch, col("text"), col("doc_id"), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.exists { case (b, i, j) => b == 100007L && i == 7L && j == 1.0 },
      s"batch copy of doc 7 must match its original, got ${hits.toSeq}")
  }

  test("minhashLshAgainstIndex fails fast when index signature length mismatches") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // real band keys, truncated signatures: the join matches but the
    // geometry differs — exactly the silent-wrong-results case the
    // guard must turn into a loud error
    val badIndex = Dedup.minhashBandIndex(docs, col("text"), col("doc_id"))
      .withColumn("index_sig", slice(col("index_sig"), 1, 16))
    val ex = intercept[Exception] {
      Dedup.minhashLshAgainstIndex(docs, col("text"), col("doc_id"), badIndex).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("geometry mismatch")),
      s"expected the geometry guard, got: $ex")
  }

  test("keepComponentWinnersBy keeps the longest doc per cluster") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b c d e"), (3L, "a b c"), // one cluster, 2 is longest
      (9L, "zz")).toDF("doc_id", "text")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L)).toDF("node", "component")
    val kept = Dedup.keepComponentWinnersBy(docs, col("doc_id"), comps,
        Seq(length(col("text")).desc))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 9L))
    // schema untouched apart from the dedup
    val cols = Dedup.keepComponentWinnersBy(docs, col("doc_id"), comps,
      Seq(length(col("text")).desc)).columns.toSeq
    assert(cols == Seq("doc_id", "text"))
  }

  test("keepComponentWinners / nearDedupCorpus collapse transitive duplicate chains") {
    // a~b and b~c are near-dups (one-token edits) but a~c may be a
    // weaker pair: the component must still collapse all three
    // zz-prefixed edit tokens are substrings of nothing else in base
    val base = (0 until 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      1L -> base,
      2L -> base.replace("tok29", "zzaa"),
      3L -> base.replace("tok29", "zzaa").replace("tok28", "zzbb"),
      9L -> (100 until 130).map(i => s"w$i").mkString(" ")
    ).toDF("doc_id", "text")
    val kept = Dedup.nearDedupCorpus(docs, col("text"), col("doc_id"), minJaccard = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L), s"expected min-id winner per cluster, got $kept")
    // policy winner: doc 3 has the most distinct content of its cluster
    // under a custom ordering (here: highest id as a stand-in policy)
    val keptBy = Dedup.nearDedupCorpus(docs, col("text"), col("doc_id"),
        minJaccard = 0.5, keepBy = Seq(col("doc_id").desc))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptBy == Set(3L, 9L), s"expected max-id winner per cluster, got $keptBy")
    // the driver-tier loser anti join (default) keeps exactly the rows
    // of the distributed CC + winner semi-join composition — on real
    // corpus data, not just the toy chain
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = Dedup.nearDedupCorpus(real, col("text"), col("doc_id"), minJaccard = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dist = Dedup.nearDedupCorpus(real, col("text"), col("doc_id"), minJaccard = 0.5,
        driverPairLimit = 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fast == dist && fast.nonEmpty,
      s"driver-tier anti join must equal the distributed composition " +
        s"(fast ${fast.size} vs dist ${dist.size})")
  }

  test("DSIR scores favor target-like docs; Scala-reference parity; deterministic resample") {
    // target domain: cooking text; background noise: legal text.
    // corpus has 3 cooking docs, 3 legal docs, one empty doc
    val cook = Seq("simmer the onion stock slowly", "slice onion into the stock",
      "stock simmer slice season taste")
    val legal = Seq("the party of the first part", "liability clause herein agreed",
      "indemnify the aforementioned party")
    val corpus = (cook ++ legal).zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (99L, "")
    val corpusDf = corpus.toDF("doc_id", "text")
    val targetDf = cook.zipWithIndex.map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val got = graft.operators.Dsir.scores(corpusDf, col("doc_id"), col("text"),
        targetDf, col("text"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(99L) == 0.0, "token-less doc carries no evidence")
    val cookAvg = (0 to 2).map(i => got(i.toLong)).sum / 3
    val legalAvg = (3 to 5).map(i => got(i.toLong)).sum / 3
    assert(cookAvg > legalAvg + 1.0,
      s"target-like docs must score higher: cook $cookAvg vs legal $legalAvg")
    // Scala reference of the whole scoring pipeline (same md5 bucket,
    // same smoothing, same fold at 6 decimals)
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
    def grams(t: String): Seq[String] = {
      val ts = toks(t); ts ++ ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 64
    }
    def dist(texts: Seq[String]): Map[Long, Double] = {
      val cnt = texts.flatMap(grams).groupBy(bucket).view.mapValues(_.size.toDouble).toMap
      val total = cnt.values.sum
      (0L until 64L).map(b => b -> math.log((cnt.getOrElse(b, 0.0) + 1.0) / (total + 64.0))).toMap
    }
    val p = dist(cook); val q = dist(corpus.map(_._2).filter(_.nonEmpty))
    corpus.filter(_._2.nonEmpty).foreach { case (id, t) =>
      val want = grams(t).groupBy(bucket).map { case (b, gs) => gs.size * (p(b) - q(b)) }.sum
      assert(math.abs(got(id) - want) < 1e-5, s"doc $id: got ${got(id)} want $want")
    }
    // resample: deterministic, exact size, repeatable
    val r1 = graft.operators.Dsir.resample(corpusDf, col("doc_id"), col("text"),
        targetDf, col("text"), keep = 3, buckets = 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = graft.operators.Dsir.resample(corpusDf, col("doc_id"), col("text"),
        targetDf, col("text"), keep = 3, buckets = 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2 && r1.size == 3, s"resample must be deterministic: $r1 vs $r2")
    assert(r1.count(_ < 3L) >= 2, s"importance must favor target-like docs: $r1")
  }

  test("Dsir.scoresForSlice: one-pass fused variant matches scores() exactly") {
    // same domains as the scores test, but the target is a SLICE of the
    // corpus (kind='cook') — the fused path must reproduce the generic
    // two-frame path double-for-double (identical smoothing arithmetic)
    val rows = Seq(
      (0L, "simmer the onion stock slowly", "cook"),
      (1L, "slice onion into the stock", "cook"),
      (2L, "stock simmer slice season taste", "cook"),
      (3L, "the party of the first part", "legal"),
      (4L, "liability clause herein agreed", "legal"),
      (5L, "indemnify the aforementioned party", "legal"),
      (99L, "", "legal"))
    val df = rows.toDF("doc_id", "text", "kind")
    val generic = graft.operators.Dsir.scores(df, col("doc_id"), col("text"),
        df.filter(col("kind") === "cook"), col("text"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fused = graft.operators.Dsir.scoresForSlice(df, col("doc_id"), col("text"),
        col("kind") === "cook", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused == generic, s"fused $fused vs generic $generic")
    assert(fused(99L) == 0.0)
  }

  test("semanticDedup keeps one representative per embedding cluster; null vectors survive") {
    // 3 tight semantic clusters of 4 members (per-member jitter small
    // enough that intra-cluster cosine stays >= 0.999 along the jitter
    // chain, inter-cluster far below) + 2 far-apart singletons + a
    // null-vector row.  k = 1 makes the decision semantics exact (one
    // cell scores all pairs); the cell-BOUNDING path is gated by the
    // q96 oracle, which mirrors whatever the cells decide.
    def vec(base: Array[Double], eps: Double): Seq[Double] =
      base.zipWithIndex.map { case (v, i) => v + eps * (i % 3) }.toSeq
    val b1 = Array(10.0, 0.0, 0.0, 1.0); val b2 = Array(0.0, 10.0, 0.0, 1.0)
    val b3 = Array(0.0, 0.0, 10.0, 1.0)
    val rows: Seq[(Long, Seq[Double])] =
      (0 until 4).map(i => (i.toLong, vec(b1, i * 0.1))) ++
      (0 until 4).map(i => (10L + i, vec(b2, i * 0.1))) ++
      (0 until 4).map(i => (20L + i, vec(b3, i * 0.1))) ++
      Seq((30L, Seq(5.0, -5.0, 5.0, -5.0)), (31L, Seq(-5.0, 5.0, -5.0, 5.0)))
    val df = rows.toDF("vec_id", "embedding")
      .unionByName(Seq((40L, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "embedding"))
    val kept = Dedup.semanticDedup(df, "vec_id", "embedding", k = 1, threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // min id per cluster survives (the jitter chain connects each
    // cluster transitively even where its extremes fall under the
    // threshold); singletons and the null row survive
    assert(kept == Set(0L, 10L, 20L, 30L, 31L, 40L), s"got $kept")
    // threshold gates the decision: jittered members round below 1.0,
    // so a 1.0 threshold pairs nothing and everything survives
    val all = Dedup.semanticDedup(df, "vec_id", "embedding", k = 1, threshold = 1.0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(all == rows.map(_._1).toSet + 40L)
    // cells bound the search without changing tight-cluster decisions
    // here: with k = 4 each tight cluster still collapses to one rep
    val k4 = Dedup.semanticDedup(df, "vec_id", "embedding", k = 4, threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(k4.intersect(Set(0L, 1L, 2L, 3L)).nonEmpty &&
      k4.size >= 6 && k4.size <= rows.size + 1, s"k=4 kept $k4")
    // k = 0 auto-resolves the population discipline (k ≈ n/targetCell,
    // floored at 8): with 15 rows and targetCell=1 → kEff = 15, and the
    // result must equal the SAME explicit k — the auto path is pure
    // parameter derivation, never a semantics change
    val auto = Dedup.semanticDedup(df, "vec_id", "embedding", k = 0,
        threshold = 0.999, targetCell = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val explicit = Dedup.semanticDedup(df, "vec_id", "embedding", k = 15,
        threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(auto == explicit, s"auto $auto vs explicit $explicit")
    // tiny corpora floor at k = 8 (n/targetCell below the floor)
    val floored = Dedup.semanticDedup(df, "vec_id", "embedding", k = 0,
        threshold = 0.999, targetCell = 1000)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val explicit8 = Dedup.semanticDedup(df, "vec_id", "embedding", k = 8,
        threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(floored == explicit8, s"floored $floored vs explicit8 $explicit8")
    assertThrows[IllegalArgumentException](
      Dedup.semanticDedup(df, "vec_id", "embedding", k = -1, threshold = 0.5))
  }

  test("semanticDedupIncremental: store contaminates, min batch id wins, nulls survive, divergence pinned") {
    // one centroid = one cell: decision semantics exact (every pair
    // scored); the cell-BOUNDING path is q127's oracle territory
    val cents = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val t9 = 0.9
    def deg(d: Double) = math.toRadians(d)
    def v(angle: Double) = Seq(math.cos(deg(angle)), math.sin(deg(angle)), 0.0, 0.0)
    // store: R at 0°, S far away on another axis pair
    val store = Seq((0L, v(0)), (2L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    // batch: 1 ≈ R (dies: component contains store); 3 ≈ 5 mutually
    // but far from store (3 = min batch id survives, 5 dies); 7 is a
    // singleton (survives); 9 carries no vector (kept); 11 chains to
    // the store THROUGH batch row 1 (1 at 20°, 11 at 40°: cos(1,11) =
    // cos20° ≈ .94 ≥ 0.9 and cos(R,1) = cos20° ≥ 0.9, while
    // cos(R,11) = cos40° ≈ .77 < 0.9 — transitive contamination must
    // still kill 11)
    val batch = Seq(
        (1L, v(20)), (11L, v(40)),
        (3L, Seq(0.0, 0.0, 0.0, 1.0)), (5L, Seq(0.0, 0.0, 0.1, 0.995)),
        (7L, Seq(0.0, -1.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
      .unionByName(Seq((9L, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "embedding"))
    val kept = Dedup.semanticDedupIncremental(store, batch, cents,
        "vec_id", "embedding", threshold = t9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 7L, 9L), s"got $kept")
    // the divergence contract, both directions: N (at 50°) is similar
    // to the REMOVED doc A (at 25°) but not to the surviving rep R
    // (at 0°).  Incremental (A absent from the store) KEEPS N; the
    // full batch run over {R, A, N} links R–A–N transitively and
    // keeps only R.
    val n = Seq((31L, v(50))).toDF("vec_id", "embedding")
    val keptIncr = Dedup.semanticDedupIncremental(
        Seq((0L, v(0))).toDF("vec_id", "embedding"), n, cents,
        "vec_id", "embedding", threshold = t9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIncr == Set(31L))
    val full = Dedup.semanticDedup(
        Seq((0L, v(0)), (21L, v(25)), (31L, v(50))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1, threshold = t9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full == Set(0L))
    // the persisted-cell seam (storeCellCol): a store carrying its own
    // cell assignments must decide EXACTLY like the recomputed path —
    // the seam is an assignment-cost optimization, never a semantics
    // change (with one centroid every true cell is 0)
    val storeWithCells = store.withColumn("cell", lit(0L))
    val keptSeam = Dedup.semanticDedupIncremental(storeWithCells, batch, cents,
        "vec_id", "embedding", threshold = t9, storeCellCol = Some("cell"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptSeam == kept, s"seam $keptSeam vs recomputed $kept")
    // ...and the stored column is genuinely HONORED: exiling store row
    // 0 (the rep R) to a bogus cell removes its pairs, so the {1, 11}
    // chain becomes a batch-only component — min id 1 now survives
    val storeExiled = store.withColumn("cell",
      when(col("vec_id") === 0L, lit(99L)).otherwise(lit(0L)))
    val keptExiled = Dedup.semanticDedupIncremental(storeExiled, batch, cents,
        "vec_id", "embedding", threshold = t9, storeCellCol = Some("cell"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptExiled == Set(1L, 3L, 7L, 9L), s"got $keptExiled")
  }

  test("maxBucket caps band buckets before the self-join squares them") {
    // a boilerplate cluster of 30 near-identical docs (one token
    // differs) floods its band buckets; two small genuine near-dup
    // pairs sit in small buckets.  maxBucket below 30 must drop the
    // flood's candidates while keeping the small-bucket pairs intact.
    val boiler = (0 until 30).map(i =>
      (i.toLong, s"the same boilerplate legal disclaimer text repeated verbatim tok$i"))
    val pair = Seq(
      (100L, "a unique document about owls and their nesting habits here"),
      (101L, "a unique document about owls and their nesting patterns here"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val uncapped = Dedup.minhashLsh(docs, col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashLsh(docs, col("text"), col("doc_id"), maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)) && capped.contains((100L, 101L)),
      "small-bucket pairs must survive the cap")
    val boilerPairs = (p: Set[(Long, Long)]) => p.count { case (a, b) => a < 30 && b < 30 }
    assert(boilerPairs(uncapped) > 100, s"uncapped flood expected: ${boilerPairs(uncapped)}")
    assert(boilerPairs(capped) < boilerPairs(uncapped) / 2,
      s"cap must shed the flooded buckets: ${boilerPairs(capped)} vs ${boilerPairs(uncapped)}")
    // maxBucket = 0 is the default unbounded behavior
    val default = Dedup.minhashLsh(docs, col("text"), col("doc_id"), maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(default == uncapped)
    // the population filter must not introduce a new exchange shape:
    // count and self-join group on the same band key
    val plan = Dedup.minhashLsh(docs, col("text"), col("doc_id"), maxBucket = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"cap should be a semi join on band_key:\n$plan")
  }

  test("filterByQuantile keeps the exact p-band (fencepost check)") {
    val df = spark.range(0, 101).toDF("v") // 0..100: p10=10.0, p90=90.0
    val kept = graft.operators.Quantiles.filterByQuantile(df, col("v"), 0.1, 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == (10L to 90L).toSet)
    // degenerate band keeps only the median
    val med = graft.operators.Quantiles.filterByQuantile(df, col("v"), 0.5, 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(med == Set(50L))
  }

  test("filterByQuantilePerGroup trims each group's own tails") {
    val df = ((0 until 100).map(i => ("a", i)) ++ (0 until 10).map(i => ("b", i * 1000)))
      .toDF("grp", "v")
    val kept = graft.operators.Quantiles.filterByQuantilePerGroup(
        df, col("grp"), col("v"), 0.1, 0.9)
      .collect().map(r => r.getString(0) -> r.getInt(1))
    val a = kept.filter(_._1 == "a").map(_._2).sorted
    val b = kept.filter(_._1 == "b").map(_._2).sorted
    // group a: percent_rank = i/99 -> keep ceil(9.9)=10 .. floor(89.1)=89
    assert(a.toSeq == (10 to 89).map(identity), s"got ${a.toSeq}")
    // group b: rank i/9 -> keep i in 1..8 (0.111.. to 0.888..)
    assert(b.toSeq == (1 to 8).map(_ * 1000), s"got ${b.toSeq}")
    // a single-row group has percent_rank 0: kept only when pLo == 0
    val single = Seq(("s", 7)).toDF("grp", "v")
    assert(graft.operators.Quantiles.filterByQuantilePerGroup(
      single, col("grp"), col("v"), 0.0, 0.9).count() == 1L)
    assert(graft.operators.Quantiles.filterByQuantilePerGroup(
      single, col("grp"), col("v"), 0.1, 0.9).count() == 0L)
    // null/NaN values are dropped and do NOT occupy the band's edges,
    // matching the global filterByQuantile (unfiltered, nulls sat at
    // percent_rank 0 — kept at pLo=0 — and pushed real ranks upward)
    val withJunk = (Seq.fill(5)(("j", null.asInstanceOf[java.lang.Double])) ++
      Seq(("j", java.lang.Double.valueOf(Double.NaN))) ++
      (1 to 5).map(i => ("j", java.lang.Double.valueOf(i.toDouble))))
      .toDF("grp", "v")
    val cleaned = graft.operators.Quantiles.filterByQuantilePerGroup(
        withJunk, col("grp"), col("v"), 0.0, 0.5)
      .collect().map(_.getDouble(1)).sorted.toSeq
    assert(cleaned == Seq(1.0, 2.0, 3.0), s"null/NaN leaked into the band: $cleaned")
  }

  test("ntileBuckets: deterministic equal-population deciles per group") {
    val df = ((0 until 100).map(i => ("a", i)) ++ (0 until 7).map(i => ("b", 5)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "v")
    val got = graft.operators.Quantiles.ntileBuckets(
        df, col("grp"), col("v"), col("id"), n = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    val a = got.filter(_._2 == "a")
    // 100 rows into 4 buckets: 25 each, ordered by v
    assert(a.groupBy(_._4).view.mapValues(_.size).toMap ==
      Map(1 -> 25, 2 -> 25, 3 -> 25, 4 -> 25))
    assert(a.filter(_._4 == 1).map(_._3).max < a.filter(_._4 == 2).map(_._3).min)
    // all-tied group: the id tiebreak makes the assignment deterministic
    val b = got.filter(_._2 == "b").sortBy(_._1).map(_._4).toSeq
    assert(b == Seq(1, 1, 2, 2, 3, 3, 4), s"got $b")
    // a pre-existing `bucket` column must refuse, not be silently
    // overwritten
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Quantiles.ntileBuckets(
        df.withColumnRenamed("v", "bucket"), col("grp"), col("bucket"), col("id"), n = 4)
    }
    assert(ex.getMessage.contains("bucket"))
  }

  test("kmeansFit/pq refuse non-integral ids and ragged vectors loudly") {
    // a string id would cast to null and die in an obscure NPE at the
    // seed collect; the guard names the fix (hash to a long first)
    val strIds = Seq(("doc-1", Seq(1.0, 2.0)), ("doc-2", Seq(2.0, 1.0)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](
      Similarity.kmeansFit(strIds, "vec_id", "embedding", k = 1))
    assert(e1.getMessage.contains("integral id"), e1.getMessage)
    intercept[IllegalArgumentException](
      Similarity.pqEncode(strIds, "vec_id", "embedding", m = 2, k = 1))
    // ragged vector lengths would corrupt centroids silently (tail
    // dims averaged over fewer members) — the folded assert fires
    val ragged = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      Similarity.kmeansFit(ragged, "vec_id", "embedding", k = 1).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("ragged"), s"${e2.getMessage}")
  }

  test("minhashSignature: empty shingle array yields a NULL signature, not k nulls") {
    // [null x k] passes isNotNull filters and — since xxhash64 skips
    // null inputs — shares identical band keys in every band, forming
    // one quadratic all-short-docs bucket
    val df = Seq((1L, Seq("abcde", "bcdef")), (2L, Seq.empty[String]))
      .toDF("doc_id", "shingles")
      .select(col("doc_id"), Dedup.minhashSignature(col("shingles"), k = 4).as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isDefined, "real shingles must produce a signature")
    assert(rows(2L).isEmpty, "empty shingle array must produce a NULL signature")
  }

  test("kmeansFit refuses an empty / all-null-vector corpus loudly") {
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]),
      (2L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.kmeansFit(allNull, "vec_id", "embedding", k = 2)
    }
    assert(ex.getMessage.contains("no non-null vectors"))
  }

  test("kmeansFit edge cases: k exceeding corpus, single iteration") {
    val df = Seq((1L, Array(1.0f, 0f)), (2L, Array(0f, 1.0f))).toDF("vec_id", "embedding")
    val fit = Similarity.kmeansFit(df, "vec_id", "embedding", k = 5, iters = 1)
      .collect()
    assert(fit.length == 2, "k clamps to the corpus size")
    assert(fit.map(_.getLong(2)).sum == 2L)
  }

  test("kmeansFit empty cell keeps its previous centroid with n_members 0") {
    // three identical vectors, k=2: ties break to the lowest centroid
    // id, so the other seed's cell empties in round 1 and must survive
    // at its initial position with zero members (the contract the q72
    // oracle's UNION ALL fallback mirrors)
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f)),
      (3L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val fit = Similarity.kmeansFit(df, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Double](1), r.getLong(2)))).toMap
    assert(fit.size == 2)
    val (winner, loser) = (fit.minBy(_._1), fit.maxBy(_._1))
    assert(winner._2._2 == 3L, s"lowest cid takes all on ties: $fit")
    assert(loser._2._2 == 0L, s"empty cell must report 0 members: $fit")
    assert(loser._2._1 == Seq(1.0, 2.0), "empty cell keeps its seed position")
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("brute-force cosine top-k is exact") {
    val probes = vecs.filter(col("vec_id") === 0L)
    val top = Similarity.bruteForceTopK(vecs, probes, "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("corpus_id")).toSeq == Seq(1L, 2L))
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 0.993884) < 1e-6)
  }

  test("LSH top-k finds the strong neighbor (same bucket) and never a negated vector") {
    val res = Similarity.lshTopK(vecs, "vec_id", "embedding", 2, planes = 4)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id")))
    // 0 and 1 are nearly parallel -> same signature cell with overwhelming probability
    assert(res.contains((0L, 1L)) || res.contains((1L, 0L)))
    assert(!res.contains((0L, 4L)))
  }

  test("IVF assignment picks the nearest centroid") {
    val cents = vecs.filter(col("vec_id").isin(0L, 2L))
    val assign = Similarity.ivfAssign(vecs, cents, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vid") -> r.getAs[Long]("centroid_id")).toMap
    assert(assign(1L) == 0L)
    assert(assign(2L) == 2L)
  }

  test("ivfTopK recall vs brute force, and nprobe lifts it") {
    // clustered corpus: 8 well-separated centers, 25 members each;
    // centroids = the centers themselves
    val rnd = new scala.util.Random(7)
    val centers = (0 until 8).map { c =>
      val u = Array.fill(16)(rnd.nextGaussian().toFloat * 4f)
      (c.toLong * 1000, u)
    }
    val members = centers.flatMap { case (cid, u) =>
      (1 to 25).map(m => (cid + m, u.map(x => x + 0.3f * rnd.nextGaussian().toFloat)))
    }
    val corpus = members.toDF("vec_id", "embedding")
    val cents = centers.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 1000 === 1) // one probe per cluster
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id"))).toSet
    val exact = topSet(Similarity.bruteForceTopK(corpus, probes, "vec_id", "embedding", 5))
    val ivf1 = topSet(Similarity.ivfTopK(corpus, cents, probes, "vec_id", "embedding", 5, nprobe = 1))
    val ivf3 = topSet(Similarity.ivfTopK(corpus, cents, probes, "vec_id", "embedding", 5, nprobe = 3))
    def recall(got: Set[(Long, Long)]) = (got intersect exact).size.toDouble / exact.size
    // same-cluster neighbors dominate the top-5 -> even nprobe=1 is high
    assert(recall(ivf1) > 0.8, s"nprobe=1 recall ${recall(ivf1)}")
    assert(recall(ivf3) >= recall(ivf1))
    assert(recall(ivf3) > 0.95, s"nprobe=3 recall ${recall(ivf3)}")
  }

  test("exactPairs carried-norm scorer is bit-identical to the fused cosine kernel (r21)") {
    // The r21 rewrite precomputes dot(v,v) once per row and scores
    // dot/(√n2a·√n2b); every accumulator of the fused kernel is an
    // independent in-order sum, so the values must match the fused
    // cosine BITWISE — not merely within tolerance.  Edge rows ride
    // along: a zero-norm vector (NaN cosine → dropped by both forms)
    // and a vector with a null ELEMENT (reads as 0.0 in both kernels).
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types.{StructType, StructField, LongType, ArrayType, FloatType}
    val rnd = new scala.util.Random(13)
    val base: Seq[SRow] = (0L until 60L).map { i =>
      SRow(i, Array.fill(16)(java.lang.Float.valueOf(rnd.nextGaussian().toFloat)).toSeq)
    }
    val zeroNorm = SRow(60L, Array.fill(16)(java.lang.Float.valueOf(0f)).toSeq)
    val nullElem = SRow(61L, {
      val a = Array.fill(16)(java.lang.Float.valueOf(1f)); a(3) = null; a.toSeq
    })
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(base :+ zeroNorm :+ nullElem, 4), schema)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1)) ->
      java.lang.Double.doubleToRawLongBits(r.getDouble(2))
    val got = Similarity.exactPairs(df, "vec_id", "embedding", threshold = -1.0)
      .collect().map(key).toMap
    // reference: the pre-r21 fused-kernel formulation, same filters
    val v = df.select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("v"))
    val ref = v.alias("a").join(v.alias("b"), col("a.vid") < col("b.vid"))
      .select(col("a.vid"), col("b.vid"),
        round(graft.functions.VectorSim.cosine(col("a.v"), col("b.v")), 6).as("c"))
      .filter(col("c").isNotNull && col("c") >= -1.0 && !isnan(col("c")))
      .collect().map(key).toMap
    assert(got.size == ref.size && got == ref)
    // the zero-norm vector's pairs are NaN in both forms and absent
    assert(!got.keys.exists { case (a, b) => a == 60L || b == 60L })
    // the null-element vector still scores (null elements read as 0)
    assert(got.keys.exists { case (_, b) => b == 61L })
  }

  test("carried-norm scorer on RAGGED pairs: full-vector norms, pinned (r22)") {
    // The bit-identical claim above holds for EQUAL-length vectors
    // (the declared corpora; every embedding table is fixed-dim).  For
    // defensive ragged inputs the two forms intentionally diverge: the
    // fused kernel truncates all three accumulators to min(|a|,|b|),
    // while the carried-norm scorer uses each vector's FULL norm —
    // i.e. it treats the shorter vector as zero-padded, which is the
    // honest cosine of what was stored.  Pin that semantics (r21
    // ADVICE: the claim was over-broad and only 16-dim was tested).
    val df = Seq(
      (1L, Seq(3.0f, 4.0f)),            // |v| = 5
      (2L, Seq(3.0f, 4.0f, 12.0f)))     // |v| = 13
      .toDF("vec_id", "embedding")
    val got = Similarity.exactPairs(df, "vec_id", "embedding", threshold = -1.0)
      .collect().map(r => r.getDouble(2)).toSeq
    // dot over min-length = 3*3 + 4*4 = 25; denom = 5 * 13 (FULL norms)
    val expected = math.rint(25.0 / (5.0 * 13.0) * 1e6) / 1e6
    assert(got == Seq(expected),
      s"ragged pair scored $got, expected $expected (full-vector norms)")
  }

  test("lshPairs recall against exactPairs, and OR-amplification helps") {
    // deterministic corpus: 40 cluster centers, 5 perturbed members each
    // (seeded) — ground truth = exactPairs at the same threshold
    val rnd = new scala.util.Random(11)
    val data = (0 until 40).flatMap { c =>
      val center = Array.fill(16)(rnd.nextGaussian().toFloat)
      (0 until 5).map { m =>
        val v = center.map(x => x + 0.15f * rnd.nextGaussian().toFloat)
        (c * 10L + m, v)
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val exact = Similarity.exactPairs(df, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    def recall(tables: Int): Double = {
      val got = Similarity.lshPairs(df, "vec_id", "embedding", planes = 6, tables = tables)
        .filter(col("cos_sim") >= 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.subsetOf(exact)) // LSH candidates are exact-scored: no false positives
      got.size.toDouble / exact.size
    }
    val r1 = recall(1); val r3 = recall(3)
    assert(r3 >= r1, s"OR-amplification reduced recall: $r1 -> $r3")
    assert(r3 > 0.8, s"3-table recall $r3 too low on clustered data")
  }

  test("derived planes keep expected bucket population bounded across 100x growth") {
    // the r4 hazard: fixed planes => bucket population n / 2^planes
    // grows linearly with the corpus and the intra-bucket self-join is
    // quadratic in it.  planesFor must hold population in
    // (target/2, target] at ANY n outside the clamp region.
    for (n <- Seq(10_000L, 1_000_000L, 100_000_000L, 10_000_000_000L)) {
      val p = Similarity.planesFor(n)
      val pop = n.toDouble / (1L << p)
      assert(pop <= 256.0, s"n=$n planes=$p population $pop > target")
      assert(pop > 128.0, s"n=$n planes=$p population $pop — overshot (wasted cells)")
    }
    // clamps: tiny corpora floor at 4 planes, absurd ones cap at 30
    assert(Similarity.planesFor(10L) == 4)
    assert(Similarity.planesFor(Long.MaxValue) == 30)
    // monotone: growing the corpus never decreases the plane count
    val ps = Seq(1L, 1000L, 100_000L, 10_000_000L, 1_000_000_000L).map(Similarity.planesFor(_))
    assert(ps == ps.sorted)
    // auto-derive plumbing: planes=0 (default) must equal the explicit
    // planesFor(count) geometry end to end
    val rnd = new scala.util.Random(11)
    val df = (0L until 400L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val auto = Similarity.lshPairs(df, "vec_id", "embedding", tables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicit = Similarity.lshPairs(df, "vec_id", "embedding",
        planes = Similarity.planesFor(400L), tables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == explicit)
  }

  test("pqEncode: codes equal brute-force per-subspace argmin; pure projection") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = 4; val k = 8
    val got = Similarity.pqEncode(e, "vec_id", "embedding", m, k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // Scala reference: same md5-order seed draw, same slicing, same argmin
    val vecs = e.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toMap
    val md5Key = e.sparkSession.createDataFrame(
        vecs.keys.toSeq.map(Tuple1(_))).toDF("id")
      .select(col("id"), conv(substring(md5(col("id").cast("string")), 1, 6), 16, 10)
        .cast("long").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeds = vecs.keys.toSeq.sortBy(id => (md5Key(id), id)).take(k).sorted
    val dim = vecs.values.head.size; val sub = dim / m
    for (((vid, s), (code, dist)) <- got) {
      val sl = vecs(vid).slice(s.toInt * sub, (s.toInt + 1) * sub)
      val best = seeds.map { cid =>
        val cs = vecs(cid).slice(s.toInt * sub, (s.toInt + 1) * sub)
        (math.sqrt(sl.zip(cs).map { case (x, y) => (x - y) * (x - y) }.sum), cid)
      }.min
      assert(code == best._2, s"vec $vid sub $s: code $code vs ${best._2}")
      assert(math.abs(dist - best._1) <= 1e-6)
    }
    assert(got.size == vecs.size * m)
    // rows per vector per subspace; no shuffle beyond the seed sort —
    // the encode itself is a scan-stage projection (explode over m
    // literal-codebook structs; no Exchange in the encode plan)
    val plan = Similarity.pqEncode(e, "vec_id", "embedding", m, k)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    intercept[IllegalArgumentException] {
      Similarity.pqEncode(e, "vec_id", "embedding", m = 7, k = 4) } // 64 % 7 != 0
  }

  test("pqEncode trained codebooks: error never worse than seeds; deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def totalDist(iters: Int): Double =
      Similarity.pqEncode(e, "vec_id", "embedding", m = 4, k = 8, iters = iters)
        .agg(sum(col("dist"))).collect()(0).getDouble(0)
    val seedErr = totalDist(0)
    val trainedErr = totalDist(2)
    assert(trainedErr <= seedErr + 1e-9,
      s"Lloyd refinement must not increase quantization error: $trainedErr vs $seedErr")
    // two runs are bit-identical (deterministic seeds + argmin)
    val a = Similarity.pqEncode(e, "vec_id", "embedding", 4, 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Similarity.pqEncode(e, "vec_id", "embedding", 4, 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  test("pqTopK: ADC scores equal a Scala reference over the encoded corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = 4; val k = 8; val topK = 5
    val got = Similarity.pqTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding",
        m, k, topK)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // Scala reference: same seeds, same code assignment, ADC over codes
    val vecs = e.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toMap
    val md5Key = e.sparkSession.createDataFrame(vecs.keys.toSeq.map(Tuple1(_))).toDF("id")
      .select(col("id"), conv(substring(md5(col("id").cast("string")), 1, 6), 16, 10)
        .cast("long").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeds = vecs.keys.toSeq.sortBy(id => (md5Key(id), id)).take(k).sorted
    val dim = vecs.values.head.size; val sub = dim / m
    def l2(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    def slice(v: IndexedSeq[Double], s: Int) = v.slice(s * sub, (s + 1) * sub)
    def codeOf(vid: Long, s: Int): Long =
      seeds.map(cid => (l2(slice(vecs(vid), s), slice(vecs(cid), s)), cid)).min._2
    for (pid <- Seq(0L, 1L, 2L)) {
      val scored = vecs.keys.filter(_ != pid).map { vid =>
        val adc2 = (0 until m).map { s =>
          val d = l2(slice(vecs(pid), s), slice(vecs(codeOf(vid, s)), s)); d * d
        }.sum
        (adc2, vid)
      }.toSeq.sorted.take(topK)
      scored.zipWithIndex.foreach { case ((adc2, vid), i) =>
        val (gv, gd) = got((pid, i + 1))
        assert(gv == vid, s"probe $pid rank ${i + 1}: $gv vs $vid")
        assert(math.abs(gd - math.sqrt(adc2)) <= 1e-6)
      }
    }
    // the corpus scan reads codes, never probe-side vector math: the
    // scored plan has no vector kernel, only map lookups
    assert(got.size == 3 * topK)
  }

  test("ivfPqTopK: full-probe equals pqTopK bit-for-bit; nprobe=1 stays in-cell") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 3)
    // 4 deterministic centroids: the md5-order head of the corpus
    val cents = Similarity.kmeansFit(e, "vec_id", "embedding", k = 4, iters = 2)
      .select(col("centroid_id").as("vec_id"),
        col("centroid").cast("array<float>").as("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // admitting every cell makes the cell filter a no-op -> identical
    // output to the flat ADC search
    val full = rows(Similarity.ivfPqTopK(e, cents, probes, "vec_id", "embedding",
      m = 4, k = 8, topK = 5, nprobe = 4))
    val flat = rows(Similarity.pqTopK(e, probes, "vec_id", "embedding",
      m = 4, k = 8, topK = 5))
    assert(full == flat, s"nprobe=all must equal pqTopK\nonly ivfpq: ${full.diff(flat)}")
    // nprobe=1: every result lives in its probe's own nearest cell
    val one = Similarity.ivfPqTopK(e, cents, probes, "vec_id", "embedding",
      m = 4, k = 8, topK = 5, nprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val cellOf = Similarity.ivfAssign(e, cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    one.foreach { case (pid, cid2) =>
      assert(cellOf(pid) == cellOf(cid2),
        s"probe $pid (cell ${cellOf(pid)}) got $cid2 from cell ${cellOf(cid2)}") }
    assert(one.nonEmpty)
    // residual degenerate case: one zero centroid makes residual = v,
    // the residual codebook = the raw seeds, and each probe residual
    // = the probe — bit-identical to the flat ADC search
    val zeroCent = Seq((0L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val residualZero = rows(Similarity.ivfPqTopK(e, zeroCent, probes,
      "vec_id", "embedding", m = 4, k = 8, topK = 5, nprobe = 1, residual = true))
    assert(residualZero == flat,
      s"zero-centroid residual must equal pqTopK\ndiff: ${residualZero.diff(flat)}")
    // residual path is deterministic with real centroids
    val r1 = rows(Similarity.ivfPqTopK(e, cents, probes, "vec_id", "embedding",
      m = 4, k = 8, topK = 5, nprobe = 2, residual = true))
    val r2 = rows(Similarity.ivfPqTopK(e, cents, probes, "vec_id", "embedding",
      m = 4, k = 8, topK = 5, nprobe = 2, residual = true))
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("meanPool pools per group; l2Normalize makes cosine a dot product") {
    val df = Seq(
      (1, Array(1.0f, 3.0f)), (1, Array(3.0f, 5.0f)),
      (2, Array(2.0f, 2.0f)),
      (3, null.asInstanceOf[Array[Float]])).toDF("label", "embedding")
    val pooled = Similarity.meanPool(df, col("label"), col("embedding"))
      .collect().map(r => r.getInt(0) -> ((r.getSeq[Double](1), r.getLong(2)))).toMap
    assert(pooled(1) == ((Seq(2.0, 4.0), 2L)))
    assert(pooled(2) == ((Seq(2.0, 2.0), 1L)))
    assert(!pooled.contains(3), "all-null group has no pooled vector")
    val v = Similarity.l2Normalized(
        Seq((1, Array(3.0f, 4.0f)), (2, Array(0.0f, 0.0f))).toDF("id", "v"), "v")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(v(1) == Seq(0.6, 0.8))
    assert(v(2) == Seq(0.0, 0.0), "zero vector survives normalization")
    // ragged vector lengths within one group violate the uniform-
    // dimensionality contract: tail dims would average over fewer
    // members — the per-group min(n)==max(n) probe fails the job
    // instead of returning a silently misleading frame
    val ragged = Seq((1, Array(1.0f, 2.0f)), (1, Array(3.0f))).toDF("label", "embedding")
    val ex = intercept[Exception] {
      Similarity.meanPool(ragged, col("label"), col("embedding")).collect()
    }
    assert(ex.getMessage.contains("ragged") ||
      Option(ex.getCause).exists(_.getMessage.contains("ragged")))
    // the guard must survive column pruning: a caller projecting away
    // n_members (the review-flagged hazard) still hits the assert,
    // because it is folded into the always-kept vec column
    val ex2 = intercept[Exception] {
      Similarity.meanPool(ragged, col("label"), col("embedding"))
        .select("group_id", "vec").collect()
    }
    assert(ex2.getMessage.contains("ragged") ||
      Option(ex2.getCause).exists(_.getMessage.contains("ragged")))
    // ...and the mirror image: a caller keeping only n_members (vec
    // pruned away) must hit the guard too — the assert is folded into
    // BOTH caller-visible columns
    val ex3 = intercept[Exception] {
      Similarity.meanPool(ragged, col("label"), col("embedding"))
        .select("group_id", "n_members").collect()
    }
    assert(ex3.getMessage.contains("ragged") ||
      Option(ex3.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("kmeansFit recovers well-separated blobs; deterministic; feeds ivfTopK") {
    val rnd = new scala.util.Random(3)
    // three tight blobs far apart in 4-d; ids interleaved so the
    // md5-order seeds land in different blobs with high probability
    val blobs = Seq(Array(10.0, 0, 0, 0), Array(0.0, 10, 0, 0), Array(0.0, 0, 10, 0))
    val data = (0 until 90).map { i =>
      val c = blobs(i % 3)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val fit = Similarity.kmeansFit(df, "vec_id", "embedding", k = 3, iters = 5)
    val rows = fit.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(2)).sum == 90L, "every vector assigned")
    // with 5 rounds on separated blobs, each centroid sits on one blob
    // mean (within noise) and holds exactly a third of the data
    assert(rows.forall(_.getLong(2) == 30L),
      s"expected 30 members each, got ${rows.map(_.getLong(2)).toSeq}")
    val recovered = rows.map(_.getSeq[Double](1).toArray)
    for (b <- blobs)
      assert(recovered.exists(c => math.sqrt(c.zip(b).map { case (x, y) =>
        (x - y) * (x - y) }.sum) < 0.1), s"no centroid near blob ${b.toSeq}")
    // deterministic end to end
    val again = Similarity.kmeansFit(df, "vec_id", "embedding", k = 3, iters = 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2))).toSet)
    // trained centroids drop straight into the IVF probe path
    val cents = fit.select(col("centroid_id").as("vec_id"), col("centroid").as("embedding"))
    val probes = df.limit(5)
    val hits = Similarity.ivfTopK(df, cents, probes, "vec_id", "embedding",
      k = 3, nprobe = 1)
    // nprobe=1 on perfectly separated blobs: every top-3 neighbor of a
    // probe lives in the probe's own blob, so recall vs brute force is 1
    val brute = Similarity.bruteForceTopK(df, probes, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = hits.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, "nprobe=1 trained-cell recall must be exact on separated blobs")
  }

  test("lshPairs survives a null vector in the first row (dim probe skips nulls)") {
    // if the dimensionality probe samples the null row, size() is null
    // and the whole query would silently take the empty-frame path
    val df = Seq(
      (0L, null.asInstanceOf[Array[Float]]),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.lshPairs(df, "vec_id", "embedding", planes = 2, tables = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"near-parallel pair lost to the null probe row: $got")
    val topk = Similarity.lshTopK(df.where(col("embedding").isNotNull), "vec_id", "embedding", 1, planes = 2)
    assert(topk.count() > 0)
  }

  test("empty / all-null corpus keeps the real id dtype in the empty pair frame") {
    val empty = Seq.empty[(String, Array[Float])].toDF("vec_id", "embedding")
    val p = Similarity.lshPairs(empty, "vec_id", "embedding")
    assert(p.count() == 0)
    assert(p.schema("id_a").dataType == org.apache.spark.sql.types.StringType)
    assert(p.schema("id_b").dataType == org.apache.spark.sql.types.StringType)
    // unions cleanly with a non-empty string-id result (schema agreement)
    val allNull = Seq(("a", null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val p2 = Similarity.lshPairs(allNull, "vec_id", "embedding")
    assert(p2.count() == 0 && p2.schema == p.schema)
  }

  test("knnGraphExact: per-source count bound, self-free, window-formulation parity") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200)
    val g = Similarity.knnGraphExact(e, "vec_id", "embedding", k = 3)
    val rows = g.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.groupBy(_._1).forall(_._2.length <= 3))
    assert(rows.forall { case (s, d, _) => s != d }, "self edge in kNN graph")
    // ground truth via the window formulation on the same rounded sims
    val pairs = Similarity.exactPairs(e, "vec_id", "embedding", threshold = -1.0)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"), col("cos_sim"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst"), col("cos_sim")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cos_sim").desc, col("dst").asc)
    val expected = edges.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("src", "dst", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.sorted.toSeq == expected.sorted.toSeq)
  }

  test("knnGraph (LSH-bucketed): bounded per source, useful recall, no cartesian") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 500)
    val approx = Similarity.knnGraph(e, "vec_id", "embedding", k = 5, tables = 4)
    val plan = approx.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"per-key top-k not on the custom operator:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "approximate path fell back to all-pairs")
    val a = approx.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.collect().map(r => r.getLong(0)).groupBy(identity).forall(_._2.length <= 5))
    val exact = Similarity.knnGraphExact(e, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = a.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.25, s"kNN recall $recall collapsed (|approx|=${a.size}, |exact|=${exact.size})")
  }

  test("zero-norm vectors never rank in top-k (NaN similarity excluded)") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f)), // zero norm: NaN against everything
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1L)
    val brute = Similarity.bruteForceTopK(corpus, probes, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(!brute.map(_._1).contains(0L), s"zero vector ranked: ${brute.toSeq}")
    assert(brute.find(_._2 == 1).exists(_._1 == 2L), "true neighbor must rank first")
    val viaLsh = Similarity.lshTopK(corpus, "vec_id", "embedding", k = 3, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!viaLsh.map(_._2).contains(0L), s"zero vector in LSH top-k: ${viaLsh.toSeq}")
  }

  test("lshPairs maxBucket drops degenerate buckets, leaves normal ones intact") {
    import spark.implicits._
    // 60 identical vectors (one signature in every table) + 6 spread ones
    val clones = (0L until 60L).map(i => (i, Array(1.0f, 0.0f, 0.0f)))
    val spread = (100L until 106L).map(i =>
      (i, Array(math.cos(i).toFloat, math.sin(i).toFloat, 0.3f)))
    val df = (clones ++ spread).toDF("vec_id", "embedding")
    val capped = Similarity.lshPairs(df, "vec_id", "embedding", planes = 4, maxBucket = 10)
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // the 60-clone bucket (population 60 > 10) must be gone: no clone-clone pair
    assert(!pairs.exists { case (a, b) => a < 60 && b < 60 },
      s"degenerate bucket survived the cap: ${pairs.take(5).mkString(",")}")
    // uncapped finds the clone pairs (the quadratic the cap avoids)
    val uncapped = Similarity.lshPairs(df, "vec_id", "embedding", planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.count { case (a, b) => a < 60 && b < 60 } == 60 * 59 / 2)
  }

  test("mutualKnn keeps exactly the reciprocal edges, once each") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200)
    val knn = Similarity.knnGraphExact(e, "vec_id", "embedding", k = 3)
    val directed = knn.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = Similarity.mutualKnn(knn).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = directed.filter { case (s, d) => s < d && directed.contains((d, s)) }
    assert(mutual == expected && mutual.nonEmpty)
    assert(mutual.forall { case (s, d) => s < d }, "mutual edges must be reported once")
    // mutual ⊂ kNN: the refinement can only remove
    assert(mutual.forall { case (s, d) => directed.contains((s, d)) })
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("sentences / sentenceStats / repeatedSentences: boundaries and fingerprints") {
    val docs = Seq(
      (1L, "First one. Second one!  Third?Fourth stays glued. tail"),
      (2L, "Shared boilerplate sentence. Unique content here."),
      (3L, "shared BOILERPLATE sentence!! Another unique bit."),
      (4L, "")).toDF("doc_id", "text")
    val sents = TextAnalysis.sentences(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byDoc = sents.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // "?Fourth" has no whitespace after '?' -> NOT a boundary (RE2-safe
    // regex, no lookarounds); trailing "tail" has no punctuation
    assert(byDoc(1L) == Seq("First one", "Second one", "Third?Fourth stays glued", "tail"))
    assert(byDoc(2L) == Seq("Shared boilerplate sentence", "Unique content here."))
    assert(!byDoc.contains(4L), "empty text yields no sentences")
    val stats = TextAnalysis.sentenceStats(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(stats(1L) == ((4L, 24L)))
    // repeated: the normalized fingerprint unifies case/punct variants
    val rep = TextAnalysis.repeatedSentences(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.toSeq == Seq((2L, 2L, 2L)),
      s"exactly the shared boilerplate (2 docs, 2 occurrences, first=2): ${rep.toSeq}")
  }

  test("bpeTopMerges: matches a Scala BPE reference; deterministic ties; early stop") {
    // classic BPE corpus (word frequencies drive the merges)
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTopMerges(docs, col("text"), rounds = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    // Scala reference: same tiebreak, left-to-right non-overlap merge
    def refMerges(ws: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
      var vocab: Map[List[String], Long] =
        ws.map { case (w, c) => w.map(_.toString).toList -> c }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      for (_ <- 0 until rounds) {
        val counts = vocab.toSeq.flatMap { case (syms, c) =>
          syms.zip(syms.drop(1)).map(p => p -> c) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        if (counts.nonEmpty) {
          val ((l, r), n) = counts.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.head
          out += ((l, r, n))
          def merge(s: List[String]): List[String] = s match {
            case a :: b :: rest if a == l && b == r => (a + b) :: merge(rest)
            case a :: rest => a :: merge(rest)
            case Nil => Nil
          }
          vocab = vocab.toSeq.map { case (syms, c) => merge(syms) -> c }
            .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        }
      }
      out.toSeq
    }
    val wcounts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = refMerges(wcounts, 8).zipWithIndex
      .map { case ((l, r, n), i) => (i + 1L, l, r, n) }
    assert(got == expected, s"\ngot      $got\nexpected $expected")
    // "es" then "est" style merges must appear for newest/widest
    assert(got.exists(m => m._2 + m._3 == "est") || got.exists(m => m._2 + m._3 == "es"))
    // early stop: single-char corpus runs out of pairs
    val tiny = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTopMerges(tiny, col("text"), rounds = 5).count() == 0L)
  }

  test("bpeEncode: trained words segment as their final training-vocab form") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTopMerges(docs, col("text"), rounds = 8)
    val table = merges.orderBy(col("merge_rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // Scala reference of sequential rank-order application per word
    def enc(w: String): Seq[String] = {
      var toks = w.map(_.toString).toVector
      for ((l, r) <- table) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) { out += (l + r); i += 2 }
          else { out += toks(i); i += 1 }
        }
        toks = out.toVector
      }
      toks
    }
    val probe = Seq((1L, "low lower newest widest"), (2L, "unseen lowest"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(probe, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1).toList, r.getLong(2))).toMap
    val want1 = Seq("low", "lower", "newest", "widest").flatMap(enc).toList
    assert(got(1L)._1 == want1 && got(1L)._2 == want1.length.toLong,
      s"trained words must segment like training: ${got(1L)}")
    // unseen words still encode (compositional merges apply)
    val want2 = Seq("unseen", "lowest").flatMap(enc).toList
    assert(got(2L)._1 == want2, s"unseen words: ${got(2L)._1} vs $want2")
    // empty text -> zero tokens; zero merges -> plain characters
    assert(got(3L) == ((Nil, 0L)))
    val noMerges = TextAnalysis.bpeEncode(probe.filter(col("doc_id") === 1),
        col("doc_id"), col("text"), merges.limit(0))
      .collect().head
    assert(noMerges.getSeq[String](1).length == "lowlowernewestwidest".length)
    // compression is real: trained encoding is strictly shorter
    assert(got(1L)._2 < "lowlowernewestwidest".length)
  }

  test("bpeTopMerges: driver loop equals the distributed fallback; deep rounds stay fast") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // driverVocabLimit = 0 forces the per-round-Spark-job fallback; the
    // default takes the driver loop — the two must agree merge-for-merge
    val local = TextAnalysis.bpeTopMerges(docs, col("text"), rounds = 12)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val dist = TextAnalysis.bpeTopMerges(docs, col("text"), rounds = 12,
        driverVocabLimit = 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(local == dist, s"\nlocal $local\ndist  $dist")
    // the round-6 hazard: rounds beyond a handful paid one Spark job
    // each — 64 driver-loop rounds must finish in seconds, not minutes
    val t0 = System.nanoTime()
    val deep = TextAnalysis.bpeTopMerges(docs, col("text"), rounds = 64).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(deep.length == 64, s"expected 64 merges, got ${deep.length}")
    assert(secs < 30.0, s"64 driver-loop rounds took $secs s")
  }

  test("tokenEntropy: hand-computed cases + Scala reference on real docs") {
    val docs = Seq(
      1L -> "a a a a",        // uniform single token -> entropy 0
      2L -> "a b c d",        // uniform distinct -> log2(4) = 2
      3L -> "a a b b",        // two tokens equally -> 1 bit
      4L -> "solo",           // single token -> 0
      5L -> "a a a b").toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.tokenEntropy(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((4L, 0.0)))
    assert(got(2L) == ((4L, 2.0)))
    assert(got(3L) == ((4L, 1.0)))
    assert(got(4L) == ((1L, 0.0)))
    // 3/4 and 1/4: H = 2 - (3 log2 3)/4 = 0.811278
    assert(got(5L)._2 == 0.811278)
    // Scala reference over real corpus text
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
      .select(col("doc_id"), col("text"))
    val ref = real.collect().map { r =>
      val toks = r.getString(1).split(" ", -1).toSeq
      val n = toks.size.toDouble
      val h = math.log(n) / math.log(2.0) -
        toks.groupBy(identity).values.map(_.size)
          .map(c => c * (math.log(c) / math.log(2.0))).sum / n
      r.getLong(0) -> (math.rint(h * 1e6) / 1e6)
    }.toMap
    val gotReal = graft.operators.TextAnalysis.tokenEntropy(real, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    gotReal.foreach { case (id, h) =>
      assert(math.abs(h - ref(id)) <= 1e-6, s"doc $id: $h vs ${ref(id)}") }
  }

  test("repetitionSignals: hand-computed ratios, 1-token and all-same edges") {
    val docs = Seq(
      // tokens: a a b c  -> 4 tokens, 3 distinct, top=2
      // bigrams: "a a","a b","b c" -> 3 distinct of 3
      1L -> "a a b c",
      // a b a b a -> 5 tokens, 2 distinct, top=3
      // bigrams: "a b","b a","a b","b a" -> 2 distinct of 4
      2L -> "a b a b a",
      // single token: no bigrams -> dup_2gram_ratio 0 by definition
      3L -> "solo",
      // degenerate full repetition: 3 bigrams all "x x" -> 1 - 1/3
      4L -> "x x x x").toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((4L, 0.25, 0.0, 0.5)))
    assert(got(2L) == ((5L, 0.6, 0.5, 0.6)))
    assert(got(3L) == ((1L, 0.0, 0.0, 1.0)))
    assert(got(4L) == ((4L, 0.75, 0.666667, 1.0)))
  }

  test("topTerms: exact counts, deterministic tie order, k bound") {
    val docs = Seq("a b b c", "b c d", "x").toDF("text")
    val got = TextAnalysis.topTerms(docs, col("text"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // b=3; c=2; a,d,x=1 -> tie at n=1 broken term-asc: 'a'
    assert(got.toSeq == Seq(("b", 3L), ("c", 2L), ("a", 1L)))
  }

  test("token count / quality signals") {
    val df = Seq("one two three", "").toDF("text")
    val r = df.select(TextAnalysis.tokenCount(col("text")).as("n")).collect().map(_.getLong(0))
    assert(r.toSeq == Seq(3L, 0L))
  }

  test("langId picks dominant marker language, und for none") {
    val df = Seq(
      "the cat and the dog of the house",
      "el gato y la casa el perro la luna",
      "der hund und die katze der mann",
      "le chat et les chiens le soir",
      "xyzzy plugh").toDF("text")
    val langs = df.select(TextAnalysis.langId(col("text")).as("l")).collect().map(_.getString(0))
    assert(langs.toSeq == Seq("en", "es", "de", "fr", "und"))
  }

  test("fingerprint is case/punctuation invariant") {
    val df = Seq(("Hello, World!", "hello world")).toDF("a", "b")
    val r = df.select((TextAnalysis.fingerprint(col("a")) === TextAnalysis.fingerprint(col("b"))).as("eq"))
      .collect().head.getBoolean(0)
    assert(r)
  }

  test("shingles of short text are empty, not descending-sequence garbage") {
    val df = Seq("ab").toDF("text")
    val r = df.select(size(TextAnalysis.shingles(col("text"), 5)).as("n")).collect().head.getInt(0)
    assert(r == 0)
  }

  test("unigramLogLik: hand-computed LM scores; rare-token docs score lower") {
    // corpus counts: a=3, b=1, c=1, total=5
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogLik(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ln = (x: Double) => math.log(x)
    val want1 = (ln(3.0 / 5) + ln(3.0 / 5) + ln(1.0 / 5)) / 3
    val want2 = (ln(3.0 / 5) + ln(1.0 / 5)) / 2
    assert(got(1L)._1 == 3L && got(2L)._1 == 2L)
    assert(math.abs(got(1L)._2 - want1) < 1e-6 && math.abs(got(2L)._2 - want2) < 1e-6)
    // the common-word doc outscores the rare-token soup
    val df2 = Seq((1L, "the the the cat"), (2L, "qqq zzz www vvv")).toDF("doc_id", "text")
    val s = TextAnalysis.unigramLogLik(df2, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) > s(2L))
  }
}

class AstroSpec extends SparkSpec {
  import spark.implicits._

  test("review fixes: sexagesimal rollover, regex delimiters, null propagation") {
    // seconds that round to 60.00 must carry into the minute, never
    // render ":60.00"
    val roll = Seq(15.24998333, 1.0166655).toDF("deg")
    val hms = roll.select(Astro.deg2hms(col("deg"))).collect().map(_.getString(0))
    assert(hms(0) == "01:01:00.00", s"hms rollover: ${hms(0)}")
    assert(!hms.exists(_.contains(":60")), s"invalid seconds: ${hms.toSeq}")
    val dms = roll.select(Astro.deg2dms(col("deg"))).collect().map(_.getString(0))
    assert(dms(1) == "+01:01:00.00", s"dms rollover: ${dms(1)}")
    // 360°-boundary contract (no input canonicalization, documented at
    // deg2hms): an angle that rounds to a full turn renders the
    // out-of-range-but-faithful "24:00:00.00" and round-trips exactly
    // through hms2deg — it must NOT wrap to 00:00:00.00
    val turn = Seq(359.9999999, 360.0001).toDF("deg")
    val th = turn.select(Astro.deg2hms(col("deg")),
      Astro.hms2deg(Astro.deg2hms(col("deg")))).collect()
    assert(th(0).getString(0) == "24:00:00.00", s"boundary: ${th(0).getString(0)}")
    assert(math.abs(th(0).getDouble(1) - 360.0) < 1e-9, "round-trip at the turn")
    assert(th(1).getString(0) == "24:00:00.02", s"past the turn: ${th(1).getString(0)}")
    // delimiter is treated literally, not as a regex
    val dotted = Seq("12.30.00").toDF("h")
    val viaDot = dotted.select(Astro.hms2deg(col("h"), ".")).collect().head.getDouble(0)
    assert(math.abs(viaDot - 187.5) < 1e-9, s"dot-delimited parse: $viaDot")
    // null coordinates propagate as null, never a fabricated value
    val nullRow = spark.sql("SELECT CAST(NULL AS DOUBLE) d, 10.0 r")
    assert(nullRow.select(Astro.sphdist(col("r"), col("d"), lit(0.0), lit(0.0)))
      .collect().head.isNullAt(0), "sphdist(null) must be null, not 180")
    val (_, bo) = Astro.euler(col("r"), col("d"), select = 1)
    assert(nullRow.select(bo).collect().head.isNullAt(0),
      "euler(null lat) must be null, not +90")
  }

  test("sphdist: zero, quarter-circle, pole distances") {
    val df = Seq((0.0, 0.0, 0.0, 0.0), (0.0, 0.0, 90.0, 0.0), (0.0, 0.0, 0.0, 90.0))
      .toDF("ra1", "dec1", "ra2", "dec2")
    val d = df.select(Astro.sphdist(col("ra1"), col("dec1"), col("ra2"), col("dec2")).as("d"))
      .collect().map(_.getDouble(0))
    assert(math.abs(d(0)) < 1e-12)
    assert(math.abs(d(1) - 90.0) < 1e-9)
    assert(math.abs(d(2) - 90.0) < 1e-9)
  }

  test("hms/dms round trips") {
    val df = Seq("10:30:00", "-05:15:30").toDF("s")
    val h = df.select(Astro.hms2deg(col("s")).as("d")).collect().map(_.getDouble(0))
    assert(math.abs(h(0) - 157.5) < 1e-9)          // 10.5 h * 15
    assert(math.abs(h(1) + 78.875) < 1e-9)          // -(5 + 15/60 + 30/3600) * 15
    val dm = df.select(Astro.dms2deg(col("s")).as("d")).collect().map(_.getDouble(0))
    assert(math.abs(dm(0) - 10.5) < 1e-9)
    assert(math.abs(dm(1) + 5.258333333333334) < 1e-9)
  }

  test("euler galactic transform hits known anchor (galactic center)") {
    // the galactic origin direction (J2000 RA 266.405, Dec -28.936) -> l,b ~ (0, 0)
    val origin = Seq((266.405, -28.936)).toDF("ra", "dec")
    val (l, b) = Astro.euler(col("ra"), col("dec"), select = 1)
    val r0 = origin.select(l.as("l"), b.as("b")).collect().head
    assert(math.abs(r0.getDouble(0)) < 0.01 || math.abs(r0.getDouble(0) - 360.0) < 0.01)
    assert(math.abs(r0.getDouble(1)) < 0.01)
    // galactic north pole (RA 192.85948, Dec 27.12825) -> b = +90
    val pole = Seq((192.85948, 27.12825)).toDF("ra", "dec")
    val rp = pole.select(b.as("b")).collect().head
    assert(math.abs(rp.getDouble(0) - 90.0) < 0.001)
  }

  test("euler b1950 equinox: FK4 pole anchor and round trip") {
    // the FK4 galactic north pole is DEFINED at B1950 RA 192.25,
    // Dec 27.4 -> b = +90 exactly under the b1950 tables
    val (_, b50) = Astro.euler(col("ra"), col("dec"), select = 1, b1950 = true)
    val pole = Seq((192.25, 27.4)).toDF("ra", "dec")
    assert(math.abs(pole.select(b50.as("b")).collect().head.getDouble(0) - 90.0) < 0.001)
    // the J2000 tables put that direction visibly off the pole
    val (_, b20) = Astro.euler(col("ra"), col("dec"), select = 1)
    assert(math.abs(pole.select(b20.as("b")).collect().head.getDouble(0) - 90.0) > 0.1)
    // round trip: RA-Dec -> Gal -> RA-Dec under b1950 returns the input
    val pts = Seq((10.0, 20.0), (250.5, -60.25), (359.9, 89.0)).toDF("ra", "dec")
    val (gl, gb) = Astro.euler(col("ra"), col("dec"), select = 1, b1950 = true)
    val fwd = pts.select(col("ra"), col("dec"), gl.as("l"), gb.as("b"))
    val (ra2, dec2) = Astro.euler(col("l"), col("b"), select = 2, b1950 = true)
    fwd.select(col("ra"), col("dec"), ra2.as("ra2"), dec2.as("dec2"))
      .collect().foreach { r =>
        // the published 11-digit constant tables limit inversion to
        // ~5e-9 deg; 1e-6 deg is still sub-milliarcsecond
        assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-6, "ra round trip")
        assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-6, "dec round trip")
      }
  }

  test("gaia healpix level rescale") {
    val df = Seq(34359738368L * 7 + 123L).toDF("source_id")
    val cell = df.select(Astro.gaiaHealpix(col("source_id"), 12).as("c")).collect().head.getLong(0)
    assert(cell == 7L)
  }

  test("deg2hms/deg2dms format and invert") {
    val df = Seq(157.5, -78.875).toDF("deg")
    val hms = df.select(Astro.deg2hms(col("deg")).as("s")).collect().map(_.getString(0))
    assert(hms(0) == "10:30:00.00")
    assert(hms(1) == "-05:15:30.00")
    val dms = df.select(Astro.deg2dms(col("deg")).as("s")).collect().map(_.getString(0))
    assert(dms(1) == "-78:52:30.00")
    // round trip through the parser
    val rt = df.select(Astro.hms2deg(Astro.deg2hms(col("deg"))).as("d")).collect().map(_.getDouble(0))
    assert(math.abs(rt(0) - 157.5) < 1e-6 && math.abs(rt(1) + 78.875) < 1e-6)
  }

  test("combined astro where: predicate AND cone AND zone with separation column") {
    val ez = graft.core.EzFrame(Seq(
      (10.0, 0.0, 1.0), (12.0, 1.0, 5.0), (50.0, 0.0, 1.0), (10.5, 0.5, 0.5))
      .toDF("ra", "dec", "mag"))
    val out = Astro.combinedWhere(ez, "ra", "dec",
      condition = Some("mag < 2"),
      cone = Some((10.0, 0.0, 5.0)),
      zone = Some((0.0, 20.0, -10.0, 10.0)))
    val rows = out.df.orderBy("ra").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(10.0, 10.5)) // 12.0 fails mag, 50.0 fails cone+zone
    assert(out.columns.contains("separation"))
    assert(rows.head.getAs[Double]("separation") == 0.0)
  }

  test("aitoff projection stays in bounds and maps origin to origin") {
    val df = Seq((0.0, 0.0), (170.0, 80.0), (-170.0, -80.0)).toDF("lon", "lat")
    val (x, y) = Astro.projectAitoff(col("lon"), col("lat"))
    val rows = df.select(x.as("x"), y.as("y")).collect()
    assert(math.abs(rows(0).getDouble(0)) < 1e-9 && math.abs(rows(0).getDouble(1)) < 1e-9)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0)) <= 180.0 && math.abs(r.getDouble(1)) <= 90.0)
    }
  }
}

/** Property pinning of the fused text kernels: on ARBITRARY strings
  * (unicode, emoji, controls, nulls mixed in) the one-pass codegen
  * kernels must agree bit-for-bit with the r3 explode/groupBy
  * formulations they replaced.  Deterministic seeded sampling straight
  * from the ScalaCheck Gen (offline stand-in for scalatestplus). */
class MinHashPropertySpec extends SparkSpec {
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed
  import spark.implicits._
  import graft.operators.Dedup

  test("multi-byte shingle hashing matches the substring formulation exactly") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val texts = Seq("héllo wörld ünïcode", "中文文本去重测试中文文本", "a🦑b🦑c🦑d🦑e", "mixedé ascii ße中")
    texts.foreach { t =>
      val u = UTF8String.fromString(t)
      val n = 3
      val cnt = u.numChars() - (n - 1)
      // reference: per-window substring hash (the old O(L²) fallback)
      val ref = (0 until cnt).map(p => XXH64.hashUTF8String(u.substringSQL(p + 1, n), 42L)).toSet
      val got = graft.functions.MinHash.shingleHashSetData(u, n)
      assert(got.toLongArray().toSet == ref, s"byte-span hashing diverged for '$t'")
      // and the signature kernel agrees with a fold over the reference hashes
      val k = 8
      val sig = graft.functions.MinHash.minhashData(u, n, k).toLongArray()
      val seeds = Array.tabulate(k)(i => XXH64.hashInt(i, 42L))
      val refSig = Array.tabulate(k) { i =>
        (0 until cnt).map(p => XXH64.hashLong(
          XXH64.hashUTF8String(u.substringSQL(p + 1, n), 42L), seeds(i))).min
      }
      assert(sig.toSeq == refSig.toSeq, s"signature diverged for '$t'")
    }
  }

  private val genText: Gen[String] = Gen.frequency(
    4 -> Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.const(" "),
      1 -> Gen.oneOf("é", "ß", "中", "🦑", "\t", ".", ","))).map(_.mkString),
    1 -> Gen.const(""),
    1 -> Gen.const(null: String))

  test("fused signature and hash-set kernels equal the exploded formulations on arbitrary text") {
    val texts = (0 until 200).map(i =>
      (i.toLong, genText.pureApply(Gen.Parameters.default.withSize(60), Seed(i.toLong))))
    val df = texts.toDF("doc_id", "text")
    val fusedSig = Dedup.minhashSignatures(df, col("text"), col("doc_id"), 4, 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val explSig = Dedup.minhashSignaturesExploded(df, col("text"), col("doc_id"), 4, 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(fusedSig == explSig)
    // hash-set kernel vs distinct exploded shingle hashes
    val fusedSet = df.select(col("doc_id"),
        graft.functions.MinHash.shingleHashSet(
          graft.operators.TextAnalysis.normalize(col("text")), 4).as("hs"))
      .filter(col("hs").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val explSet = graft.operators.TextAnalysis.shingleHashes(df, col("text"), col("doc_id"), 4)
      .groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fusedSet == explSet)
    // sorted-set invariant the merge-walk intersection relies on
    df.select(graft.functions.MinHash.shingleHashSet(
        graft.operators.TextAnalysis.normalize(col("text")), 4).as("hs"))
      .filter(col("hs").isNotNull).collect().foreach { r =>
        val a = r.getSeq[Long](0)
        assert(a == a.sorted && a.distinct.size == a.size)
      }
    // fused simhash kernel vs the exploded vote-sum formulation
    val fusedSh = Dedup.simhash(df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val explSh = Dedup.simhashExploded(df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fusedSh == explSh)
  }

  test("rolling window-hash kernel: exact poly values, substring-equality parity") {
    // Scala reference: direct O(len·width) polynomial evaluation per
    // window — the rolling recurrence must match it bit-for-bit
    def ref(s: String, width: Int, base: Long): Seq[Long] = {
      // the kernel slides over UTF-8 BYTES (exact on the ASCII
      // normalized domain; still well-defined on arbitrary input)
      val bytes = s.getBytes("UTF-8")
      (0 to bytes.length - width).map { i =>
        bytes.slice(i, i + width).foldLeft(0L)((h, b) => h * base + (b & 0xffL) + 1L)
      }
    }
    val texts = (0 until 120).map(i =>
      (i.toLong, genText.pureApply(Gen.Parameters.default.withSize(80), Seed(7000L + i))))
    val df = texts.toDF("doc_id", "text")
    for (base <- Seq(graft.functions.WindowHash.lane1, graft.functions.WindowHash.lane2)) {
      val got = df.select(col("doc_id"),
          graft.functions.WindowHash.windowHashes(col("text"), 7, base).as("hs"))
        .collect()
        .flatMap(r => Option(r.getSeq[Long](1)).map(s => r.getLong(0) -> s.toList)).toMap
      texts.foreach { case (id, t) =>
        if (t == null) assert(!got.contains(id), s"null text must stay null (doc $id)")
        else assert(got(id) == ref(t, 7, base).toList, s"doc $id base $base")
      }
    }
    // fused md5 base-hash kernel == the expression-composed portable
    // form (conv(substr(md5(substr(text, p, w)), 1, 8), 16, 10)) it
    // replaced — the value every portable-minhash oracle mirrors.
    // ASCII domain only (the operators feed it normalized text): the
    // expression substr slices CHARS, the kernel slices BYTES
    val ascii = df.withColumn("text",
      regexp_replace(col("text"), "[^\\x20-\\x7e]", "x"))
    val md5Got = ascii.select(col("doc_id"),
        graft.functions.WindowHash.md5WindowHashes(col("text"), 5).as("hs"))
      .collect()
      .flatMap(r => Option(r.getSeq[Long](1)).map(s => r.getLong(0) -> s.toList)).toMap
    val md5Ref = ascii.filter(length(col("text")) >= 5)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 4)).as("pos"))
      .select(col("doc_id"),
        conv(substring(md5(col("text").substr(col("pos"), lit(5))
          .cast(org.apache.spark.sql.types.BinaryType)), 1, 8), 16, 10)
          .cast(org.apache.spark.sql.types.LongType).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    md5Ref.foreach { case (id, hs) =>
      assert(md5Got(id) == hs, s"md5 kernel mismatch doc $id")
    }
    assert(md5Ref.nonEmpty)

    // fused portable-minhash signature kernel == the explode +
    // k-min-aggregate formulation (lane values feed the q26/q40/q86
    // oracles, so this parity is load-bearing)
    val sigFused = Dedup.portableMinhashLanes(df, col("text"), col("doc_id"), 5, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val sigExpl = Dedup.portableMinhashLanesExploded(df, col("text"), col("doc_id"), 5, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(sigFused == sigExpl && sigFused.nonEmpty)

    // fused pair kernel == the two single-lane kernels, zipped
    val pairs = df.select(col("doc_id"),
        graft.functions.WindowHash.windowHashPairs(col("text"), 7).as("ps"))
      .collect()
      .flatMap(r => Option(r.getSeq[org.apache.spark.sql.Row](1))
        .map(s => r.getLong(0) -> s.map(p => (p.getLong(0), p.getLong(1))).toList)).toMap
    texts.foreach { case (id, t) =>
      if (t == null) assert(!pairs.contains(id))
      else assert(pairs(id) ==
        ref(t, 7, graft.functions.WindowHash.lane1).zip(ref(t, 7, graft.functions.WindowHash.lane2)).toList)
    }
    // equality parity on the ASCII normalized domain the operators use:
    // equal windows hash equal; on this corpus, distinct windows hash
    // distinct (no collision at test scale)
    val norm = texts.collect { case (_, t) if t != null =>
      t.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim }
      .filter(_.length >= 7)
    val windows = norm.flatMap(s => s.sliding(7))
    val hashes = windows.map(w =>
      w.getBytes("UTF-8").foldLeft(0L)((h, b) => h * graft.functions.WindowHash.lane1 + (b & 0xffL) + 1L))
    assert(windows.zip(hashes).toMap.size == windows.distinct.size,
      "distinct windows must keep distinct hashes at test scale")
  }

  test("repetition signals and topTerms match a Scala reference on arbitrary text") {
    // non-null, non-empty texts: both operators are defined over the
    // split-on-space token list, mirrored here in plain Scala
    val texts = (0 until 150).map(i =>
      (i.toLong, genText.pureApply(Gen.Parameters.default.withSize(50), Seed(1000L + i))))
      .map { case (i, t) => (i, if (t == null) "" else t) }
      .filter(_._2.nonEmpty)
    val df = texts.toDF("doc_id", "text")
    def round6(d: Double): Double = math.rint(d * 1e6) / 1e6
    val expected = texts.map { case (id, t) =>
      val toks = t.split(" ", -1).toSeq
      val n = toks.size
      val counts = toks.groupBy(identity).view.mapValues(_.size)
      val bigrams = if (n >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq else Nil
      id -> ((n.toLong,
        round6(1.0 - counts.size.toDouble / n),
        if (bigrams.nonEmpty) round6(1.0 - bigrams.distinct.size.toDouble / bigrams.size) else 0.0,
        round6(counts.values.max.toDouble / n)))
    }.toMap
    val got = graft.operators.TextAnalysis.repetitionSignals(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expected)
    // topTerms vs a Scala frequency count with the same tiebreak.
    // Spark compares strings by UTF-8 BYTES; Scala's default String
    // ordering is UTF-16 code units — they disagree beyond the BMP
    // (the generator emits an astral emoji), so mirror byte order.
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    val allCounts = texts.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expTop = allCounts.sortWith { case ((t1, c1), (t2, c2)) =>
      c1 > c2 || (c1 == c2 && utf8Lt(t1, t2)) }.take(20)
    val gotTop = graft.operators.TextAnalysis.topTerms(df, col("text"), 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(gotTop == expTop)
  }

  test("SpanCut kernel equals a Scala interval-merge reference on random cuts") {
    val rnd = new scala.util.Random(11)
    val cases = (0 until 200).map { i =>
      val len = rnd.nextInt(120)
      val s = Seq.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString // ASCII contract
      val width = 1 + rnd.nextInt(10)
      val maxPos = len - width + 1
      val nCuts = if (maxPos < 1) 0 else rnd.nextInt(6)
      val poss = Seq.fill(nCuts)(1L + rnd.nextInt(maxPos)).sorted
      (i.toLong, s, width, poss)
    }
    for ((id, s, width, poss) <- cases) {
      val got = Seq((id, s, poss.toArray)).toDF("id", "s", "p")
        .select(graft.functions.SpanCut.cutSpans(col("s"), col("p"), width))
        .collect()(0).getString(0)
      // reference: delete the union of [p-1, p-1+width) char ranges
      val cut = Array.fill(s.length)(false)
      poss.foreach(p => ((p - 1).toInt until math.min(s.length, (p - 1 + width).toInt))
        .foreach(cut(_) = true))
      val expected = s.zipWithIndex.collect { case (c, i) if !cut(i) => c }.mkString
      assert(got == expected, s"case $id: s='$s' w=$width poss=$poss")
    }
  }

  test("fused repetition kernel is bit-identical to the exploded twin") {
    // tricky shapes: consecutive/leading/trailing spaces (empty
    // tokens), single token, all-identical tokens, unicode incl. an
    // astral pair, empty text, null text (dropped by both)
    val tricky = Seq(
      (1L, "a  b   a  b"), (2L, " leading"), (3L, "trailing "),
      (4L, "solo"), (5L, "x x x x x"), (6L, ""),
      (7L, "café nós café nós 😀 😀"),
      (8L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
      .select(col("doc_id"), col("text"))
    for (df <- Seq(tricky, real)) {
      val fused = graft.operators.TextAnalysis
        .repetitionSignals(df, col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      val exploded = graft.operators.TextAnalysis
        .repetitionSignalsExploded(df, col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      assert(fused == exploded && fused.nonEmpty)
    }
  }

  test("repeatedSpans portable two-phase path equals direct per-window md5") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val twoPhase = Dedup.repeatedSpans(real, col("text"), col("doc_id"),
        width = 30, minDocs = 2, portableHash = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    // direct formulation: md5-hex every window, group on the hex
    val normed = real.select(col("doc_id"),
      graft.operators.TextAnalysis.normalize(col("text")).as("norm"))
    val cnt = length(col("norm")) - lit(29)
    val direct = normed.filter(cnt >= 1)
      .select(col("doc_id"), col("norm"), explode(sequence(lit(1), cnt)).as("pos"))
      .select(col("doc_id"),
        md5(col("norm").substr(col("pos"), lit(30)).cast(BinaryType)).as("span_hash"))
      .groupBy(col("span_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
           count(lit(1)).as("n_occurrences"),
           min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(twoPhase == direct && twoPhase.nonEmpty)
  }
}
