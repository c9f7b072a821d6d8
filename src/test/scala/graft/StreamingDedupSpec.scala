package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
  private val docA2 = "the quick brown fox jumps over the lazy dog and runs far away into the wood" // near-dup
  private val docB = "completely different content about spark streaming stateful processing engines"
  private val docC = "yet another unrelated document on astronomical catalog cross matching"

  test("row-local signature matches the batch minhashSignatures formula bit-for-bit") {
    val df = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val batch = Dedup.minhashSignatures(df, col("text"), col("doc_id"), shingleSize = 5, k = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val s1 = StreamingDedup.signature(docA, 5, 32)
    val s2 = StreamingDedup.signature(docB, 5, 32)
    assert(s1.toSeq == batch(1L))
    assert(s2.toSeq == batch(2L))
    // degenerate text -> no shingles -> null (batch drops the doc)
    assert(StreamingDedup.signature("ab", 5, 32) == null)
  }

  test("maxPerBucket <= 0 means unbounded (the batch capBuckets convention), never disabled") {
    // takeRight(0) would silently empty the representative list after
    // every doc — zero hits forever, mistaken for a clean corpus
    val docs = Seq((1L, docA), (2L, docA)).toDF("doc_id", "text")
    val hits = StreamingDedup.nearDupHits(docs, "doc_id", "text",
        threshold = 0.5, maxPerBucket = 0)
      .toDF().distinct().collect()
    assert(hits.length == 1 && hits.head.getLong(0) == 2L && hits.head.getLong(1) == 1L,
      s"identical pair must be flagged under an unbounded cap, got ${hits.toSeq}")
  }

  test("against-index geometry mismatch fails loudly (same-k split and portable-family)") {
    val d = Seq((1L, docA), (2L, docA2)).toDF("doc_id", "text")
    // portable index: string md5 band keys — the long=string join would
    // coerce and silently match nothing
    val idxPortable = Dedup.minhashBandIndex(d, col("text"), col("doc_id"), portableHash = true)
    val e1 = intercept[IllegalArgumentException](
      StreamingDedup.nearDupHitsAgainstIndex(d, "doc_id", "text", idxPortable))
    assert(e1.getMessage.contains("geometry mismatch"))
    // same-k bands/rowsPerBand split: invisible to a signature-LENGTH probe
    val idx48 = Dedup.minhashBandIndex(d, col("text"), col("doc_id"),
      bands = 4, rowsPerBand = 8)
    val e2 = intercept[IllegalArgumentException](
      StreamingDedup.nearDupHitsAgainstIndex(d, "doc_id", "text", idx48))
    assert(e2.getMessage.contains("geometry mismatch"))
    // matching geometry still flags the near-dup pair
    val idx = Dedup.minhashBandIndex(d, col("text"), col("doc_id"))
    val hits = StreamingDedup.nearDupHitsAgainstIndex(d, "doc_id", "text", idx,
        threshold = 0.5)
      .filter(col("doc_id") =!= col("dup_of")).distinct().collect()
    assert(hits.nonEmpty, "matching geometry must still produce the near-dup hit")
  }

  test("streaming near-dup flags arrivals against earlier representatives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.nearDupHits(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
    val q = hits.toDF.writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    try {
      input.addData((1L, docA), (2L, docB)) // originals become representatives
      q.processAllAvailable()
      assert(spark.table("neardup_test").count() == 0) // nothing to collide with
      input.addData((10L, docA2), (11L, docC)) // near-dup of 1 + a fresh doc
      q.processAllAvailable()
      val rows = spark.table("neardup_test")
        .select("doc_id", "dup_of", "est_jaccard").distinct().collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getLong(0) == 10L && r.getLong(1) == 1L))
      assert(rows.forall(_.getDouble(2) >= 0.5))
      input.addData((20L, docC)) // exact copy of 11's text -> full agreement
      q.processAllAvailable()
      val c = spark.table("neardup_test").filter(col("doc_id") === 20L)
        .select("dup_of", "est_jaccard").distinct().collect()
      assert(c.map(_.getLong(0)).toSet == Set(11L))
      assert(c.forall(_.getDouble(1) == 1.0))
    } finally q.stop()
  }

  test("stream decisions agree with the batch minhashLsh candidates") {
    // run the same corpus through both; every streamed hit pair must be
    // a batch candidate pair at the same estimated jaccard
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, docA), (2L, docB), (3L, docC), (10L, docA2))
    val batchPairs = Dedup.minhashLsh(corpus.toDF("doc_id", "text"),
      col("text"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.nearDupHits(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
    val q = hits.toDF.writeStream.format("memory").queryName("neardup_parity")
      .outputMode("append").start()
    try {
      corpus.foreach { d => input.addData(d); q.processAllAvailable() }
      val streamed = spark.table("neardup_parity")
        .select("doc_id", "dup_of", "est_jaccard").distinct().collect()
      assert(streamed.nonEmpty)
      streamed.foreach { r =>
        val pair = (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))
        assert(batchPairs.contains(pair), s"stream-only pair $pair")
        assert(math.abs(batchPairs(pair) - r.getDouble(2)) < 1e-9)
      }
    } finally q.stop()
  }

  test("recall under FIFO eviction: measured on a flooded bucket, monotone in the cap") {
    // the production default (maxPerBucket = 64) has a recall story
    // only if we can measure what eviction costs when a hot bucket
    // floods.  Synthetic drive of the shared kernel: G families of
    // IDENTICAL signatures (pairwise-disjoint across families, so a
    // doc is flagged iff a family sibling is a live representative —
    // no transitive chains), ALL colliding in one band bucket.  The
    // kernel walks a bucket in doc_id order, so ids ARE arrival order.
    val G = 32 // families flooding one bucket
    val m = 4  // members per family
    val k = 8
    def famSig(f: Int): Array[Long] = Array.tabulate(k)(lane => f.toLong * 1000 + lane)
    def flagged(rows: Seq[(Long, Array[Long], Long)], cap: Int): Set[Long] =
      StreamingDedup.nearDupHitsCore(rows.toDS(), k, threshold = 0.7,
        maxPerBucket = cap, stateTtl = None).collect().map(_.doc_id).toSet
    def recallCurve(rows: Seq[(Long, Array[Long], Long)], caps: Seq[Int]): Seq[(Int, Double)] = {
      val unbounded = flagged(rows, 0)
      assert(unbounded.size == G * (m - 1),
        "unbounded: every non-leader family member must be flagged")
      val curve = caps.map { cap =>
        val got = flagged(rows, cap)
        assert(got.subsetOf(unbounded),
          s"cap=$cap: identical-signature families admit no false flags vs unbounded")
        cap -> got.size.toDouble / unbounded.size
      }
      assert(curve.map(_._2) == curve.map(_._2).sorted.reverse,
        s"recall must be monotone in the cap: $curve")
      curve
    }
    // ADVERSARIAL arrival — families interleaved member-major, so
    // every family's rep sees G-1 foreign arrivals between its
    // members: FIFO evicts it whenever cap < G.  The cliff is sharp
    // and total: cap >= G keeps recall 1.0, cap < G loses EVERYTHING
    // (each member re-seeds and is itself evicted before its next
    // sibling).  This is why maxPerBucket is documented as a recall
    // bound sized to per-bucket family pressure, not a shrink-to-fit
    // tuning knob.
    val interleaved = for (member <- 0 until m; f <- 0 until G)
      yield (member.toLong * G + f, famSig(f), 0L)
    assert(recallCurve(interleaved, Seq(64, 32, 16, 4)) ==
      Seq(64 -> 1.0, 32 -> 1.0, 16 -> 0.0, 4 -> 0.0))
    // RANDOM arrival (seeded): the realistic flood.  Recall decays
    // smoothly as the cap shrinks below the family pressure; exact
    // values pinned (deterministic kernel + seed).
    val perm = new scala.util.Random(7).shuffle((0 until G * m).toList)
    val random = for (member <- 0 until m; f <- 0 until G)
      yield (perm(member * G + f).toLong, famSig(f), 0L)
    val curve = recallCurve(random, Seq(64, 16, 8, 4, 1))
    info(s"measured random-arrival recalls on the flooded bucket: $curve")
    // pinned measurements (96 flaggable docs): cap at the family
    // pressure keeps recall 1.0; halving it costs half; the decay
    // below is roughly cap/G — the sizing rule the scaladoc and
    // BASELINE.md document
    assert(curve.map { case (c, r) => c -> math.round(r * 96).toInt } ==
      Seq(64 -> 96, 16 -> 48, 8 -> 19, 4 -> 11, 1 -> 2))
  }

  test("production cap 64 loses nothing on the sf0.1 corpus (recall 1.0 vs unbounded twin)") {
    // the real-corpus arm of the eviction story: bucket populations on
    // the sf0.1 documents table never cross the production default, so
    // the capped stream flags EXACTLY the docs the unbounded twin does
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    def flaggedDocs(cap: Int): Set[Long] =
      StreamingDedup.nearDupHits(docs, "doc_id", "text", maxPerBucket = cap)
        .collect().map(_.doc_id).toSet
    val unbounded = flaggedDocs(0)
    assert(unbounded.nonEmpty, "the sf0.1 corpus ships with near-duplicates")
    assert(flaggedDocs(64) == unbounded,
      "cap 64 must flag exactly the unbounded twin's docs on sf0.1")
  }

  test("sf0.1 corpus over 3 micro-batches: state rows stay inside the representative bound") {
    // the 100 TB posture of streaming dedup rests on the state store
    // holding band-bucket representative lists, NOT the corpus: flagged
    // duplicates are never added as representatives, so state grows
    // with bands x (non-duplicate docs) at worst.  Pin that bound with
    // the real sf0.1 corpus fed as >= 3 rate-limited micro-batches,
    // reading numRowsTotal from each batch's StateOperatorProgress.
    implicit val sqlCtx = spark.sqlContext
    val bands = 8
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val chunks = docs.grouped((docs.length + 2) / 3).toSeq
    assert(chunks.size == 3)
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.nearDupHits(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text")
    val q = hits.toDF.writeStream.format("memory").queryName("neardup_sf01_state")
      .outputMode("append").start()
    try {
      val stateRowsPerBatch = chunks.map { c =>
        input.addData(c.toSeq: _*)
        q.processAllAvailable()
        // recentProgress, not lastProgress: the final entry can be a
        // no-data batch; numRowsTotal is monotone here (no TTL), so
        // the max over observed progresses is the current state size
        q.recentProgress.iterator
          .filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators(0).numRowsTotal).max
      }
      assert(stateRowsPerBatch.size == 3 && stateRowsPerBatch.last > 0)
      val flagged = spark.table("neardup_sf01_state").select("doc_id").distinct().count()
      assert(flagged > 0, "the sf0.1 corpus ships with near-duplicates; none flagged")
      val withSig = docs.count { case (_, t) => StreamingDedup.signature(t, 5, 32) != null }
      val reps = withSig - flagged
      // every state row is one band bucket holding >= 1 representative;
      // only unflagged docs ever become representatives
      assert(stateRowsPerBatch.last <= bands.toLong * reps,
        s"state rows ${stateRowsPerBatch.last} exceed bands x reps = ${bands.toLong * reps} " +
          s"(withSig=$withSig flagged=$flagged) — duplicates are leaking into state")
      // and per batch the bound held too (monotone growth, never a dump
      // of the whole batch into one bucket list)
      assert(stateRowsPerBatch == stateRowsPerBatch.sorted,
        s"state rows shrank without a TTL: $stateRowsPerBatch")
    } finally q.stop()
  }
}

class StreamingTextSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("clean-ingest stream: quality gate, lang filter, PII scrub, watermark dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, Long, String)]
    val out = graft.streaming.StreamingText.cleanIngest(
      input.toDF.toDF("ts", "doc_id", "text"),
      ts = "ts", watermark = "10 minutes", minTokens = 5, langs = Seq("en"))
    val q = out.writeStream.format("memory").queryName("clean_ingest")
      .outputMode("append").start()
    try {
      input.addData(
        (ts(1), 1L, "the quick brown fox and the lazy dog wrote to fox@mail.example.org"),
        (ts(2), 2L, "too short"),                                     // quality gate
        (ts(3), 3L, "el rapido zorro marron y el perro la los el"),   // not en
        (ts(4), 4L, "the quick brown fox and the lazy dog wrote to fox@mail.example.org"), // dup of 1
        (ts(5), 5L, "the second clean document and the readable text of it"))
      q.processAllAvailable()
      val rows = spark.table("clean_ingest").collect()
      val ids = rows.map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(ids == Seq(1L, 5L), s"got $ids")
      val t1 = rows.find(_.getAs[Long]("doc_id") == 1L).get.getAs[String]("text")
      assert(t1.contains("<EMAIL>") && !t1.contains("@"))
      assert(rows.forall(_.getAs[String]("lang_pred") == "en"))
    } finally q.stop()
  }
}

class StreamingIndexDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
  private val docA2 = "the quick brown fox jumps over the lazy dog and runs far away into the wood"
  private val docB = "completely different content about spark streaming stateful processing engines"
  private val docC = "yet another unrelated document on astronomical catalog cross matching"

  test("stream-vs-index hits match the batch against-index backfill") {
    implicit val sqlCtx = spark.sqlContext
    val history = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val index = Dedup.minhashBandIndex(history, col("text"), col("doc_id"))
      .cache() // static side of the stream-static join
    val batchDocs = Seq((10L, docA2), (11L, docC), (12L, "fresh unseen totally novel writing"))
    // batch backfill ground truth at the same threshold
    val backfill = Dedup.minhashLshAgainstIndex(
        batchDocs.toDF("doc_id", "text"), col("text"), col("doc_id"), index)
      .filter(col("est_jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.nearDupHitsAgainstIndex(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", index, threshold = 0.5)
    val q = hits.writeStream.format("memory").queryName("index_dedup_test")
      .outputMode("append").start()
    try {
      input.addData(batchDocs: _*)
      q.processAllAvailable()
      val streamed = spark.table("index_dedup_test").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == backfill, "stream hits must equal the batch backfill")
      assert(streamed.exists { case (d, o, _) => d == 10L && o == 1L },
        "near-dup of an indexed doc must be flagged")
      assert(streamed.exists { case (d, o, j) => d == 11L && o == 3L && j == 1.0 },
        "exact copy must match at est_jaccard 1.0")
      assert(!streamed.exists(_._1 == 12L), "novel doc must pass")
    } finally q.stop()
  }
}
