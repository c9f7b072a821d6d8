package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): choose pretraining documents that LOOK LIKE a
  * target domain by importance weighting in a hashed n-gram feature
  * space.  Fit a bucketed unigram+bigram distribution over the target
  * corpus (p) and the raw corpus (q); a document with bucket counts
  * c_b gets importance log-weight Σ_b c_b·(ln p_b − ln q_b); keep the
  * resampled top slice.  This is the quality/domain-selection tier a
  * 100 TB pipeline runs between dedup and tokenization.
  *
  * Scale shape: features are a scan-stage explode (tokens + adjacent
  * bigrams — no shuffle until the bucket aggregate); both bucket
  * distributions are ONE map-side-combined aggregate bounded by
  * `buckets` rows (driver-free — they rejoin as broadcast frames, the
  * kmeansFit-centroid size class); scoring is one broadcast join +
  * per-doc sum; resampling is a deterministic Gumbel top-k
  * ([[graft.plans.TopK]] bounds rows below the shuffle).  Nothing
  * anywhere is proportional to the corpus on the driver.
  *
  * Portability: buckets come from the md5-derived 32-bit token hash
  * (the [[graft.functions.WindowHash.md5WindowHashes]] convention —
  * `('0x' || substr(md5(tok), 1, 8))::BIGINT % buckets` in SQL), and
  * the Gumbel uniform is md5-derived too, so the whole pipeline
  * mirrors in a SQL oracle with no RNG anywhere. */
object Dsir {

  /** Hashed unigram+bigram bucket counts per document:
    * (doc_id, bucket, c).  Documents whose normalized text has no
    * token produce no rows. */
  def hashedNgramCounts(df: DataFrame, id: Column, text: Column,
                        buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = df.select(id.as("doc_id"),
        split(TextAnalysis.normalize(text), " ").as("ts"))
      .select(col("doc_id"), filter(col("ts"), t => length(t) > 0).as("ts"))
      .filter(size(col("ts")) > 0)
    // unigrams ++ adjacent bigrams ("a b"), hashed to buckets with the
    // portable md5 32-bit prefix
    val grams = toks.select(col("doc_id"),
      explode(concat(col("ts"),
        when(size(col("ts")) > 1,
          zip_with(slice(col("ts"), lit(1), size(col("ts")) - 1),
            slice(col("ts"), lit(2), size(col("ts")) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array()))).as("g"))
    grams
      .select(col("doc_id"),
        // fused md5-prefix kernel (r22) — value-identical to the
        // conv(substring(md5(...), 1, 8), 16, 10) form the oracle
        // mirrors, without the per-gram hex-string round-trip
        (graft.functions.WindowHash.md5Prefix(col("g"), 8)
          % buckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Add-one-smoothed bucket distribution of a corpus:
    * (bucket, ln_p) for ALL `buckets` ids — ln((cnt_b + 1) /
    * (total + buckets)); buckets unseen in the corpus carry the
    * smoothing floor, so every lookup is defined. */
  def bucketLogDist(features: DataFrame, buckets: Int): DataFrame = {
    val spark = features.sparkSession
    val counts = features.groupBy(col("bucket")).agg(sum(col("c")).as("n"))
    val grid = spark.range(buckets).select(col("id").as("bucket"))
    // grand total as a broadcast one-row frame (the q83 mix-weights
    // shape) — an unpartitioned window would serialize the frame
    // through a single task and trips the global-window audit
    val total = features.agg(coalesce(sum(col("c")), lit(0L)).cast(DoubleType).as("total"))
    grid.join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("bucket"),
        log((col("n") + lit(1.0)) / (col("total") + lit(buckets.toDouble))).as("ln_p"))
  }

  /** Add-one-smoothed bucket log-distribution as a DRIVER array —
    * the same arithmetic as [[bucketLogDist]] (sum the per-bucket
    * counts exactly in integers, then ln((c+1)/(total+buckets)) in
    * doubles), materialized eagerly.  The array is bounded by
    * `buckets` (≤ 4096 by the callers' contract — the kmeansFit-
    * centroid size class), so this is a driver-safe collect at any
    * corpus size, and it CUTS the feature source's lineage: consumers
    * of the distribution no longer re-tokenize the corpus. */
  private def bucketLogDistArray(features: DataFrame, buckets: Int): Array[Double] = {
    val n = new Array[Long](buckets)
    features.groupBy(col("bucket")).agg(sum(col("c")).as("n")).collect()
      .foreach(r => n(r.getAs[Number]("bucket").intValue()) = r.getAs[Long]("n"))
    val total = n.sum.toDouble
    n.map(c => math.log((c + 1.0) / (total + buckets)))
  }

  /** Importance log-weight per corpus document against a target
    * corpus: Σ_b c_b·(ln p_b − ln q_b), rounded to 6 decimals.
    * Documents with no token score 0 (no evidence either way).
    *
    * Execution shape: the p and q distributions are two EAGER bounded
    * aggregates (one target tokenization pass, one corpus tokenization
    * pass) whose ≤`buckets`-row results come to the driver and return
    * as ONE broadcast ratio frame — so the final lazy plan tokenizes
    * the corpus exactly once more for the per-doc scoring join.  The
    * previous all-lazy formulation wove both distributions' lineage
    * (including each one's recomputed grand total) into the scoring
    * plan: 12 parquet scans / 6 corpus tokenizations in the executed
    * plan, with no exchange reuse.  Two passes over the corpus is the
    * 100 TB-correct shape — caching the feature table would spill a
    * token-table-sized intermediate instead.
    *
    * NOTE: this method EXECUTES two Spark jobs eagerly (the p and q
    * distribution aggregates) before returning the lazy scoring frame;
    * it is not a pure plan constructor.  The driver footprint is two
    * `buckets`-length double arrays, so `buckets` is hard-capped at
    * 2^16 — far beyond the 4096 the DSIR paper's hashed-n-gram setup
    * uses, and small enough (512 KiB each) to be driver-safe.
    *
    * @return (doc_id, logw) */
  def scores(corpus: DataFrame, id: Column, text: Column,
             target: DataFrame, targetText: Column,
             buckets: Int = 4096): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 16),
      s"buckets in [1, 2^16] (driver holds two buckets-length arrays), got $buckets")
    val spark = corpus.sparkSession
    val cf = hashedNgramCounts(corpus, id, text, buckets)
    // the p and q distribution aggregates are independent read-only
    // jobs — submit them CONCURRENTLY (Spark schedules jobs from
    // separate threads fine) so the eager phase costs one round trip
    // of scheduling latency, not two; sequential job count is what a
    // loaded driver machine amplifies (BASELINE.md round-8/11 notes)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // both jobs run under one job group so a failure in either Await
    // cancels the surviving sibling instead of leaving it running
    // orphaned on the executors until natural completion
    val group = s"graft-dsir-${java.util.UUID.randomUUID()}"
    def inGroup[T](body: => T): T = {
      spark.sparkContext.setJobGroup(group, "DSIR distribution aggregate", interruptOnCancel = true)
      try body finally spark.sparkContext.clearJobGroup()
    }
    val lpF = Future(inGroup(bucketLogDistArray(
      hashedNgramCounts(target, monotonically_increasing_id(), targetText, buckets), buckets)))
    val lqF = Future(inGroup(bucketLogDistArray(cf, buckets)))
    val (lp, lq) =
      try (Await.result(lpF, Duration.Inf), Await.result(lqF, Duration.Inf))
      catch {
        case e: Throwable => spark.sparkContext.cancelJobGroup(group); throw e
      }
    val ratios = spark.createDataFrame(
      (0 until buckets).map(b => (b.toLong, lp(b) - lq(b))))
      .toDF("bucket", "ldiff")
    val scored = cf.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("c") * col("ldiff")), 6).as("logw"))
    corpus.select(id.as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("logw"), lit(0.0)).as("logw"))
  }

  /** DSIR scores for the common in-pipeline case where the target IS a
    * predicate-selected slice of the corpus itself ("upweight docs
    * that look like the high-quality subset").  Then BOTH
    * distributions come out of ONE tokenization pass: the per-doc
    * bucket counts carry the target flag, and a single eager aggregate
    * yields per-bucket (corpus count, target count) — so the eager
    * phase is one job over one scan where [[scores]] needs two (its
    * target pass re-scans the corpus through the filter), and the
    * total corpus tokenizations drop 3 → 2.  Same arithmetic, same
    * results: parity with `scores(corpus, …, corpus.filter(pred), …)`
    * is spec-pinned.
    *
    * @return (doc_id, logw), logw rounded to 6 decimals */
  def scoresForSlice(corpus: DataFrame, id: Column, text: Column,
                     targetPred: Column, buckets: Int = 4096): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 16),
      s"buckets in [1, 2^16] (driver holds two buckets-length arrays), got $buckets")
    val spark = corpus.sparkSession
    val toks = corpus.select(id.as("doc_id"),
        targetPred.cast(org.apache.spark.sql.types.BooleanType).as("_t"),
        split(TextAnalysis.normalize(text), " ").as("ts"))
      .select(col("doc_id"), col("_t"), filter(col("ts"), t => length(t) > 0).as("ts"))
      .filter(size(col("ts")) > 0)
    val grams = toks.select(col("doc_id"), col("_t"),
      explode(concat(col("ts"),
        when(size(col("ts")) > 1,
          zip_with(slice(col("ts"), lit(1), size(col("ts")) - 1),
            slice(col("ts"), lit(2), size(col("ts")) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array()))).as("g"))
    // persisted: BOTH references (the driver ratio aggregate and the
    // per-doc scoring join) read this frame, and it is the COMPACT
    // side — ≤ docs × buckets rows vs the gram stream it condenses —
    // so caching it halves the heavy tokenize+explode+hash pass
    // instead of re-running it per reference.  All inputs are
    // deterministic (md5 buckets), so plan reuse is value-safe.
    // LIFECYCLE: the cache must outlive the returned (lazy) frame, so
    // it cannot be unpersisted here; the harness entry points (Bench
    // cleanBlocks, Verify's per-query clear) free it after the
    // consuming action, and a long-lived library session should
    // `spark.catalog.clearCache()` likewise once scores are consumed.
    val flagged = grams
      .select(col("doc_id"), col("_t"),
        // fused md5-prefix kernel (r22) — see scores(); same value
        (graft.functions.WindowHash.md5Prefix(col("g"), 8)
          % buckets).as("bucket"))
      .groupBy(col("doc_id"), col("_t"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // ONE eager aggregate: per-bucket corpus total AND target total
    val np = new Array[Long](buckets); val nq = new Array[Long](buckets)
    flagged.groupBy(col("bucket"))
      .agg(sum(col("c")).as("n_all"),
        sum(when(col("_t"), col("c")).otherwise(lit(0L))).as("n_tgt"))
      .collect().foreach { r =>
        val b = r.getAs[Number]("bucket").intValue()
        nq(b) = r.getAs[Long]("n_all"); np(b) = r.getAs[Long]("n_tgt")
      }
    val (tp, tq) = (np.sum.toDouble, nq.sum.toDouble)
    val ratios = spark.createDataFrame(
      (0 until buckets).map { b =>
        (b.toLong, math.log((np(b) + 1.0) / (tp + buckets)) -
          math.log((nq(b) + 1.0) / (tq + buckets)))
      }).toDF("bucket", "ldiff")
    val scored = flagged.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("c") * col("ldiff")), 6).as("logw"))
    corpus.select(id.as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("logw"), lit(0.0)).as("logw"))
  }

  /** Gumbel-top-k importance resampling (the paper's sampler, made
    * deterministic): key = logw + Gumbel(md5-uniform of the id), keep
    * the `keep` largest keys.  Sampling WITH the noise (rather than a
    * plain top-k on logw) preserves diversity — low-weight docs still
    * win occasionally, with probability ∝ exp(logw).  No RNG: the
    * uniform is the id's md5 32-bit prefix scaled into (0, 1).
    *
    * @return the kept corpus rows */
  def resample(corpus: DataFrame, id: Column, text: Column,
               target: DataFrame, targetText: Column,
               keep: Int, buckets: Int = 4096): DataFrame = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val s = scores(corpus, id, text, target, targetText, buckets)
    val u = (graft.functions.WindowHash.md5Prefix(col("doc_id").cast("string"), 8)
      .cast(DoubleType) + lit(0.5)) / lit(4294967296.0)
    val keyed = s.withColumn("gumbel_key",
      col("logw") - log(-log(u)))
    // GLOBAL top-keep, so delegate to Spark's own sort+limit regime
    // handling (TakeOrderedAndProject below topKSortFallbackThreshold,
    // spillable sort + limit above it).  TopKPerKey under one constant
    // key is the operator's documented anti-regime: it buffers 2·keep
    // rows per task heap with NO spill, and `keep` here is routinely a
    // fixed fraction of the corpus — executor OOM exactly at scale.
    val top = keyed.orderBy(col("gumbel_key").desc, col("doc_id").asc)
      .limit(keep)
      .select(col("doc_id").as("keep_id"))
    // NO broadcast hint: `keep` is routinely a fixed fraction of the
    // corpus, so forcing broadcast would collect every keep_id on the
    // driver — a scale cliff.  AQE broadcasts the id frame on its own
    // whenever it actually fits the threshold.
    corpus.join(top, id === col("keep_id"), "left_semi")
  }
}
