package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training pipelines: documents ordered by a
  * key are conceptually concatenated and sliced into fixed
  * `budget`-token sequences; each document is assigned the sequence
  * (bin) its first token lands in — the "concatenate and chunk"
  * packing used to build fixed-length training batches.
  *
  * The naive formulation is a GLOBAL running sum
  * (`sum(w) over (order by key)`), which Spark executes on a single
  * partition — the classic scale cliff (WindowExec warns about it).
  * This operator computes the same prefix sum distributed:
  *
  *  1. one row of min/max bounds of the numeric order key (tiny agg);
  *  2. rows bucket by contiguous key range; per-bucket totals are a
  *     map-side-combined aggregate of ≤ `buckets` rows, whose exclusive
  *     prefix offsets are folded on the driver (≤ `buckets` values) and
  *     broadcast-joined back;
  *  3. the running sum is a window WITHIN each bucket only — every
  *     partition works, nothing global.
  *
  * Deterministic (buckets derive from key values, not physical
  * partitions) and exactly equal to the single-window formulation for
  * a unique numeric order key (spec-pinned).
  */
object Packing {

  /** Adds `bin_id` = floor(exclusive-prefix-sum(weight) / budget) under
    * `order` (a numeric, unique key), plus the row's weight as
    * `pack_weight`.  Null weights count as 0.
    *
    * `buckets = 0` (default) derives the bucket count as
    * `max(64, input partitions)`: each bucket's running sum is ONE
    * window partition = one task, so a fixed 64 caps the sort
    * parallelism at 1/64th of the data per task at scale (the r4
    * review's hazard #3).  Results are bucket-count-invariant
    * (spec-pinned), so the knob only moves parallelism, never values. */
  /** Fail loudly on a non-integral order key: a fractional (or string)
    * key silently truncates under the long cast, merging distinct keys
    * into equal `pack_key`s — and the RANGE window frame then gives
    * tied rows identical running sums, so bins are undefined exactly
    * where the contract ("a numeric, unique key") was violated.  Same
    * discipline as kmeansFit/pqSetup's id columns. */
  private def requireIntegralOrder(df: DataFrame, order: Column, who: String): Unit = {
    val dt = df.select(order).schema.head.dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok, s"$who: order key must be an integral type, got $dt — " +
      "a fractional/string key truncates under the long cast and merges " +
      "distinct keys; rank or hash the key to a long first")
  }

  def sequentialBins(df: DataFrame, order: Column, weight: Column, budget: Long,
                     buckets: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    requireIntegralOrder(df, order, "sequentialBins")
    import org.apache.spark.storage.StorageLevel
    val spark = df.sparkSession
    // scale signal WITHOUT executing the plan: `df.rdd.getNumPartitions`
    // compiled and ran the upstream's AQE shuffle stages just to read a
    // partition count (a whole extra pass over a corpus-sized input in
    // the q66 pipeline); the session's shuffle parallelism is the same
    // order of magnitude and free.  Results are bucket-count-invariant
    // (spec-pinned), so this only moves parallelism.
    val nBuckets = if (buckets > 0) buckets
      else math.max(64, spark.sessionState.conf.numShufflePartitions)
    val keyed = df.withColumn("pack_key", order.cast(LongType))
      .withColumn("pack_weight", coalesce(weight.cast(LongType), lit(0L)))
    // the two bootstrap queries (bounds, bucket totals) share ONE
    // materialization of just (pack_key, pack_weight) — 16 bytes/row,
    // column-pruned all the way into the upstream scan — so an
    // expensive upstream (q66: gate → scrub → dedup-shuffle →
    // chunk-explode) computes once for both instead of once each
    // (pre-r12 it ran a THIRD time for `df.rdd.getNumPartitions`).
    // Unpersisted at return: the lazy result recomputes the upstream
    // once more at action time with its full columns — 2 upstream
    // passes total, and never a text-width cache.
    val boot = keyed.select(col("pack_key"), col("pack_weight"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val bounds = boot.agg(min(col("pack_key")), max(col("pack_key")),
        sum(when(col("pack_key").isNull, 1L).otherwise(0L)),
        count(col("pack_key")), count_distinct(col("pack_key"))).head()
      // null-key check FIRST: an ALL-null key column also has a null
      // min, and the empty-input early return below would silently
      // swallow the whole dataset instead of raising
      val nullKeys = if (bounds.isNullAt(2)) 0L else bounds.getLong(2)
      require(nullKeys == 0L,
        "sequentialBins: order key contains nulls — packing order is undefined; " +
          "filter or impute the key column first")
      if (bounds.isNullAt(0)) // genuinely empty input
        return keyed.drop("pack_key").withColumn("bin_id", lit(0L)).limit(0)
      // DUPLICATE keys merge distinct rows in the RANGE-frame running
      // sum (tied keys share one prefix) and silently shift every later
      // bin — the same corruption class the null/fractional checks
      // reject, so reject it with the same loudness (the counts ride
      // the bounds aggregate on the cached 16-byte frame: free)
      require(bounds.getLong(3) == bounds.getLong(4),
        s"sequentialBins: order key has ${bounds.getLong(3) - bounds.getLong(4)} duplicate " +
          "values — packing order must be a total order; derive a unique key first")
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      // EXACT span arithmetic: the documented remedy for non-integral
      // keys is hashing to a long, which uses the FULL 2^64 range —
      // `hi - lo` in long wraps there, making buckets non-monotone and
      // bin ids silently wrong (inverted vs sequentialBinsGlobal).
      // BigInt on the driver, DECIMAL(38,0) on the executors: exact
      // for any long span, not merely monotone like the double path.
      val span = BigInt(hi) - BigInt(lo)
      val width = (span / nBuckets + (if (span % nBuckets == 0) BigInt(0) else BigInt(1)))
        .max(BigInt(1))
      val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
      def asBucket(c: Column): Column =
        floor((c.cast(dec) - lit(new java.math.BigDecimal(lo))) /
          lit(new java.math.BigDecimal(width.bigInteger))).cast(LongType)
      // per-bucket totals -> exclusive prefix offsets, folded on the
      // driver (≤ buckets rows) and broadcast back as a tiny dim join
      val totals = boot.groupBy(asBucket(col("pack_key")).as("pack_bucket"))
        .agg(sum(col("pack_weight")).as("bucket_total"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val offsets = totals.scanLeft((Long.MinValue, 0L)) {
        case ((_, acc), (b, t)) => (b, acc + t)
      }.sliding(2).map { case Array((_, prev), (b, _)) => (b, prev) }.toSeq
      import spark.implicits._
      val offsetDf = offsets.toDF("pack_bucket", "bucket_offset")
      val w = Window.partitionBy(col("pack_bucket")).orderBy(col("pack_key"))
      keyed.withColumn("pack_bucket", asBucket(col("pack_key")))
        .join(broadcast(offsetDf), Seq("pack_bucket"))
        .withColumn("bin_id",
          floor((col("bucket_offset")
            + sum(col("pack_weight")).over(w) - col("pack_weight")) / lit(budget)))
        .drop("pack_bucket", "bucket_offset", "pack_key")
    } finally boot.unpersist(blocking = false)
  }

  /** The single-partition global-window formulation — the semantic
    * definition the distributed version is spec-verified against. */
  private[graft] def sequentialBinsGlobal(df: DataFrame, order: Column, weight: Column,
                                          budget: Long): DataFrame = {
    requireIntegralOrder(df, order, "sequentialBinsGlobal")
    val w = Window.orderBy(order.cast(LongType))
    df.withColumn("pack_weight", coalesce(weight.cast(LongType), lit(0L)))
      .withColumn("bin_id",
        floor((coalesce(sum(col("pack_weight")).over(w), lit(0L)) - col("pack_weight"))
          / lit(budget)))
  }

  /** Per-bin packing summary: how many docs and tokens landed in each
    * fixed-budget training sequence. */
  def packSummary(df: DataFrame, order: Column, weight: Column, budget: Long): DataFrame =
    sequentialBins(df, order, weight, budget)
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("pack_weight")).as("sum_tokens"),
           min(order).as("first_doc"),
           max(order).as("last_doc"))
}
