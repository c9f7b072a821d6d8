package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exact quantiles at scale via distributed sort + rank selection.
  *
  * Spark's exact `percentile` aggregate buffers a (value → count) map
  * per partition and merges ALL of them into one final buffer — memory
  * proportional to the number of DISTINCT values in a single task.  On
  * a mostly-distinct double column at 100 TB that buffer IS the
  * dataset; the aggregate is a scale cliff (and the single merge
  * dominates wall time long before it OOMs).
  *
  * This operator uses the classic alternative: range-shuffle sort the
  * column, then select the O(|ps|) global ranks each percentile needs
  * and interpolate.  Two jobs run over the same sorted RDD — the sort
  * SHUFFLE is computed once and reused by the second job (stage
  * skipping), so the column is shuffled exactly once; per-task memory
  * is one partition of plain doubles, never a value map.
  *
  * Interpolation mirrors Spark's `Percentile.getPercentile`
  * weighted-average arithmetic so results are bit-for-bit the
  * built-in aggregate's (spec-pinned).  Nulls and NaNs are excluded
  * exactly like the aggregate excludes them.
  */
object Quantiles {

  /** Exact percentiles of `c` at `ps` (each in [0, 1]); NaN for an
    * empty/all-null input. Driver-side result — the percentile values
    * themselves are O(|ps|) scalars, like guessBins' axis fold.
    *
    * INTEGRAL columns take a value-histogram path: one map-side-combined
    * `groupBy(v).count()` whose output is bounded by the value DOMAIN
    * (doc lengths, token counts — thousands of distinct values at any
    * corpus size), folded to ranks on the driver.  One Spark job, no
    * sort shuffle, no persisted intermediate.  A distinct-count probe
    * (limit-collect, like the BPE vocab probe) guards the bound: an
    * integral column with > 2^20 distinct values falls through to the
    * sort path below. */
  def exact(df: DataFrame, c: Column, ps: Seq[Double]): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must lie in [0,1], got $ps")
    val vals = df.select(c.cast(DoubleType).as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
    val integral = df.select(c).schema.head.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (integral) {
      val maxDistinct = 1 << 20
      val hist = vals.groupBy(col("v")).agg(count(lit(1)).as("n"))
        .limit(maxDistinct + 1).collect()
      if (hist.length <= maxDistinct) {
        val byValue = hist.map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
        val n = byValue.iterator.map(_._2).sum
        if (n == 0) return ps.map(_ => Double.NaN)
        val cum = byValue.map(_._2).scanLeft(0L)(_ + _).tail // cum(i) = rows <= byValue(i)
        def valueAt(rank: Long): Double = { // smallest value with cum > rank
          var lo = 0; var hi = byValue.length - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cum(mid) > rank) hi = mid else lo = mid + 1
          }
          byValue(lo)._1
        }
        return ps.map { p =>
          val pos = p * (n - 1)
          val lo = math.floor(pos).toLong
          val hi = math.ceil(pos).toLong
          // identical Percentile.getPercentile arithmetic as the sort path
          if (lo == hi) valueAt(lo)
          else (hi - pos) * valueAt(lo) + (pos - lo) * valueAt(hi)
        }
      }
      // over the distinct bound: fall through to the rank-selection sort
    }
    val sorted = vals.sort("v").select("v").rdd.map(_.getDouble(0))
    // MEMORY_AND_DISK_SER, not MEMORY_ONLY: this is a two-pass scan over
    // a shuffle output — an evicted partition would recompute the whole
    // sort, and at scale the cache competes with the sort for memory.
    // Serialized spill keeps both passes cheap.  Scoped: unpersisted
    // below, never escapes the call.
    sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // Long-counted sizes and indices: Iterator.length / zipWithIndex
      // are Int-typed, and a range-sorted partition can exceed 2^31
      // rows at the 100 TB posture — a silent wrap would corrupt every
      // offset and select values from the wrong ranks
      val sizes = sorted.mapPartitions({ it =>
        var c = 0L
        while (it.hasNext) { it.next(); c += 1 }
        Iterator(c)
      }, preservesPartitioning = true).collect()
      val n = sizes.sum
      if (n == 0) return ps.map(_ => Double.NaN)
      val offsets = sizes.scanLeft(0L)(_ + _)
      val targets = ps.flatMap { p =>
        val pos = p * (n - 1)
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.toSet
      val picked = sorted.mapPartitionsWithIndex { (pid, it) =>
        var i = offsets(pid)
        val b = Seq.newBuilder[(Long, Double)]
        while (it.hasNext) {
          val v = it.next()
          if (targets(i)) b += ((i, v))
          i += 1
        }
        b.result().iterator
      }.collect().toMap
      ps.map { p =>
        val pos = p * (n - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        // EXACT Percentile.getPercentile arithmetic: the weighted-
        // average form, not lo + (hi-lo)*frac — they differ in the
        // last ulp and the oracle gate compares hashes
        if (lo == hi) picked(lo)
        else (hi - pos) * picked(lo) + (pos - lo) * picked(hi)
      }
    } finally sorted.unpersist(blocking = false)
  }

  /** Corpus-relative quality gate: keep rows whose `c` lies inside the
    * corpus' exact [pLo, pHi] quantile band — the "drop the shortest
    * and longest tails" document filter, with thresholds derived from
    * the data instead of hand-tuned constants.  The thresholds are two
    * driver scalars (the same bounded-fold contract as [[exact]]); the
    * gate itself is a pure scan-stage predicate. */
  def filterByQuantile(df: DataFrame, c: Column, pLo: Double, pHi: Double): DataFrame = {
    require(pLo <= pHi, s"pLo must be <= pHi, got $pLo > $pHi")
    val Seq(lo, hi) = exact(df, c, Seq(pLo, pHi))
    df.filter(c.cast(DoubleType) >= lo && c.cast(DoubleType) <= hi)
  }

  /** Per-GROUP tail trim: keep rows whose `c` sits inside the
    * [pLo, pHi] percent_rank band WITHIN its group — "drop each
    * language's own length tails", where a global threshold would
    * gut low-resource groups whose distribution differs.  Rank-based
    * (percent_rank = (rank-1)/(n-1), ties share a rank) rather than
    * interpolated, so membership is exact integer arithmetic — no
    * cross-engine float hazard.  One partitioned window (shuffle on
    * the group key); a single-row group has percent_rank 0. */
  def filterByQuantilePerGroup(df: DataFrame, group: Column, c: Column,
                               pLo: Double, pHi: Double): DataFrame = {
    require(pLo <= pHi, s"pLo must be <= pHi, got $pLo > $pHi")
    require(!df.columns.exists(_.equalsIgnoreCase("_pr")),
      "input already has a _pr column — rename it first (scratch column)")
    // null/NaN values carry no rank evidence and are DROPPED, matching
    // [[exact]]/[[filterByQuantile]] — unfiltered they would occupy
    // the band's edges (nulls sort first, NaN last) and push every
    // real value's percent_rank upward
    val cd = c.cast(DoubleType)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(group).orderBy(c.asc)
    df.filter(cd.isNotNull && !isnan(cd))
      .withColumn("_pr", percent_rank().over(w))
      .filter(col("_pr") >= pLo && col("_pr") <= pHi)
      .drop("_pr")
  }

  /** Equal-population quantile buckets per group (curriculum /
    * difficulty binning: "decile of n_chars within each language").
    * `ntile(n)` over a window ordered by (value, tiebreak) — the
    * explicit tiebreak makes the assignment DETERMINISTIC for tied
    * values (a bare ORDER BY value leaves ties partition-order
    * dependent, which a hash-gated pipeline cannot tolerate).  One
    * shuffle on the group key; skewed groups are bounded by the
    * group's own row count, exactly like the percent_rank gate above.
    *
    * @return input rows + `bucket` in [1, n] */
  def ntileBuckets(df: DataFrame, group: Column, value: Column,
                   tiebreak: Column, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // withColumn would silently OVERWRITE a pre-existing `bucket`
    // column — losing caller data in a frame that happens to carry
    // one; refuse instead.  Caseless: withColumn resolves
    // case-insensitively under the default spark.sql.caseSensitive
    require(!df.columns.exists(_.equalsIgnoreCase("bucket")),
      "ntileBuckets: input already has a `bucket` column — rename it first " +
        "(the output column name is fixed to `bucket`)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(value.asc, tiebreak.asc)
    df.withColumn("bucket", ntile(n).over(w))
  }
}
