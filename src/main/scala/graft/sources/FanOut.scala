package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive fan-out for unsplittable small inputs (optimization
  * guide §2.5, "input skew: one huge unsplittable file").
  *
  * The bench corpora ship as single-FILE, single-ROW-GROUP parquet
  * (verified: every sf0.1 table has row_groups=1), and a parquet row
  * group is the unit of scan parallelism — so every query's first
  * stage (scan → normalize/rolling-hash/astro kernels → partial
  * aggregate / explode) funnels the whole table through ONE task while
  * the other `local[32]` cores idle.  That first stage is where most
  * of the per-row compute of the suite lives.
  *
  * Fix: when the table's on-disk footprint is below
  * `spark.graft.fanout.maxBytes` (default 256 MB), insert ONE
  * deterministic hash repartition on the table's key columns to
  * `defaultParallelism` partitions right after the read.  Properties:
  *
  *  - Catalyst prunes columns THROUGH the exchange, so the shuffle
  *    moves only the columns the query reads — bounded by the
  *    threshold, priced inside the measured query.
  *  - Hash-on-key (not round-robin) keeps the row→partition mapping
  *    deterministic under task retry (the SPARK-38388 hazard class)
  *    and skips round-robin's sort-before-repartition.
  *  - The explicit partition count makes the exchange
  *    REPARTITION_BY_NUM, which AQE's partition coalescing leaves
  *    alone — otherwise AQE would fold the ~10 MB shuffle straight
  *    back to one partition.
  *  - Above the threshold the input is big enough to arrive as many
  *    native splits (multiple files / row groups), so this is a no-op:
  *    at production scale the helper adds NOTHING to the plan, and the
  *    threshold is a conf, not a constant tuned to this box.
  *
  * Row-level results are unchanged (a repartition is a pure exchange);
  * the only observable difference is floating-point partial-aggregate
  * merge order, which every declared query already tolerates by
  * decimal-cast or round-6 contract (re-verified against the DuckDB
  * oracle after the change).
  */
object FanOut {
  val MaxBytesConf = "spark.graft.fanout.maxBytes"
  val DefaultMaxBytes: Long = 256L << 20

  /** Bytes under `path` per the frame's own Hadoop conf; Long.MaxValue
    * (= never fan out) when the path cannot be sized. */
  def inputBytes(df: DataFrame, path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case _: Exception => Long.MaxValue }

  def small(df: DataFrame, path: String, keys: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "fan-out needs at least one deterministic key column")
    val s = df.sparkSession
    // a malformed conf value must name the key, not surface as a bare
    // NumberFormatException from deep inside query construction
    val maxBytes = s.conf.getOption(MaxBytesConf).map { v =>
      scala.util.Try(v.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"$MaxBytesConf must be a byte count in decimal, got '$v'"))
    }.getOrElse(DefaultMaxBytes)
    if (maxBytes > 0 && inputBytes(df, path) <= maxBytes)
      df.repartition(s.sparkContext.defaultParallelism, keys: _*)
    else df
  }
}
