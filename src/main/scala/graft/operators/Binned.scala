package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N-dimensional binned aggregation: the engine behind the reference's
  * histogram "cubes" and binned statistics (ezdata/xarray.py:38–96
  * xr_histogram, 99–165 per-variable weighted histograms, 168–222
  * df_groupby_bins with empty bins kept, 269–335 binned_statistic), the
  * datashader raster aggregation (ezdata/datashader.py:105–219), and
  * the healpix grid densify (ezdata/astro/astro.py:82–101).
  *
  * Design for scale: the aggregation is a single `groupBy(bucketIds)`
  * shuffle (map-side partial agg applies); the *dense* grid is produced
  * by joining the small aggregated result onto a generated axis
  * cross-product (`spark.range` per axis), never by densifying the
  * input.  At 100 TB the grouped cube is ≤ product-of-bins rows — tiny
  * compared to the input — so the densify join broadcasts.
  */
object Binned {

  /** One binning axis: `floor((x - lo) / width)` bucket ids clamped to
    * [0, n); values on the upper edge fall in the last bin, matching
    * numpy.histogram's closed-right last bin. */
  final case class Axis(name: String, expr: Column, lo: Double, hi: Double, n: Int) {
    // fail loudly on a degenerate axis: width 0 makes every bucket id
    // NaN→null, and least() SKIPS nulls, so every in-range row would
    // silently clamp into the last bin with all centers collapsed at
    // `lo` (numpy.histogram raises on max <= min too).  Data-derived
    // extents of a constant column should be padded first — see
    // [[padDegenerate]].
    require(n >= 1, s"Axis '$name' needs n >= 1 bins, got $n")
    require(hi > lo,
      s"Axis '$name' has a degenerate range [$lo, $hi] — hi must exceed lo; " +
        "for a data-derived extent of a constant column, pad it (padDegenerate) " +
        "or pass an explicit range")
    def width: Double = (hi - lo) / n
    def bucket: Column = {
      val raw = floor((expr - lit(lo)) / lit(width)).cast(LongType)
      // least(), not an ===hi equality clamp: FP division can push a
      // value just BELOW hi to bucket n (e.g. lo=0, hi=1, n=3,
      // x=0.9999999999999999), which the dense-grid join would then
      // silently drop
      least(raw, lit(n.toLong - 1))
    }
    def inRange: Column = expr >= lit(lo) && expr <= lit(hi)
    /** Bin centers for a generated dense axis. */
    def centerOf(bucketCol: Column): Column = lit(lo) + (bucketCol + lit(0.5)) * lit(width)
  }

  /** Sparse N-D histogram: groupBy bucket ids, one aggregate per cell.
    * Out-of-range rows are dropped (numpy.histogramdd semantics). */
  def cube(df: DataFrame, axes: Seq[Axis], aggs: Seq[Column]): DataFrame = {
    val inRange = axes.map(_.inRange).reduce(_ && _)
    val buckets = axes.map(a => a.bucket.as(a.name + "_bin"))
    df.filter(inRange)
      .groupBy(buckets: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Dense N-D cube: sparse cube right-joined onto the generated axis
    * cross-product so empty bins appear (count 0 via `fill`, null
    * statistic otherwise) — semantics of ezdata/xarray.py:218–221. */
  def denseCube(df: DataFrame, axes: Seq[Axis], aggs: Seq[Column],
                fill: Map[String, Any] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val sparse = cube(df, axes, aggs)
    val grid = axes.map { a =>
      spark.range(a.n).select(col("id").as(a.name + "_bin"))
    }.reduce(_.crossJoin(_))
    val binCols = axes.map(a => a.name + "_bin")
    // both sides are small; build (broadcast) the aggregated sparse cube —
    // a broadcast build of the right-outer side is unsupported, so phrase
    // it as grid LEFT JOIN broadcast(sparse)
    val joined = grid.join(broadcast(sparse), binCols, "left_outer")
    val filled = if (fill.nonEmpty) joined.na.fill(fill) else joined
    // attach bin-center coordinate columns like the reference's labeled axes
    axes.foldLeft(filled) { (d, a) =>
      d.withColumn(a.name + "_center", a.centerOf(col(a.name + "_bin")))
    }
  }

  /** 1-D histogram counts (dense). */
  def histogram(df: DataFrame, x: Column, lo: Double, hi: Double, bins: Int,
                weight: Option[Column] = None): DataFrame = {
    val ax = Axis("x", x, lo, hi, bins)
    val agg = weight.map(w => sum(w).as("value")).getOrElse(count(lit(1)).as("value"))
    denseCube(df, Seq(ax), Seq(agg), fill = if (weight.isEmpty) Map("value" -> 0L) else Map.empty)
  }

  /** Bin-edge inference from data extent: the reference's smallest-diff
    * heuristic is data-dependent (ezdata/xarray.py:23–30); here we take
    * explicit (lo, hi, n) or compute extent in one pass.  The extent
    * pass is a cheap column min/max aggregate (scan-only, no shuffle). */
  def extent(df: DataFrame, x: Column): (Double, Double) = {
    val r = df.agg(min(x).cast(DoubleType), max(x).cast(DoubleType)).head()
    require(!r.isNullAt(0) && !r.isNullAt(1),
      "extent: column has no non-null values (empty frame or all-null " +
        "column) — pass an explicit range")
    (r.getDouble(0), r.getDouble(1))
  }

  /** Widen a data-derived degenerate extent (constant column: min ==
    * max) to a unit-wide window around the value — numpy.histogram's
    * convention for constant data — so [[Axis]]'s hi > lo contract
    * holds.  Non-degenerate extents pass through unchanged. */
  def padDegenerate(lo: Double, hi: Double): (Double, Double) =
    if (hi > lo) (lo, hi) else (lo - 0.5, hi + 0.5)

  /** Bin-width heuristic from the reference (ezdata/xarray.py:23–30
    * guess_bins): dx = the smallest gap between consecutive distinct
    * values; edges run min−0.5dx to max+0.6dx (the +0.6 keeps the last
    * bin).  Returns an Axis covering the guessed grid.
    *
    * Scale design: the smallest-gap semantics are global, but a global
    * single-task sort is not required — the distinct values are
    * range-repartitioned (each partition owns a contiguous value
    * range, sorted within), each task reports its local (min, max,
    * min-gap) in one pass, and the driver folds the per-partition
    * triples plus the gaps ACROSS partition boundaries (last of
    * partition i to first of partition i+1).  Work per task is bounded
    * by distinct-cardinality / partitions; nothing but a few triples
    * reaches the driver. */
  def guessBins(df: DataFrame, x: Column, name: String = "x"): Axis = {
    val distinctVals = df.select(x.cast(DoubleType).as("_v"))
      // NaN passes isNotNull and range-sorts LAST, so it would become
      // hi and collapse the axis; ±inf would explode nBins to 2^31
      .where(col("_v").isNotNull && !isnan(col("_v")) &&
        abs(col("_v")) =!= lit(Double.PositiveInfinity))
      .distinct()
    // (partitionIndex, min, max, minGap|NaN) per non-empty partition
    val parts = distinctVals
      .repartitionByRange(col("_v")).sortWithinPartitions(col("_v"))
      .select(col("_v")).rdd.mapPartitionsWithIndex { (pi, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          var prev = it.next().getDouble(0)
          val first = prev
          var minGap = Double.NaN
          while (it.hasNext) {
            val v = it.next().getDouble(0)
            val g = v - prev
            if (minGap.isNaN || g < minGap) minGap = g
            prev = v
          }
          Iterator((pi, first, prev, minGap))
        }
      }.collect().sortBy(_._1)
    require(parts.nonEmpty,
      "guessBins: column has no non-null values — pass an explicit Axis")
    val lo = parts.head._2
    val hi = parts.last._3
    val boundaryGaps = parts.sliding(2).collect {
      case Array(a, b) => b._2 - a._3 // first of next - last of prev
    }
    val gaps = (parts.iterator.map(_._4) ++ boundaryGaps).filterNot(_.isNaN).toSeq
    val dx0 = if (gaps.isEmpty) Double.NaN else gaps.min
    val dx = if (dx0.isNaN || dx0 <= 0) math.max(hi - lo, 1.0) else dx0
    val nBins = math.max(1, math.ceil(((hi + 0.6 * dx) - (lo - 0.5 * dx)) / dx - 1e-9).toInt)
    Axis(name, x, lo - 0.5 * dx, (lo - 0.5 * dx) + nBins * dx, nBins)
  }

  /** Datashader-style raster aggregation: viewport filter + per-pixel
    * groupBy with an aggregate parsed from strings like "mean(z)",
    * "count(*)" (ezdata/datashader.py:105–138 parse_agg,
    * ezdata/astro/astro.py:299–337).  Spark SQL *is* the parser:
    * the string goes through `expr(...)`. */
  def raster(df: DataFrame, x: Column, y: Column,
             xlo: Double, xhi: Double, ylo: Double, yhi: Double,
             widthPx: Int, heightPx: Int, what: String = "count(*)"): DataFrame = {
    val ax = Axis("px", x, xlo, xhi, widthPx)
    val ay = Axis("py", y, ylo, yhi, heightPx)
    cube(df, Seq(ax, ay), Seq(expr(what).as("value")))
  }

  /** Hexagonal binning (the reference's hexbin, ezdata/plotter.py:
    * 898–941 via matplotlib): pointy-top axial coordinates with cube
    * rounding, all as Column arithmetic.  `size` is the hex circumradius
    * in x-units; `aspect` scales y into x-units first.  Returns
    * (hex_q, hex_r) axial ids + the aggregate per cell.
    */
  def hexbin(df: DataFrame, x: Column, y: Column, size: Double, aspect: Double,
             aggs: Seq[Column]): DataFrame = {
    val xs = x / lit(size)
    val ys = y / lit(size * aspect)
    // axial fractional coords (pointy-top)
    val qf = lit(math.sqrt(3.0) / 3.0) * xs - ys / 3.0
    val rf = ys * lit(2.0 / 3.0)
    // cube rounding: round each of (q, r, s=-q-r); fix the largest error
    val sf = -qf - rf
    val q0 = round(qf, 0); val r0 = round(rf, 0); val s0 = round(sf, 0)
    val dq = abs(q0 - qf); val dr = abs(r0 - rf); val ds = abs(s0 - sf)
    val qFixed = when(dq > dr && dq > ds, -r0 - s0).otherwise(q0)
    val rFixed = when(!(dq > dr && dq > ds) && dr > ds, -q0 - s0).otherwise(r0)
    df.groupBy(qFixed.cast(LongType).as("hex_q"), rFixed.cast(LongType).as("hex_r"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Center of a hex cell in data units (for rendering). */
  def hexCenter(q: Column, r: Column, size: Double, aspect: Double): (Column, Column) = {
    val cx = lit(size) * (lit(math.sqrt(3.0)) * q + lit(math.sqrt(3.0) / 2.0) * r)
    val cy = lit(size * aspect) * lit(1.5) * r
    (cx, cy)
  }

  /** Re-bin new data on a reference cube's axes (`xr_histogram_like`,
    * ezdata/xarray.py:234–266): the Axis values ARE the stored axis
    * spec, so reuse is passing the same axes back in. */
  def histogramLike(df: DataFrame, axes: Seq[Axis], aggs: Seq[Column],
                    fill: Map[String, Any] = Map.empty): DataFrame =
    denseCube(df, axes, aggs, fill)

  /** Categorical raster (`count_cat`, ezdata/datashader.py:105–138):
    * per-pixel-per-category counts pivoted to one column per category.
    * Category values are enumerated first (small distinct query) so
    * the pivot is bounded and deterministic. */
  def rasterCat(df: DataFrame, x: Column, y: Column,
                xlo: Double, xhi: Double, ylo: Double, yhi: Double,
                widthPx: Int, heightPx: Int, cat: Column,
                maxCategories: Int = 256): DataFrame = {
    val ax = Axis("px", x, xlo, xhi, widthPx)
    val ay = Axis("py", y, ylo, yhi, heightPx)
    // bounded category pivot: count_cat semantics mean one output
    // column per category — an unbounded distinct-collect on a
    // high-cardinality column would OOM the driver (same guard as
    // Plotter.groupby)
    val cats = df.select(cat.cast("string").as("c"))
      .where(col("c").isNotNull) // a null category poisons pivot/na.fill
      .distinct()
      .orderBy(col("c")).limit(maxCategories + 1).collect().map(_.getString(0)).toSeq
    require(cats.length <= maxCategories,
      s"more than $maxCategories categories for count_cat; " +
        "aggregate on a coarser key or raise maxCategories")
    df.filter(ax.inRange && ay.inRange)
      .groupBy(ax.bucket.as("px_bin"), ay.bucket.as("py_bin"))
      .pivot(cat.cast("string"), cats)
      .count()
      .na.fill(0L, cats)
  }

  /** Healpix-cell aggregation + dense grid (ezdata/astro/astro.py:340–402):
    * groupBy cell, aggregate, right-join onto `spark.range(12·nside²)`. */
  def healpixAgg(df: DataFrame, cell: Column, level: Int, what: String = "count(*)"): DataFrame = {
    val spark = df.sparkSession
    val npix = 12L * (1L << level) * (1L << level)
    val sparse = df.groupBy(cell.cast(LongType).as("healpix")).agg(expr(what).as("value"))
    val grid = spark.range(npix).select(col("id").as("healpix"))
    sparse.join(grid, Seq("healpix"), "right_outer")
  }
}
