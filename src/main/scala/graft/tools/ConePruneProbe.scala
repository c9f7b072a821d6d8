package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.{Astro, SphDist}
import graft.plans.ConeZonePushdown

/** Measures what [[graft.plans.ConeZonePushdown]] actually buys at the
  * scan: a dec-clustered synthetic sky (the layout a sky-partitioned
  * survey table has naturally) is filtered by a small cone three ways —
  *
  *   plain     the haversine Column composition (rule can't see it):
  *             every row is read and pays the trig
  *   default   sphdist scalar + rule: dec band reaches the parquet
  *             row-group/file pruning, RA guard is the convention-free
  *             pmod pre-filter
  *   sargable  spark.graft.cone.sargableRaBand=true: RA band prunes too
  *
  * Prints min-of-2 wall seconds per arm plus the scan's numOutputRows
  * (the rows that survived pushdown — the pruning evidence) and the
  * result parity check.  Row counts are what transfer to a real
  * cluster: wall-clock on local[32] understates the win because a 32-
  * thread scan of a small table is IO-cache-warm, while at 100 TB the
  * pruned row groups are bytes never read.
  *
  * Usage: runMain graft.tools.ConePruneProbe [rows] [radiusDeg]
  */
object ConePruneProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val radius = if (args.length > 1) args(1).toDouble else 1.0
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ConeZonePushdown.install(spark)

    val dir = "/tmp/graft_cone_sky"
    // deterministic pseudo-uniform sky; repartitionByRange(dec) gives
    // each file a narrow dec slice = tight row-group min/max (what a
    // zone/healpix-partitioned catalog provides for free)
    spark.range(n).select(
        (col("id") * 137.035999 % 360.0).cast(DoubleType).as("ra"),
        ((col("id") * 61.80339887 % 180.0) - 90.0).cast(DoubleType).as("dec"),
        col("id"))
      .repartitionByRange(64, col("dec"))
      .sortWithinPartitions(col("dec"))
      .write.mode("overwrite").parquet(dir)

    val (ra0, dec0) = (210.0, 35.0)
    def sky = spark.read.parquet(dir)
    def plain() = sky.filter(Astro.sphdist(col("ra"), col("dec"), lit(ra0), lit(dec0)) <= lit(radius))
    def ruled() = sky.filter(SphDist.sphdist(col("ra"), col("dec"), lit(ra0), lit(dec0)) <= lit(radius))

    def scanRows(df: DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metrics("numOutputRows").value
      }.getOrElse(-1L)

    def run(mk: () => DataFrame): (Double, Long, Long) = {
      def once() = {
        val df = mk()
        val t0 = System.nanoTime
        // execute df's OWN physical plan (df.count() would build a new
        // QueryExecution and leave df's scan metrics untouched)
        val cnt = df.queryExecution.executedPlan.execute().count()
        ((System.nanoTime - t0) / 1e9, scanRows(df), cnt)
      }
      val a = once(); val b = once()
      (math.min(a._1, b._1), b._2, b._3)
    }

    // the same sky z-order-clustered on (ra, dec) — the engine's own
    // layout operator; now BOTH bands have narrow per-file min/max
    val zdir = "/tmp/graft_cone_sky_z"
    graft.operators.Layout.zOrderBy(
        spark.read.parquet(dir),
        Seq(graft.operators.Layout.quantize(col("ra"), 0.0, 360.0, 12),
            graft.operators.Layout.quantize(col("dec"), -90.0, 90.0, 12)),
        bits = 12, numPartitions = 64)
      .write.mode("overwrite").parquet(zdir)
    def zsky = spark.read.parquet(zdir)
    def zruled() = zsky.filter(SphDist.sphdist(col("ra"), col("dec"), lit(ra0), lit(dec0)) <= lit(radius))

    // the same sky PARTITIONED by coarse healpix cell — the layout a
    // 100 TB catalog actually uses; the cell-cover IN-set becomes a
    // directory-level PartitionFilter (pruned partitions are never
    // even listed, let alone read)
    val cdir = "/tmp/graft_cone_sky_cells"
    spark.read.parquet(dir)
      .withColumn("cell", graft.functions.Healpix.ang2pix(3, col("ra"), col("dec")))
      .repartition(64, col("cell")) // one task per cell group → one file per cell
      .write.partitionBy("cell").mode("overwrite").parquet(cdir)
    def csky = spark.read.parquet(cdir)
    def cellRuled() = csky.filter(Astro.healpixConeSearchOnCell(
      col("cell"), col("ra"), col("dec"), 3, ra0, dec0, radius))

    def scanFiles(df: DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics.get("numFiles").map(_.value).getOrElse(-1L)
      }.getOrElse(-1L)

    sky.count(); zsky.count(); csky.count() // warm the file index + OS cache so arms compare fairly
    val p = run(plain)
    val d = run(ruled)
    spark.conf.set("spark.graft.cone.sargableRaBand", "true")
    val s = run(ruled)
    val z = run(zruled)
    spark.conf.unset("spark.graft.cone.sargableRaBand")
    val c = run(cellRuled)
    val cFiles = { val df = cellRuled(); df.queryExecution.executedPlan.execute().count(); scanFiles(df) }
    val cover = graft.functions.Healpix.coneCells(3, ra0, dec0, radius)
    require(p._3 == d._3 && p._3 == s._3 && p._3 == z._3 && p._3 == c._3,
      s"arms disagree: ${p._3} ${d._3} ${s._3} ${z._3} ${c._3}")

    println(f"rows=$n%d radius=$radius%.2f matches=${p._3}%d")
    println(f"plain     ${p._1}%7.2f s  scan_rows=${p._2}%d")
    println(f"default   ${d._1}%7.2f s  scan_rows=${d._2}%d  (dec band pruned ${100.0 * (p._2 - d._2) / math.max(p._2, 1)}%.1f%%)")
    println(f"sargable  ${s._1}%7.2f s  scan_rows=${s._2}%d  (dec+RA pruned ${100.0 * (p._2 - s._2) / math.max(p._2, 1)}%.1f%%)")
    println(f"zorder    ${z._1}%7.2f s  scan_rows=${z._2}%d  (z-order layout + both bands pruned ${100.0 * (p._2 - z._2) / math.max(p._2, 1)}%.1f%%)")
    println(f"cellpart  ${c._1}%7.2f s  scan_rows=${c._2}%d  files_read=$cFiles%d of 768 dirs (cover=${cover.length}%d cells; partition pruning, pruned dirs never listed)")
    spark.stop()
  }
}
