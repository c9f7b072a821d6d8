package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(coords: Seq[Long], bits: Int): Long = {
    var z = 0L
    val d = coords.size
    for (j <- coords.indices; i <- 0 until bits)
      z |= ((coords(j) >> i) & 1L) << (i * d + j)
    z
  }

  test("zValue matches the reference interleave over a coordinate sweep") {
    val pts = for (x <- 0L until 64L by 7; y <- 0L until 64L by 5) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(Seq(col("x"), col("y")), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) == refZ(Seq(x, y), 6), s"z($x, $y)")
    // 3 dims, and the classic locality identity: z of (k, k, k) with
    // all dims equal replicates each bit 3x
    val t3 = Seq((5L, 9L, 12L)).toDF("a", "b", "c")
      .select(Layout.zValue(Seq(col("a"), col("b"), col("c")), 4)).head.getLong(0)
    assert(t3 == refZ(Seq(5L, 9L, 12L), 4))
  }

  test("zValue is monotone in each dimension holding others fixed at zero") {
    // interleaving preserves per-dimension order: z(x,0) < z(x',0) iff x < x'
    val xs = (0L until 256L).toDF("x")
      .select(Layout.zValue(Seq(col("x"), lit(0L)), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(xs == xs.sorted && xs.distinct.size == xs.size)
  }

  test("quantize floors into range and clamps out-of-range values") {
    val vals = Seq(-10.0, 1.0, 1.0001, 25.0, 49.9999, 50.0, 99.0)
    val q = vals.toDF("v")
      .select(col("v"), Layout.quantize(col("v"), 1.0, 50.0, 8).as("q"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(q(-10.0) == 0L && q(1.0) == 0L && q(99.0) == 255L && q(50.0) == 255L)
    assert(q(25.0) == math.floor((25.0 - 1) / 49 * 256).toLong)
    assert(vals.map(q).sameElements(vals.map(q).sorted)) // monotone
  }

  test("zOrderBy clusters EVERY dimension; single-key sort leaves the rest unclustered") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(pmod(col("l_partkey"), lit(256)).cast(LongType).as("x"),
        pmod(col("l_orderkey"), lit(256)).cast(LongType).as("y"))
    def meanExtents(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val e = df.groupBy(spark_partition_id().as("p"))
        .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
        .agg(avg("ex"), avg("ey")).head
      (e.getDouble(0), e.getDouble(1))
    }
    val (zx, zy) = meanExtents(Layout.zOrderBy(li, Seq(col("x"), col("y")), 8, 16))
    val (sx, sy) = meanExtents(li.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    // single-key layout: x tightly clustered, y spans ~the full domain
    assert(sx < 40, s"x-sorted x-extent $sx")
    assert(sy > 200, s"x-sorted y-extent should be unclustered, got $sy")
    // z-order: BOTH dims' mean extent far below the 255 domain — the
    // property that lets parquet min/max stats prune 2-D predicates
    assert(zx < 150 && zy < 150, s"z-order extents ($zx, $zy)")
    assert(zy < sy / 2, s"z-order must beat single-key on the second dim: $zy vs $sy")
  }

  test("z-ordered parquet files carry narrow per-file min/max on every clustered dim") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(col("l_orderkey"),
          pmod(col("l_partkey"), lit(256)).cast(LongType).as("x"),
          pmod(col("l_orderkey"), lit(256)).cast(LongType).as("y"))
      Layout.zOrderBy(li, Seq(col("x"), col("y")), 8, 8)
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val files = dir.listFiles.filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length >= 4, s"expected several files, got ${files.length}")
      val extents = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max("x") - min("x"), max("y") - min("y")).head
        (r.getLong(0), r.getLong(1))
      }
      // every file covers a hyper-box well under the 255x255 domain, so
      // a reader with predicates on (x, y) skips most files on stats
      val (mx, my) = (extents.map(_._1).sum.toDouble / extents.length,
        extents.map(_._2).sum.toDouble / extents.length)
      assert(mx < 170 && my < 170, s"mean per-file extents ($mx, $my) of 255")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("q114 layout: row-group pruning bounds scan rows vs the unclustered table") {
    // the exact layout + predicate the q114 driver slot runs: scan-node
    // numOutputRows counts rows in SURVIVING row groups (parquet pushed
    // filters prune at row-group granularity by default; the Spark-side
    // Filter re-evaluates per row), so clustering shows up directly
    val tmp = java.nio.file.Files.createTempDirectory("q114gate").toFile
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val plainDir = s"${tmp.getAbsolutePath}/plain"
      val zDir = s"${tmp.getAbsolutePath}/z"
      li.repartition(16).write.parquet(plainDir)
      Layout.zOrderBy(li,
          Seq(Layout.quantize(col("l_extendedprice"), 0.0, 120000.0, 8),
              Layout.quantize(col("l_quantity"), 0.0, 64.0, 8)),
          bits = 8, numPartitions = 16)
        .write.parquet(zDir)
      def scanned(dir: String): (Long, Long) = {
        val df = spark.read.parquet(dir)
          .filter(col("l_extendedprice").between(10000.0, 20000.0) &&
                  col("l_quantity").between(10.0, 20.0))
        val matched = df.queryExecution.executedPlan.execute().count()
        val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics("numOutputRows").value
        }.get
        (scan, matched)
      }
      val (plainScan, plainN) = scanned(plainDir)
      val (zScan, zN) = scanned(zDir)
      assert(zN == plainN, s"layout changed the result: $zN vs $plainN rows")
      assert(zN > 0, "empty predicate box — the gate would be vacuous")
      // unclustered: the random layout leaves every row group overlapping
      // the box; clustered: only the box's hyper-box of files/groups scans
      assert(zScan < plainScan / 2,
        s"z-order pruning yield collapsed: scanned $zScan of clustered vs $plainScan plain")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }

  test("zValue rejects keys that overflow a signed long") {
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a"), col("b")), 32)
    }
    ()
  }

  test("bucketed tables join with ZERO exchange: the write-time shuffle is reused") {
    val dir = java.nio.file.Files.createTempDirectory("buckets").toFile
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      Layout.bucketedWrite(li, "graft_bli", s"$dir/li", 8, "l_orderkey", Seq("l_orderkey"))
      Layout.bucketedWrite(o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "graft_bo", s"$dir/o", 8, "l_orderkey", Seq("l_orderkey"))
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val j = spark.table("graft_bli").join(spark.table("graft_bo"), "l_orderkey")
        val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
        assert(j.count() == expected)
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed co-located join must not shuffle either side:\n$plan")
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"scan did not use bucket metadata:\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bli")
      spark.sql("DROP TABLE IF EXISTS graft_bo")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("compactPartitioned keeps the physical layout, budgets files by partition bytes, preserves rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cpart").toFile
    try {
      val base = tmp.getAbsolutePath
      // skewed daily partitions: dt=0 holds ~40x the rows of dt=1/dt=2
      // (and more than one 1 MiB target unit), every partition written
      // as 16 deliberately-tiny files
      val df = spark.range(410000).select(
        when(col("id") < 400000, lit(0)).otherwise((col("id") % 2 + 1).cast("int")).as("dt"),
        col("id"), (col("id") * 37 % 1000).as("v"))
      df.repartition(16).write.partitionBy("dt").parquet(s"$base/in")
      def files(dir: String): Int =
        Option(new java.io.File(dir).listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
      assert(files(s"$base/in/dt=0") == 16 && files(s"$base/in/dt=1") == 16)
      // ~600 KB total in dt=0 → a 1 MiB target gives it 1 file; tiny
      // partitions also 1 — use a sub-partition target to see budgets
      val plan = Layout.compactPartitioned(spark, s"$base/in", s"$base/out",
        Seq("dt"), targetFileBytes = 1L << 20)
      assert(plan.keySet == Set("dt=0", "dt=1", "dt=2"), plan.toString)
      // the skewed partition's byte budget is strictly larger — files
      // scale with PARTITION bytes, not with a global constant
      assert(plan("dt=0") > plan("dt=1") && plan("dt=1") == 1, plan.toString)
      // every budget honored as a CAP (salt-slot hash collisions may
      // merge slots into fewer, larger files — never an explosion)
      for ((suffix, budget) <- plan) {
        val got = files(s"$base/out/$suffix")
        assert(got >= 1 && got <= budget, s"$suffix: $got files vs budget $budget")
      }
      // physical layout survived: partition dirs, not a flat table
      assert(new java.io.File(s"$base/out/dt=0").isDirectory)
      // content: identical multiset of rows (dt comes back as the
      // partition column)
      val a = spark.read.parquet(s"$base/in").select("dt", "id", "v")
        .orderBy("id").collect().toSeq
      val b = spark.read.parquet(s"$base/out").select("dt", "id", "v")
        .orderBy("id").collect().toSeq
      assert(a == b)
      assertThrows[IllegalArgumentException](
        Layout.compactPartitioned(spark, s"$base/in", s"$base/out2", Seq.empty))
      // a NULL partition value Hive-encodes as __HIVE_DEFAULT_PARTITION__,
      // which can never match the row's real (null) value — the rewrite
      // must FAIL LOUD, not silently drop those rows
      spark.range(10).select(
          when(col("id") < 5, lit(null).cast("int")).otherwise(lit(1)).as("dt"),
          col("id"))
        .write.partitionBy("dt").parquet(s"$base/in_null")
      val err = intercept[Exception](
        Layout.compactPartitioned(spark, s"$base/in_null", s"$base/out3", Seq("dt"),
          targetFileBytes = 1L << 20))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(err).exists(_.contains("no matching partition directory")), err.toString)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("compactSmallFiles merges a tiny-files table shuffle-free and preserves every row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toFile
    try {
      val base = tmp.getAbsolutePath
      spark.range(10000)
        .select(col("id"), (col("id") % 7).as("k"), (col("id") * 31 % 1000).as("v"))
        .repartition(64).write.parquet(s"$base/tiny")
      def files(dir: String): Int =
        new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
      assert(files(s"$base/tiny") == 64)
      val n = Layout.compactSmallFiles(spark, s"$base/tiny", s"$base/out", 1L << 20)
      assert(files(s"$base/out") <= n && files(s"$base/out") < 64)
      // content-preserving: the identical multiset of rows survives
      val a = spark.read.parquet(s"$base/tiny").orderBy("id").collect().toSeq
      val b = spark.read.parquet(s"$base/out").orderBy("id").collect().toSeq
      assert(a == b)
      // the compaction is a narrow dependency — no exchange anywhere
      val plan = spark.read.parquet(s"$base/tiny").coalesce(n)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      // a sub-MiB target would recreate the small-files problem: loud
      assertThrows[IllegalArgumentException](
        Layout.compactSmallFiles(spark, s"$base/tiny", s"$base/out2", 1000L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }
}
