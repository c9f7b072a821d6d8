package graft

import org.apache.spark.sql.functions._
import graft.operators.DistinctSketch

class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch unit: sparse exactness, promotion, and cross-regime merge") {
    val a = new DistinctSketch.Hll(p = 12, sparseCap = 8)
    (1 to 5).foreach(i => a.add(s"v$i"))
    assert(a.result == (5L, true))
    a.add("v3") // duplicate
    assert(a.result == (5L, true))
    // promotion at sparseCap
    (6 to 20).foreach(i => a.add(s"v$i"))
    val (est, exact) = a.result
    assert(!exact && a.regs != null)
    assert(math.abs(est - 20L) <= 2, s"dense estimate $est far from 20") // tiny n: linear counting is near-exact
    // sparse + sparse stays exact when union fits
    val b = new DistinctSketch.Hll(12, 8)
    val c = new DistinctSketch.Hll(12, 8)
    Seq("x", "y", "z").foreach(b.add)
    Seq("y", "z", "w").foreach(c.add)
    assert(b.merge(c).result == (4L, true))
    // sparse into dense merges via hashing, dense+dense takes max regs
    val d = new DistinctSketch.Hll(12, 8)
    Seq("x", "q").foreach(d.add)
    a.merge(d)
    assert(!a.result._2)
  }

  test("exact regime: per-group counts equal count(distinct) bit-for-bit") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = DistinctSketch.perGroup(df, Seq(col("lang")),
        pmod(col("n_chars"), lit(1000)), p = 12, sparseCap = 2048)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val want = df.groupBy("lang")
      .agg(countDistinct(pmod(col("n_chars"), lit(1000))).as("n"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(t => (t._1, t._2)).toSeq == want.toSeq)
    got.foreach { case (lang, _, exact) => assert(exact, s"$lang should be exact") }
  }

  test("approximate regime: 100k distinct within HLL error at p=12") {
    val df = spark.range(0, 100000)
      .select(concat(lit("u"), col("id") * 2654435761L).as("k"))
    val got = df.agg(DistinctSketch.countDistinctSketch(col("k"), p = 12, sparseCap = 1024).as("d"))
      .select(col("d.n_distinct"), col("d.exact")).head()
    assert(!got.getBoolean(1))
    val err = math.abs(got.getLong(0) - 100000L) / 100000.0
    assert(err < 0.05, s"estimate ${got.getLong(0)} off by ${err * 100}%")
  }

  test("merge-order independence in the exact regime") {
    val parts = (0 until 5).map { p =>
      val h = new DistinctSketch.Hll(12, 512)
      (0 until 300).foreach(i => h.add(s"k${(i * 7 + p * 13) % 400}"))
      h
    }
    def fold(order: Seq[Int]): (Long, Boolean) = {
      val fresh = order.map { p =>
        val h = new DistinctSketch.Hll(12, 512)
        (0 until 300).foreach(i => h.add(s"k${(i * 7 + p * 13) % 400}"))
        h
      }
      fresh.reduce((a, b) => a.merge(b)).result
    }
    assert(parts.nonEmpty)
    val fwd = fold(0 until 5)
    assert(fwd == fold((0 until 5).reverse))
    assert(fwd._2 && fwd._1 == 400L)
  }

  test("plan: ObjectHashAggregate partial merge — the exchange moves sketches, not keys") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = DistinctSketch.perGroup(df, Seq(col("lang")), col("n_chars"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"typed partial agg missing:\n$plan")
  }

  test("persistable sketches: byte-deterministic round trip in both modes") {
    import graft.operators.DistinctSketch
    // sparse: bytes independent of insertion order; deserialize inverts
    val a = new DistinctSketch.Hll(10, 64)
    val b = new DistinctSketch.Hll(10, 64)
    Seq("x", "y", "z", "héllo").foreach(a.add(_))
    Seq("héllo", "z", "x", "y").foreach(b.add(_))
    val ba = DistinctSketch.serialize(a)
    assert(ba.sameElements(DistinctSketch.serialize(b)), "sparse bytes must be order-free")
    assert(DistinctSketch.deserialize(ba).result == ((4L, true)))
    // dense: promotion path independent of order; round trip preserves registers
    val c = new DistinctSketch.Hll(8, 4)
    (0 until 1000).foreach(i => c.add(s"v$i"))
    val bc = DistinctSketch.serialize(c)
    assert(DistinctSketch.deserialize(bc).result == c.result)
    // corrupt input fails loudly
    intercept[IllegalArgumentException](DistinctSketch.deserialize(Array[Byte](9, 9, 9)))
  }

  test("incremental accounting: stored daily sketches merge to the direct global answer") {
    import graft.operators.DistinctSketch
    import spark.implicits._
    // 20 "days", overlapping user populations
    val rows = for (d <- 0 until 20; i <- 0 until 300)
      yield (d, s"user${(d * 13 + i * 7) % 900}")
    val df = rows.toDF("day", "uid")
    val tmp = java.nio.file.Files.createTempDirectory("hll_inc").toFile
    try {
      // phase 1: per-day sketches, STORED — the raw data is never reread
      df.groupBy(col("day")).agg(DistinctSketch.hllSketch(col("uid")).as("sketch"))
        .write.parquet(s"$tmp/daily")
      // phase 2: merge the stored sketches only
      val merged = spark.read.parquet(s"$tmp/daily")
        .agg(DistinctSketch.hllMerge(col("sketch")).as("total"))
        .select(DistinctSketch.hllEstimate(col("total")).as("est"))
        .select(col("est.n_distinct"), col("est.exact")).head
      val direct = df.select(countDistinct(col("uid"))).head.getLong(0)
      assert(merged.getLong(0) == direct && merged.getBoolean(1),
        s"stored-merge ${merged.getLong(0)} != direct $direct (exact=${merged.getBoolean(1)})")
      // dense regime: same equivalence (merged-of-parts == whole, registers max)
      val big = (0 until 30000).map(i => (i % 10, s"k$i")).toDF("part", "k")
      val dtmp = s"$tmp/dense"
      big.groupBy(col("part")).agg(DistinctSketch.hllSketch(col("k"), p = 10, sparseCap = 16).as("s"))
        .write.parquet(dtmp)
      val mergedDense = spark.read.parquet(dtmp)
        .agg(DistinctSketch.hllMerge(col("s"), p = 10, sparseCap = 16).as("t"))
        .select(DistinctSketch.hllEstimate(col("t")).as("e"))
        .select(col("e.n_distinct")).head.getLong(0)
      val directDense = {
        val h = new DistinctSketch.Hll(10, 16)
        (0 until 30000).foreach(i => h.add(s"k$i"))
        h.result._1
      }
      assert(mergedDense == directDense,
        s"dense merged-of-parts $mergedDense != whole-stream sketch $directDense")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }

  test("perGroup accepts expression group columns") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"v${i % 7}")).toDF("id", "v")
    val out = graft.operators.DistinctSketch.perGroup(
      df, Seq((col("id") % 10).as("bucket")), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 10 && out.values.forall(n => n >= 1 && n <= 7), s"$out")
  }
}
