package graft

import org.apache.spark.sql.functions._
import graft.operators.{QuantileSketch, Quantiles}

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("summary unit: exact merge over disjoint and overlapping value sets") {
    val a = new QuantileSketch.Summary(64)
    Seq(1.0, 1.0, 3.0, 5.0).foreach(a.insert(_))
    val b = new QuantileSketch.Summary(64)
    Seq(2.0, 3.0, 4.0, 6.0, 6.0).foreach(b.insert(_))
    a.merge(b)
    assert(a.isExact && a.n == 9L)
    // cumulative counts of 1,1,2,3,3,4,5,6,6
    val want = Seq(1.0 -> 2L, 2.0 -> 3L, 3.0 -> 5L, 4.0 -> 6L, 5.0 -> 7L, 6.0 -> 9L)
    assert(a.tuples.map(t => t.v -> t.rmin).toSeq == want)
    a.tuples.foreach(t => assert(t.rmin == t.rmax))
    // discrete lower quantiles
    assert(a.query(0.5).v == 3.0)  // target rank 5
    assert(a.query(1.0).v == 6.0)
    assert(a.query(0.0).v == 1.0)
  }

  test("summary unit: compression keeps intervals valid and extremes exact") {
    val s = new QuantileSketch.Summary(8)
    (1 to 1000).foreach(i => s.insert(i.toDouble))
    s.flush()
    assert(!s.isExact && s.tuples.length <= 8)
    assert(s.tuples.head.v == 1.0 && s.tuples.last.v == 1000.0)
    // every retained tuple's interval must contain its true rank
    s.tuples.foreach { t =>
      val truth = t.v.toLong // values are 1..1000 each once
      assert(t.rmin <= truth && truth <= t.rmax, s"${t.v}: true $truth outside [${t.rmin}, ${t.rmax}]")
    }
  }

  test("exact regime: distinct <= capacity reproduces the exact quantile path") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(pmod(col("n_chars"), lit(257)).cast("double").as("v"))
    val ps = Seq(0.16, 0.5, 0.84)
    val got = QuantileSketch.quantiles(df, col("v"), ps, capacity = 512)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // oracle: discrete lower quantile by explicit cumulative counts
    val counts = df.groupBy("v").count().collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    val cums = counts.scanLeft(("", 0L)) { case ((_, c), (v, k)) => (v.toString, c + k) }.tail
    ps.zip(got).foreach { case (p, (pGot, v, lo, hi)) =>
      assert(pGot == p)
      val target = math.max(1L, math.ceil(p * n).toLong)
      val want = cums.find(_._2 >= target).get
      assert(v == want._1.toDouble, s"p=$p got $v want ${want._1}")
      assert(lo == hi && lo == want._2, s"p=$p exact regime must collapse bounds")
    }
  }

  test("approximate regime: true rank inside [rank_lo, rank_hi]; value near target") {
    // 60k mostly-distinct doubles, capacity 256 -> heavy compression
    val df = spark.range(0, 60000)
      .select((pmod(col("id") * 2654435761L, lit(999983L))).cast("double").as("v"))
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val got = QuantileSketch.quantiles(df, col("v"), ps, capacity = 256).collect()
    val sorted = df.collect().map(_.getDouble(0)).sorted
    got.foreach { r =>
      val (v, lo, hi, target) = (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val trueRank = sorted.count(_ <= v).toLong
      assert(lo <= trueRank && trueRank <= hi, s"true rank $trueRank outside [$lo, $hi]")
      // the reported interval must also be a useful one: it should
      // bracket (or nearly bracket) the target rank within the
      // summary's resolution, n / capacity tuples apart on average
      val slack = 16L * sorted.length / 256
      assert(target <= hi + slack && target >= lo - slack,
        s"target $target too far from [$lo, $hi]")
    }
    // and the exact path agrees within the same slack on values
    val exact = Quantiles.exact(df, col("v"), ps)
    got.zip(exact).foreach { case (r, ev) =>
      val idx = sorted.indexWhere(_ >= r.getDouble(1))
      val eidx = sorted.indexWhere(_ >= ev)
      assert(math.abs(idx - eidx) <= 16 * sorted.length / 256,
        s"sketch value ${r.getDouble(1)} rank-far from exact $ev")
    }
  }

  test("per-group aggregator: exact regime equals per-group discrete lower quantiles") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), pmod(col("n_chars"), lit(200)).cast("double").as("v"))
    val got = df.groupBy("lang")
      .agg(QuantileSketch.groupQuantile(col("v"), 0.5, capacity = 512).as("q"))
      .select(col("lang"), col("q.value"), col("q.rank_lo"), col("q.rank_hi"), col("q.exact"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val byLang = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (lang, v, lo, hi, exact) =>
      assert(exact, s"$lang should be exact at capacity 512")
      val vals = byLang(lang)
      val target = math.max(1L, math.ceil(0.5 * vals.length).toLong)
      val cums = vals.distinct.map(x => (x, vals.count(_ <= x).toLong))
      val want = cums.find(_._2 >= target).get
      assert(v == want._1 && lo == hi && lo == want._2,
        s"$lang: got ($v, $lo, $hi) want $want")
    }
    // plan: typed partial agg, the exchange moves summaries not values
    val plan = df.groupBy("lang")
      .agg(QuantileSketch.groupQuantile(col("v"), 0.5).as("q"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"typed partial agg missing:\n$plan")
  }

  test("merge-order independence in the exact regime") {
    val parts = (0 until 7).map { p =>
      val s = new QuantileSketch.Summary(128)
      (0 until 500).foreach(i => s.insert(((i * 31 + p * 7) % 100).toDouble))
      s
    }
    def runFold(order: Seq[Int]): Seq[(Double, Long)] = {
      val fresh = order.map { i =>
        val s = new QuantileSketch.Summary(128)
        (0 until 500).foreach(j => s.insert(((j * 31 + i * 7) % 100).toDouble))
        s
      }
      val m = fresh.reduce((a, b) => a.merge(b))
      m.tuples.map(t => (t.v, t.rmin)).toSeq
    }
    assert(parts.nonEmpty)
    assert(runFold(0 until 7) == runFold((0 until 7).reverse))
  }

  test("review fixes: signed zero ranks once; Agg validates at construction") {
    import graft.operators.QuantileSketch
    val sm = new QuantileSketch.Summary(capacity = 64)
    (1 to 5).foreach(_ => sm.insert(-0.0))
    (1 to 3).foreach(_ => sm.insert(0.0))
    sm.insert(1.0)
    val q = sm.query(0.5) // target rank 5 of 9 -> the zero group
    assert(q.v == 0.0 && q.rmin == 8L && q.rmax == 8L,
      s"signed zeros must collapse to one rank-8 group: $q")
    intercept[IllegalArgumentException](QuantileSketch.groupQuantile(
      org.apache.spark.sql.functions.col("v"), p = 1.5))
    intercept[IllegalArgumentException](QuantileSketch.groupQuantile(
      org.apache.spark.sql.functions.col("v"), p = 0.5, capacity = 1 << 20))
  }

  test("persistable sketches: round trip, stored-merge parity, lossy intervals stay valid") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // unit round trip, exact and lossy
    val u = new QuantileSketch.Summary(16)
    (1 to 10).foreach(i => u.insert(i.toDouble))
    val back = QuantileSketch.deserialize(QuantileSketch.serialize(u))
    assert(back.n == 10L && back.isExact && back.query(0.5).v == u.query(0.5).v)
    val lossy = new QuantileSketch.Summary(8)
    (1 to 1000).foreach(i => lossy.insert(i.toDouble))
    val lb = QuantileSketch.deserialize(QuantileSketch.serialize(lossy))
    assert(!lb.isExact && lb.n == 1000L)
    // thinning keeps intervals collapsed at the retained value's exact
    // rank (the lossless flag, not the width, is the exactness
    // witness) — the round-tripped interval must still be the valid
    // rank of the returned value (values 1..1000 → rank(v) == v)
    val t = lb.query(0.5)
    assert(t.rmin <= t.v && t.v <= t.rmax, s"rank interval [${t.rmin}, ${t.rmax}] excludes ${t.v}")
    assert(t.v == lossy.query(0.5).v, "round trip changed the query result")
    intercept[IllegalArgumentException](QuantileSketch.deserialize(Array[Byte](7, 7)))
    // incremental: per-part sketches stored to parquet, merged from the
    // stored table alone; exact regime must equal the direct path
    val df = (0 until 5000).map(i => (i % 10, (i % 300).toDouble)).toDF("part", "v")
    val tmp = java.nio.file.Files.createTempDirectory("gk_inc").toFile
    try {
      df.groupBy(col("part")).agg(QuantileSketch.gkSketch(col("v")).as("s"))
        .write.parquet(s"$tmp/daily")
      val merged = spark.read.parquet(s"$tmp/daily")
        .agg(QuantileSketch.gkMerge(col("s")).as("t"))
        .select(QuantileSketch.gkQuantile(col("t"), 0.5).as("q"))
        .select(col("q.value"), col("q.rank_lo"), col("q.rank_hi"), col("q.exact")).head
      val direct = QuantileSketch.quantiles(df, col("v"), Seq(0.5))
        .select(col("value"), col("rank_lo"), col("rank_hi")).head
      assert(merged.getDouble(0) == direct.getDouble(0) &&
        merged.getLong(1) == direct.getLong(1) && merged.getLong(2) == direct.getLong(2) &&
        merged.getBoolean(3),
        s"stored-merge $merged != direct $direct")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }
}
