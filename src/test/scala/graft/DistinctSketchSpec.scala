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

  test("perGroup accepts expression group columns") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"v${i % 7}")).toDF("id", "v")
    val out = graft.operators.DistinctSketch.perGroup(
      df, Seq((col("id") % 10).as("bucket")), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 10 && out.values.forall(n => n >= 1 && n <= 7), s"$out")
  }
}
