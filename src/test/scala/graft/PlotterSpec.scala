package graft

import org.apache.spark.sql.functions._
import graft.core.EzFrame
import graft.plot.Plotter

class PlotterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1.0, 10.0, "a"), (2.0, 20.0, "a"), (3.0, 30.0, "b"),
    (4.0, 40.0, "b"), (5.0, 50.0, "b"))
    .toDF("x", "y", "g")
  private lazy val p = Plotter(EzFrame(df))

  test("hist aggregates in cluster and emits binned bar data") {
    val spec = p.hist("x", bins = 5, range = Some((0.0, 5.0)))
    assert(spec.mark == "bar")
    assert(spec.data.length == 5)
    assert(spec.data.map(_("count").asInstanceOf[Long]).sum == 5L)
    val vl = spec.toVegaLite
    assert(vl.contains("\"mark\": \"bar\"") && vl.contains("vega-lite"))
  }

  test("toVegaLite emits parseable JSON even with quotes/NaN in data") {
    val spec = graft.plot.PlotSpec("point",
      Seq(Map[String, Any]("label" -> "say \"hi\"\\path", "v" -> Double.NaN, "w" -> 1.5)),
      Map("x" -> Map("field" -> "v", "type" -> "quantitative")))
    val vl = spec.toVegaLite
    // parse through Spark's JSON reader — throws on malformed JSON
    import spark.implicits._
    val parsed = spark.read.option("mode", "FAILFAST").json(Seq(vl).toDS)
    assert(!parsed.columns.isEmpty)
    assert(vl.contains("null")) // NaN serialized as null, not bare NaN
  }

  test("groupby facets with shared axes; nested groupby; group algebra") {
    val g = p.groupby("g")
    assert(g.size == 2)
    val f = g.hist("x", bins = 5)
    assert(f.facets.map(_._1) == Seq("g=a", "g=b"))
    // shared range: every facet has the same bins
    val counts = f.facets.map(_._2.data.map(_("count").asInstanceOf[Long]).sum)
    assert(counts == Seq(2L, 3L))
    assert((g + g).size == 4)
  }

  test("select builds one plotter per predicate") {
    val g = p.select("low" -> "x < 3", "high" -> "x >= 3")
    assert(g.items.map(_._2.ez.count()) == Seq(2L, 3L))
  }

  test("scatter respects the point budget") {
    val big = EzFrame(spark.range(100000).select(col("id").cast("double").as("x"),
      (col("id") * 2).cast("double").as("y")))
    val spec = new Plotter(big).scatter("x", "y", maxPoints = 500)
    assert(spec.data.length < 2500) // sampled, not collected wholesale
  }

  test("box computes percentile aggregates per variable") {
    val spec = p.box("x", "y")
    assert(spec.data.length == 2)
    val xrow = spec.data.find(_("variable") == "x").get
    assert(xrow("median").asInstanceOf[Double] == 3.0)
    assert(xrow("min").asInstanceOf[Double] == 1.0 && xrow("max").asInstanceOf[Double] == 5.0)
  }

  test("raster viewport re-aggregation") {
    val spec = p.raster("x", "y", 0.0, 5.0, 0.0, 50.0, widthPx = 5, heightPx = 5)
    assert(spec.data.nonEmpty)
    assert(spec.data.map(_("value").asInstanceOf[Long]).sum == 5L)
    val zoomed = p.raster("x", "y", 0.0, 2.5, 0.0, 25.0, 5, 5)
    assert(zoomed.data.map(_("value").asInstanceOf[Long]).sum == 2L)
  }

  test("lagplot pairs x with its lag") {
    val spec = p.lagplot("x", lag = 1, orderBy = "x")
    assert(spec.data.length == 4)
    assert(spec.data.head.contains("x_lag1"))
  }

  test("allAgainst melts every var against the key") {
    val specs = p.allAgainst("x")
    assert(specs.map(_._1).toSet == Set("y", "g"))
  }

  test("pairGrid builds the full panel matrix") {
    val grid = p.pairGrid(Seq("x", "y"), bins = 4)
    assert(grid.size == 4)
    val byKey = grid.toMap
    assert(byKey(("x", "x")).mark == "bar")   // diagonal: 1-D hist
    assert(byKey(("x", "y")).mark == "rect")  // off-diagonal: 2-D hist
  }

  test("corner: lower triangle + diagonal + quantile annotations") {
    val c = p.corner(Seq("x", "y"), bins = 4)
    assert(c.panels.map(_._1).toSet == Set(("x", "x"), ("x", "y"), ("y", "y")))
    val (p16, p50, p84) = c.quantiles("x")
    assert(p16 <= p50 && p50 <= p84)
    assert(p50 == 3.0)
  }

  test("hexbin: points near the same hex center share a cell, distant points don't") {
    val pts = Seq(
      (0.0, 0.0), (0.1, 0.05), (-0.1, -0.05), // cluster at origin
      (10.0, 10.0))                            // far away
      .toDF("x", "y")
    val h = graft.operators.Binned.hexbin(pts, col("x"), col("y"), size = 1.0, aspect = 1.0,
      Seq(count(lit(1)).as("n")))
    val cells = h.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells.values.sum == 4L)
    assert(cells((0L, 0L)) == 3L) // the origin cluster lands in cell (0,0)
    assert(cells.size == 2)
    val spec = p.hexbin("x", "y", size = 2.0)
    assert(spec.data.map(_("count").asInstanceOf[Long]).sum == 5L)
  }

  test("raster supports count_cat-style categorical aggregation") {
    val r = graft.operators.Binned.cube(df,
      Seq(graft.operators.Binned.Axis("px", col("x"), 0.0, 5.0, 2)),
      Seq(count(lit(1)).as("n")))
    assert(r.count() == 2)
    // categorical dimension = extra group key (ezdata count_cat)
    val rc = df.groupBy(
        graft.operators.Binned.Axis("px", col("x"), 0.0, 5.0, 2).bucket.as("px_bin"), col("g"))
      .count()
    assert(rc.count() == 2) // cells (0,a) and (1,b); x=5 upper edge joins bin 1
  }

  test("rasterCat pivots bounded categories and rejects high cardinality") {
    val rc = graft.operators.Binned.rasterCat(df, col("x"), col("y"),
      0.0, 5.0, 0.0, 50.0, 2, 2, col("g"))
    assert(rc.columns.toSet == Set("px_bin", "py_bin", "a", "b"))
    val big = spark.range(1000).selectExpr("cast(id as double) x", "cast(id as double) y", "id g")
    val err = intercept[IllegalArgumentException](
      graft.operators.Binned.rasterCat(big, col("x"), col("y"),
        0.0, 1000.0, 0.0, 1000.0, 2, 2, col("g"), maxCategories = 100))
    assert(err.getMessage.contains("maxCategories"))
  }

  test("groupby guards the driver against high-cardinality keys") {
    import org.apache.spark.sql.functions.expr
    val wide = spark.range(50).selectExpr("cast(id as double) as x",
      "cast(id as double) as y", "concat('g', id) as g")
    val pl = new graft.plot.Plotter(graft.core.EzFrame(wide))
    val ex = intercept[IllegalArgumentException] { pl.groupby("g", maxGroups = 10) }
    assert(ex.getMessage.contains("more than 10 groups"))
    assert(pl.groupby("g", maxGroups = 50).items.size == 50)
  }

  test("scatter sampling is one bounded job (TakeOrderedAndProject, no count)") {
    val big = spark.range(20000).selectExpr("cast(id as double) as x", "cast(id % 97 as double) as y")
    val pl = new graft.plot.Plotter(graft.core.EzFrame(big))
    val spec = pl.scatter("x", "y", maxPoints = 500)
    assert(spec.data.size == 500)
    // deterministic: same call, same sample
    assert(pl.scatter("x", "y", maxPoints = 500).data == spec.data)
  }

  test("violin aggregates a density curve per variable (never raw rows)") {
    val spec = p.violin(Seq("x", "y"), bins = 10)
    assert(spec.mark == "area")
    val byVar = spec.data.groupBy(_("variable"))
    assert(byVar.keySet == Set("x", "y"))
    // each curve integrates to ~1 (probability density over the extent)
    byVar.values.foreach { curve =>
      assert(curve.length == 10)
      val xs = curve.map(_("x").asInstanceOf[Double]).sorted
      val width = xs(1) - xs(0)
      val integral = curve.map(_("density").asInstanceOf[Double] * width).sum
      assert(math.abs(integral - 1.0) < 1e-6, s"density integral $integral")
    }
  }

  test("pivotPlot builds the 2-key facet grid with bounded cells") {
    val df2 = Seq(
      (1.0, "a", "u"), (2.0, "a", "v"), (3.0, "b", "u"), (4.0, "b", "v"), (5.0, "b", "v"))
      .toDF("x", "k1", "k2")
    val grid = Plotter(EzFrame(df2)).pivotPlot("k1", "k2",
      cell => cell.hist("x", bins = 4, range = Some((0.0, 6.0))))
    assert(grid.xKeys == Seq("a", "b") && grid.yKeys == Seq("u", "v"))
    assert(grid.cells.size == 4)
    // cell (b, v) holds rows x=4 and x=5 only
    val bv = grid.cells(("b", "v"))
    assert(bv.data.map(_("count").asInstanceOf[Long]).sum == 2L)
    // cardinality guard
    val big = spark.range(200).selectExpr("cast(id as double) x", "id % 20 k1", "id % 20 k2")
    val err = intercept[IllegalArgumentException](
      Plotter(EzFrame(big)).pivotPlot("k1", "k2", _.hist("x", 2), maxCells = 10))
    assert(err.getMessage.contains("maxCells"))
  }

  test("apply hooks hand the frame to an arbitrary function") {
    val n = p(_.count())
    assert(n == 5L)
    val perFacet = p.groupby("g")(_.count())
    assert(perFacet.toMap == Map("g=a" -> 2L, "g=b" -> 3L))
  }
}
