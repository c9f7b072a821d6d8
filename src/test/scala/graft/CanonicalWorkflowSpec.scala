package graft

import org.apache.spark.sql.functions._
import graft.core.EzFrame
import graft.sources.CommentedCsv

/** The reference's canonical end-to-end workflow (README.md:101–116,
  * SURVEY.md §7.3): read a commented-header CSV, set an alias, run
  * `selectWhere` with a NumPy expression through the alias, take
  * stats, write back out, and query the round-tripped file. */
class CanonicalWorkflowSpec extends SparkSpec {
  import spark.implicits._

  test("README slice: csv -> alias -> selectWhere -> stats -> write -> reread") {
    // a stellar-photometry-shaped table (FIXTURES.md §2)
    val phot = Seq(
      (1.0, 3.80, 2.1, 2.5), // 10**3.8 = 6310 K, J>2 -> selected
      (2.0, 3.90, 2.9, 1.5), // J too small
      (3.0, 3.65, 1.2, 3.5), // 10**3.65 = 4467 K -> too cool
      (4.0, 3.75, 1.8, 2.2)) // 5623 K, J>2 -> selected
      .toDF("M_ini", "logTe", "logL", "J")
    val src = java.nio.file.Files.createTempFile("canon", ".csv").toString
    CommentedCsv.write(
      EzFrame(phot).setHeader("NAME", "phot").setUnit("logTe", "dex(K)"), src)

    val t = CommentedCsv.read(spark, src).setAlias("logT", "logTe")
    val q = t.selectWhere("logT logL", "(J > 2) & (10 ** logT > 5000)")
    assert(q.columns == Seq("logTe", "logL"))
    assert(q.count() == 2)

    val st = q.stats().collect().map(r => r.getAs[String]("column") -> r.getAs[Double]("mean")).toMap
    assert(math.abs(st("logTe") - 3.775) < 1e-9)
    assert(math.abs(st("logL") - 1.95) < 1e-9)

    val out = java.nio.file.Files.createTempFile("canon_out", ".csv").toString
    CommentedCsv.write(q, out)
    val back = CommentedCsv.read(spark, out)
    assert(back.count() == 2)
    assert(back.columns == Seq("logTe", "logL"))
  }

  test("grouped facet analysis (README astro example shape)") {
    val cat = Seq(
      (1, 0.5), (1, 0.7), (1, 0.9), (2, 1.5), (2, 1.7))
      .toDF("BRK", "AV")
    val facets = graft.plot.Plotter(EzFrame(cat))
      .groupby("BRK").hist("AV", bins = 4)
    assert(facets.facets.size == 2)
    val counts = facets.facets.map(_._2.data.map(_("count").asInstanceOf[Long]).sum)
    assert(counts == Seq(3L, 2L))
    // norm transform on the aggregated grid
    val normed = facets.facets.head._2.normalized("count", "log")
    assert(normed.data.nonEmpty)
  }
}
