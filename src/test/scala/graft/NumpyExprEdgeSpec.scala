package graft

import org.apache.spark.sql.functions._
import graft.core.{EzFrame, EzMeta}

class NumpyExprEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 5L, 2.0, "G2", true),
    (2L, 3L, 8.0, "B5", false),
    (3L, 12L, 1.0, "G8", true))
    .toDF("i", "flags", "x", "sptype", "ok")
  private lazy val ez = EzFrame(df)

  test("string equality and inequality in predicates") {
    assert(ez.where("sptype == 'G2'").count() == 1)
    assert(ez.where("sptype != 'G2'").count() == 2)
    // string concatenation with +
    val s = df.select(ez.evalexpr("sptype + '!'")).collect().map(_.getString(0))
    assert(s.toSeq == Seq("G2!", "B5!", "G8!"))
  }

  test("& | ^ on integers are bitwise, on booleans logical") {
    val band = df.select(ez.evalexpr("flags & 4").cast("long")).collect().map(_.getLong(0))
    assert(band.toSeq == Seq(4L, 0L, 4L))
    val bor = df.select(ez.evalexpr("flags | 1").cast("long")).collect().map(_.getLong(0))
    assert(bor.toSeq == Seq(5L, 3L, 13L))
    assert(ez.where("ok & (x > 0.5)").count() == 2)
  }

  test("shift operators with variable counts") {
    val shl = df.select(ez.evalexpr("i << 2").cast("long")).collect().map(_.getLong(0))
    assert(shl.toSeq == Seq(4L, 8L, 12L))
    val shr = df.select(ez.evalexpr("flags >> 1").cast("long")).collect().map(_.getLong(0))
    assert(shr.toSeq == Seq(2L, 1L, 6L))
    val shv = df.select(ez.evalexpr("1 << i").cast("long")).collect().map(_.getLong(0))
    assert(shv.toSeq == Seq(2L, 4L, 8L)) // variable shift count
  }

  test("caseless frame resolves mixed-case identifiers inside expressions") {
    val cl = EzFrame(df, EzMeta(caseless = true))
    assert(cl.where("SPTYPE == 'G2'").count() == 1)
    assert(cl.where("X > 1.5").count() == 2)
  }

  test("alias chains resolve inside expressions and projections together") {
    val a = ez.setAlias("idx", "i").setAlias("brightness", "x")
    val q = a.selectWhere("idx brightness", "(idx >= 2) & (brightness < 5)")
    assert(q.columns == Seq("i", "x"))
    assert(q.count() == 1) // only (i=3, x=1.0); (i=2, x=8.0) fails brightness<5
  }

  test("exprvars accept Columns for composition") {
    val c = df.select(ez.evalexpr("x * boost", Map("boost" -> col("i").cast("double"))).cast("double"))
      .collect().map(_.getDouble(0))
    assert(c.toSeq == Seq(2.0, 16.0, 3.0))
  }

  test("and/or/not keywords work as logical operators") {
    assert(ez.where("ok and (x > 1.5)").count() == 1)
    assert(ez.where("ok or (x > 5)").count() == 3)
    assert(ez.where("not ok").count() == 1)
  }

  test("scientific notation and float edge literals") {
    assert(ez.where("x > 1.5e0").count() == 2)
    assert(ez.where("x < 1e1").count() == 3)
  }
}
