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

  test("floor/ceil/trunc/floordiv propagate NaN and infinity like NumPy") {
    import org.apache.spark.sql.functions.col
    val df = spark.sql(
      """SELECT * FROM VALUES (double('NaN'), 0.0d), (5.0d, 0.0d), (1e20d, 2.0d),
         (-2.5d, 2.0d) AS t(a, b)""")
    val e = graft.core.EzFrame(df)
    val out = e.df.select(
      e.evalexpr("floor(a)").as("fl"), e.evalexpr("ceil(a)").as("ce"),
      e.evalexpr("trunc(a)").as("tr"), e.evalexpr("a // b").as("fd"),
      e.evalexpr("a % b").as("md")).collect()
    // row 0: NaN operand -> NaN everywhere (the old LongType floor made it 0)
    assert(out(0).getDouble(0).isNaN && out(0).getDouble(1).isNaN && out(0).getDouble(2).isNaN)
    assert(out(0).getDouble(3).isNaN && out(0).getDouble(4).isNaN)
    // row 1: 5.0 // 0.0 = inf (not Long.MaxValue), 5.0 % 0.0 = NaN
    assert(out(1).getDouble(3).isPosInfinity && out(1).getDouble(4).isNaN)
    // row 2: 1e20 passes through unharmed (the old trunc cast crashed under ANSI)
    assert(out(2).getDouble(0) == 1e20 && out(2).getDouble(2) == 1e20)
    // row 3: sign conventions unchanged on finite input
    assert(out(3).getDouble(0) == -3.0 && out(3).getDouble(1) == -2.0 && out(3).getDouble(2) == -2.0)
    assert(out(3).getDouble(3) == -2.0 && out(3).getDouble(4) == 1.5) // floored mod, sign of divisor
  }

  test("log1p is accurate for tiny arguments") {
    val df = spark.sql("SELECT 1e-18d AS x")
    val v = graft.core.EzFrame(df).df.select(
      graft.core.EzFrame(df).evalexpr("log1p(x)")).collect().head.getDouble(0)
    assert(v == 1e-18, s"log1p(1e-18) = $v (catastrophic cancellation)")
  }
}
