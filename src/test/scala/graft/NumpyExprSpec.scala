package graft

import org.apache.spark.sql.functions._
import graft.core.EzFrame
import graft.expr.NumpyExpr

/** Translator semantics pinned against NumPy behavior
  * (ezdata/simpletable.py:2710–2747): Python precedence, `**` power,
  * bitwise-as-logical on booleans, ufunc surface. */
class NumpyExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 2.0, 10.0, true),
    (2L, 3.0, 100.0, false),
    (3L, -4.0, 1000.0, true),
    (4L, 0.5, 10000.0, false))
    .toDF("i", "x", "y", "b")
  private lazy val ez = EzFrame(df)

  private def evalDoubles(expr: String): Seq[Double] =
    df.select(ez.evalexpr(expr).cast("double")).collect().map(_.getDouble(0)).toSeq

  private def evalCount(cond: String): Long = ez.where(cond).count()

  test("power operator ** and right associativity") {
    assert(evalDoubles("x ** 2") == Seq(4.0, 9.0, 16.0, 0.25))
    // 2 ** 3 ** 2 = 2 ** 9 = 512 (right assoc)
    assert(evalDoubles("i * 0 + 2 ** 3 ** 2").head == 512.0)
  }

  test("python precedence: comparison binds looser than arithmetic, & needs parens") {
    assert(evalCount("(i > 1) & (x > 0)") == 2) // rows i=2 (x=3), i=4 (x=0.5)
    assert(evalCount("(i > 1) | (b == True)") == 4)
    assert(evalCount("~(i > 2)") == 2)
  }

  test("unary minus binds looser than **") {
    // -x**2 must parse as -(x**2)
    assert(evalDoubles("i * 0 - 2 ** 2").head == -4.0)
  }

  test("true division and floor division") {
    assert(evalDoubles("i / 2") == Seq(0.5, 1.0, 1.5, 2.0))
    assert(evalDoubles("i // 2") == Seq(0.0, 1.0, 1.0, 2.0))
    assert(evalDoubles("7 % 3").head == 1.0)
    // numpy floored mod: sign follows divisor
    assert(evalDoubles("(0 - 7) % 3").head == 2.0)
    assert(evalDoubles("(0 - 7) % (0 - 3)").head == -1.0)
    assert(evalDoubles("(0 - 7) // 3").head == -3.0)
    // numpy INTEGER division/mod by zero yields 0 (with a
    // RuntimeWarning), never an ANSI exception
    assert(evalDoubles("i // 0") == Seq(0.0, 0.0, 0.0, 0.0))
    assert(evalDoubles("i % 0") == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("integer floor division is exact past 2^53 (no double round-trip)") {
    import spark.implicits._
    val big = 4611686018427387905L // 2^62 + 1: rounds under a double round-trip
    val t = graft.core.EzFrame(Seq(big).toDF("a"))
    assert(t.df.select(t.evalexpr("a // 1").as("v")).collect().head.getLong(0) == big)
    assert(t.df.select(t.evalexpr("a % 1000000007").as("v")).collect().head.getLong(0)
      == big % 1000000007L)
  }

  test("string escapes follow Python: backslash-n is a newline, not the letter n") {
    import spark.implicits._
    val t = graft.core.EzFrame(Seq("\n", "n", "a\tb").toDF("sep"))
    assert(t.where("sep == '\\n'").count() == 1)
    assert(t.where("sep == 'n'").count() == 1)
    assert(t.where("sep == 'a\\tb'").count() == 1)
  }

  test("numeric escapes follow Python: \\xhh, octal runs, \\uXXXX, \\UXXXXXXXX") {
    import spark.implicits._
    def lit(expr: String): String = {
      val toks = graft.expr.NumpyExpr.tokenize(expr)
      toks.collectFirst { case graft.expr.NumpyExpr.TStr(v) => v }.get
    }
    assert(lit("'\\x41'") == "A")              // Python: '\x41' == 'A'
    assert(lit("'\\101'") == "A")              // octal 0o101 == 65
    assert(lit("'\\01'") == "\u0001")   // ONE char, never NUL + '1'
    assert(lit("'\\0'") == "\u0000")    // single-digit octal still NUL
    assert(lit("'\\7770'") == "\u01FF" + "0") // octal stops at 3 digits: \777 then '0'
    assert(lit("'\\u00e9'") == "é")
    assert(lit("'\\U0001F600'") == new String(Character.toChars(0x1F600)))
    assert(lit("'\\a\\v\\b\\f'") == "\u0007\u000B\b\f")
    assert(lit("'\\d'") == "\\d")              // unknown escape keeps the backslash
    // truncated numeric escapes are Python SyntaxErrors — loud, not silent
    assertThrows[IllegalArgumentException](lit("'\\x4'"))
    assertThrows[IllegalArgumentException](lit("'\\u00e'"))
    assertThrows[IllegalArgumentException](lit("'\\UFFFFFFFF'")) // out of code-point range
    assertThrows[IllegalArgumentException](lit("'\\N{BULLET}'")) // refused, never diverged
    // end-to-end through a predicate
    val t = graft.core.EzFrame(Seq("A", "x41").toDF("s"))
    assert(t.where("s == '\\x41'").count() == 1)
  }

  test("ufuncs: log10, sqrt, abs, where, clip, arctan2, minimum") {
    assert(evalDoubles("log10(y)") == Seq(1.0, 2.0, 3.0, 4.0))
    assert(evalDoubles("abs(x)") == Seq(2.0, 3.0, 4.0, 0.5))
    assert(evalDoubles("where(x > 0, 1, 0)") == Seq(1.0, 1.0, 0.0, 1.0))
    assert(evalDoubles("clip(x, 0, 1)") == Seq(1.0, 1.0, 0.0, 0.5))
    assert(evalDoubles("minimum(i, 2)") == Seq(1.0, 2.0, 2.0, 2.0))
    val at2 = evalDoubles("arctan2(1, 1)").head
    assert(math.abs(at2 - math.Pi / 4) < 1e-12)
  }

  test("constants and free variables (exprvars)") {
    assert(math.abs(evalDoubles("i * 0 + pi").head - math.Pi) < 1e-15)
    val c = df.select(ez.evalexpr("x * scale", Map("scale" -> 10.0)).cast("double"))
      .collect().map(_.getDouble(0))
    assert(c.toSeq == Seq(20.0, 30.0, -40.0, 5.0))
  }

  test("np. prefix accepted") {
    assert(evalDoubles("np.log10(y)") == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("string equality and identifiers collected") {
    val ast = NumpyExpr.parse("(a > 2) & (log10(b) < c)")
    assert(NumpyExpr.identifiers(ast) == Set("a", "b", "c"))
  }

  test("canonical reference query shape: (J > 2) & (10 ** logT > 5000)") {
    val t = Seq((2.5, 3.8), (1.0, 4.0), (3.0, 3.0)).toDF("J", "logT")
    val e = EzFrame(t).setAlias("logTe", "logT")
    assert(e.where("(J > 2) & (10 ** logTe > 5000)").count() == 1)
  }

  // ---- divergences found by the numpy differential harness
  // (tools/numpy_parity.py) and fixed in round 20; each case below is
  // the numpy array-path answer, pinned so CI holds without python.

  private def eval1(cols: Map[String, Any], expr: String): Double = {
    val t = cols.foldLeft(spark.range(1).toDF()) { case (d, (n, v)) =>
      v match {
        case dv: Double => d.withColumn(n, lit(dv))
        case lv: Long   => d.withColumn(n, lit(lv))
      }
    }
    EzFrame(t).df.select(EzFrame(t).evalexpr(expr).cast("double")).head().getDouble(0)
  }

  test("float mod: fmod+sign-fix construction (no quotient overflow, divmod inf rules)") {
    val nInf = Double.NegativeInfinity; val pInf = Double.PositiveInfinity
    // quotient -1e600 overflowed the old l - r*floor(l/r) identity to inf
    assert(eval1(Map("a" -> -1e300, "b" -> 1e-300), "a % b") == 5.108445149146398e-301)
    // infinite divisor: dividend when signs agree, divisor when they differ
    assert(eval1(Map("a" -> 5.0, "b" -> pInf), "a % b") == 5.0)
    assert(eval1(Map("a" -> -5.0, "b" -> pInf), "a % b") == pInf)
    assert(eval1(Map("a" -> 5.0, "b" -> nInf), "a % b") == nInf)
    assert(eval1(Map("a" -> -5.0, "b" -> nInf), "a % b") == -5.0)
    // zero divisor is NaN, never an ANSI REMAINDER_BY_ZERO
    assert(eval1(Map("a" -> 5.0), "a % 0.0").isNaN)
  }

  test("float floor division is MOD-CONSISTENT, not floor(a/b)") {
    // 7.0/0.1 rounds UP to exactly 70.0 (so naive floor says 70), but
    // fmod(7.0, 0.1) is nonzero — the dividend is just short of 70
    // steps — and Python/numpy return 69 (CPython float_floor_div)
    assert(eval1(Map("a" -> 7.0, "b" -> 0.1), "a // b") == 69.0)
    assert(eval1(Map("a" -> 2.0, "b" -> 0.1), "a // b") == 19.0)
    assert(eval1(Map("a" -> 3.0, "b" -> 0.1), "a // b") == 29.0)
    // ...while a quotient that IS exact stays exact
    assert(eval1(Map("a" -> 7.25, "b" -> 0.1), "a // b") == 72.0)
    assert(eval1(Map("a" -> 6.0, "b" -> 2.0), "a // b") == 3.0)
    // quotient overflow: |a/b| past double range floors to ±inf
    assert(eval1(Map("a" -> -1e300, "b" -> 1e-300), "a // b") == Double.NegativeInfinity)
  }

  test("(-0.0) ** 0.5 keeps the zero's sign (numpy routes 0.5 through sqrt); rint too") {
    // 1/(-0.0 ** 0.5) distinguishes -0.0 from 0.0 without signbit access
    assert(eval1(Map("a" -> -0.0), "1.0 / a ** 0.5") == Double.NegativeInfinity)
    assert(eval1(Map("a" -> 0.0), "1.0 / a ** 0.5") == Double.PositiveInfinity)
    assert(eval1(Map("a" -> -0.4), "rint(a) ** -1.0") == Double.NegativeInfinity)
    assert(eval1(Map("a" -> 0.4), "rint(a) ** -1.0") == Double.PositiveInfinity)
  }

  test("float floor division: infinite dividend is NaN; opposite-sign infinite divisor is -1") {
    val nInf = Double.NegativeInfinity; val pInf = Double.PositiveInfinity
    assert(eval1(Map("a" -> pInf, "b" -> 3.0), "a // b").isNaN)
    assert(eval1(Map("a" -> nInf, "b" -> -3.0), "a // b").isNaN)
    assert(eval1(Map("a" -> -5.0, "b" -> pInf), "a // b") == -1.0)
    assert(eval1(Map("a" -> 5.0, "b" -> nInf), "a // b") == -1.0)
    assert(eval1(Map("a" -> 5.0, "b" -> pInf), "a // b") == 0.0)
    // ...but an infinite dividend over a ZERO divisor is numpy's ±inf
    assert(eval1(Map("a" -> pInf), "a // 0.0") == pInf)
    assert(eval1(Map("a" -> 1.0), "a // 0.0") == pInf)
    assert(eval1(Map("a" -> 0.0), "a // 0.0").isNaN)
  }

  test("fmod: C semantics, NaN on zero divisor (float), 0 (int), int64 dtype kept") {
    assert(eval1(Map("a" -> 5.0), "fmod(a, 0.0)").isNaN)
    assert(eval1(Map("a" -> 7.25, "b" -> -2.0), "fmod(a, b)") == 1.25) // dividend's sign
    val t = Seq((7L, -3L), (-7L, 3L), (7L, 0L)).toDF("a", "b")
    val got = EzFrame(t).df.select(EzFrame(t).evalexpr("fmod(a, b)").as("m")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, -1L, 0L),
      "numpy fmod(int, int) stays int64; fmod(int, 0) is 0")
  }

  test("(-inf) ** 0.5 is NaN (numpy routes exponent 0.5 through sqrt); other exps IEEE") {
    val nInf = Double.NegativeInfinity; val pInf = Double.PositiveInfinity
    assert(eval1(Map("a" -> nInf), "a ** 0.5").isNaN)
    assert(eval1(Map("a" -> nInf), "power(a, 0.5)").isNaN)
    assert(eval1(Map("a" -> nInf), "a ** 1.5") == pInf)
    assert(eval1(Map("a" -> nInf), "a ** 2") == pInf)
    assert(eval1(Map("a" -> nInf), "a ** 3") == nInf)
  }

  test("shifts are exact past 2^53 (long arithmetic, not a double round-trip)") {
    val t = Seq((-9007199254740993L, 9007199254740993L)).toDF("n", "p") // ∓(2^53 + 1)
    val e = EzFrame(t)
    val row = e.df.select(e.evalexpr("n >> 3").as("r"), e.evalexpr("p << 1").as("l")).head()
    assert(row.getLong(0) == -1125899906842625L, "arithmetic >> floors (old path was off by one)")
    assert(row.getLong(1) == 18014398509481986L, "<< keeps bits a double would round away")
  }

  test("arctan2 sees the sign of a zero (Spark's builtin erases it)") {
    val negZ = -0.0
    assert(eval1(Map("y" -> negZ, "x" -> -1.0), "arctan2(y, x)") == -math.Pi)
    assert(eval1(Map("y" -> 0.0, "x" -> negZ), "arctan2(y, x)") == math.Pi)
    assert(eval1(Map("y" -> negZ, "x" -> negZ), "arctan2(y, x)") == -math.Pi)
    assert(eval1(Map("y" -> 1.0, "x" -> negZ), "arctan2(y, x)") == math.Pi / 2)
    assert(eval1(Map("y" -> -1.0, "x" -> 0.0), "arctan2(y, x)") == -math.Pi / 2)
  }

  test("pow is C pow at the |base|==1 corners Java Math.pow loses (r21 PyArith kernel)") {
    // C99 F.10.4.4 / numpy: 1**b = 1 for EVERY b (including NaN and
    // ±inf) and (-1)**±inf = 1; Java's Math.pow returns NaN for all
    // of them.  The exponent-0.5 sqrt routing must survive the kernel
    // move: (-0.0)**0.5 = sqrt(-0.0) = -0.0, (-inf)**0.5 = NaN.
    assert(eval1(Map("a" -> 1.0, "b" -> Double.NaN), "a ** b") == 1.0)
    assert(eval1(Map("a" -> 1.0, "b" -> Double.PositiveInfinity), "a ** b") == 1.0)
    assert(eval1(Map("a" -> -1.0, "b" -> Double.PositiveInfinity), "a ** b") == 1.0)
    assert(eval1(Map("a" -> -1.0, "b" -> Double.NegativeInfinity), "a ** b") == 1.0)
    assert(eval1(Map("a" -> Double.NaN, "b" -> 0.0), "a ** b") == 1.0)
    assert(java.lang.Double.doubleToRawLongBits(
      eval1(Map("a" -> -0.0, "b" -> 0.5), "a ** b")) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(eval1(Map("a" -> Double.NegativeInfinity, "b" -> 0.5), "a ** b").isNaN)
  }

  test("null inputs to arctan2 / ** / arcsinh render NaN (never-null kernels, pinned r22)") {
    // The r21 PyArith kernels (PyAtan2Expr/PyPowExpr/PyAsinhExpr) are
    // never-null: a null operand reads as NaN, matching the layer's
    // existing null-as-NaN float convention (pyDiv/pyMod) — where the
    // old Column compositions propagated null.  Intentional; pinned so
    // the contract is explicit rather than incidental (r21 ADVICE).
    // base 2.0, NOT 1.0: the null exponent reads as NaN and 1**NaN is
    // the C99 corner that returns 1 (pinned above) — 2**NaN is NaN
    val t = Seq((Option(2.0), Option.empty[Double])).toDF("x", "ynull")
    val e = EzFrame(t)
    val r = e.df.select(
      e.evalexpr("arctan2(ynull, x)").cast("double").as("a"),
      e.evalexpr("x ** ynull").cast("double").as("p"),
      e.evalexpr("arcsinh(ynull)").cast("double").as("s")).head()
    assert(!r.isNullAt(0) && r.getDouble(0).isNaN, "arctan2(null, x) must be NaN, not null")
    assert(!r.isNullAt(1) && r.getDouble(1).isNaN, "x ** null must be NaN, not null")
    assert(!r.isNullAt(2) && r.getDouble(2).isNaN, "arcsinh(null) must be NaN, not null")
  }

  test("arcsinh is accurate for tiny and huge inputs (stable log1p form)") {
    assert(eval1(Map("a" -> 1e-300), "arcsinh(a)") == 1e-300)
    assert(eval1(Map("a" -> -1e-17), "arcsinh(a)") == -1e-17)
    val big = eval1(Map("a" -> 1e300), "arcsinh(a)")
    assert(math.abs(big - 691.4686750787737) < 1e-10)
    assert(eval1(Map("a" -> Double.NegativeInfinity), "arcsinh(a)") == Double.NegativeInfinity)
    assert(eval1(Map("a" -> 0.0), "arcsinh(a)") == 0.0)
  }

  test("zero results carry numpy's signs: mod copysigns to the divisor; floor/ceil/trunc are IEEE") {
    // observed through 1/x — the sign of a zero decides the infinity
    assert(eval1(Map("a" -> 0.5, "b" -> -0.5), "1.0 / (a % b)") == Double.NegativeInfinity,
      "mod's ZERO remainder takes the divisor's sign (numpy copysigns it)")
    assert(eval1(Map("a" -> -4.0, "b" -> 2.0), "1.0 / (a % b)") == Double.PositiveInfinity)
    assert(eval1(Map("a" -> 0.0), "1.0 / ceil(a)") == Double.PositiveInfinity,
      "ceil(+0.0) is +0.0 (the -floor(-x) long round-trip manufactured -0.0)")
    assert(eval1(Map("a" -> -0.4), "1.0 / ceil(a)") == Double.NegativeInfinity)
    assert(eval1(Map("a" -> -0.0), "1.0 / floor(a)") == Double.NegativeInfinity,
      "floor(-0.0) is -0.0 (the long round-trip erased it)")
    assert(eval1(Map("a" -> -0.4), "1.0 / trunc(a)") == Double.NegativeInfinity)
    // CPython copysigns a ZERO floor-division quotient to the TRUE
    // quotient's sign: -1.1 // -2.7 is +0.0 (floor(-0.0) would say -0.0)
    assert(eval1(Map("a" -> -1.1, "b" -> -2.7), "1.0 / (a // b)") == Double.PositiveInfinity)
    assert(eval1(Map("a" -> 1.1, "b" -> -2.7), "a // b") == -1.0,
      "a NONZERO opposite-sign quotient still floors to -1")
    assert(eval1(Map("a" -> -0.0, "b" -> 2.7), "1.0 / (a // b)") == Double.NegativeInfinity,
      "a -0.0 dividend keeps the true quotient's negative zero")
    // ...and the double-preserving contract holds through the kernels
    assert(eval1(Map("a" -> Double.NaN), "floor(a)").isNaN)
    assert(eval1(Map("a" -> Double.PositiveInfinity), "ceil(a)") == Double.PositiveInfinity)
    assert(eval1(Map("a" -> 1e300), "trunc(a)") == 1e300)
  }

  test("fmin/fmax SKIP NaN (minimum/maximum propagate it)") {
    val nan = Double.NaN
    assert(eval1(Map("a" -> 3.5, "b" -> nan), "fmax(a, b)") == 3.5)
    assert(eval1(Map("a" -> nan, "b" -> 2.0), "fmax(a, b)") == 2.0)
    assert(eval1(Map("a" -> nan, "b" -> nan), "fmax(a, b)").isNaN)
    assert(eval1(Map("a" -> 3.5, "b" -> nan), "fmin(a, b)") == 3.5)
    assert(eval1(Map("a" -> 3.5, "b" -> nan), "maximum(a, b)").isNaN)
    assert(eval1(Map("a" -> 3.5, "b" -> nan), "minimum(a, b)").isNaN)
  }
}
