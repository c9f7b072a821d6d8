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
}
