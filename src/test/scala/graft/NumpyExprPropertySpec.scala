package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.EzFrame
import graft.expr.NumpyExpr
import graft.expr.NumpyExpr._

/** Property tests (FIXTURES.md §4): random expression trees evaluated
  * by a NumPy-semantics reference interpreter vs the Spark
  * translation, elementwise over a fixture frame.
  *
  * Normalizations (SURVEY.md §7.1): Spark SQL yields null where NumPy
  * yields NaN for domain errors (log of non-positive, …) — compared as
  * equivalent.  Boolean results are only asserted when no NaN flowed
  * through the reference evaluation (NumPy comparisons with NaN are
  * all-False; Spark orders NaN greatest — a documented divergence). */
class NumpyExprPropertySpec extends SparkSpec {

  /** Offline stand-in for scalatestplus forAll: deterministic seeded
    * sampling straight from the ScalaCheck Gen. */
  private def forSamples(gen: Gen[Ast], n: Int)(check: Ast => Unit): Unit =
    (1 to n).foreach { i =>
      val ast = gen.pureApply(Gen.Parameters.default.withSize(8), Seed(i.toLong))
      check(ast)
    }

  private val cols = Vector("x", "y", "z")
  private val rows: Seq[Map[String, Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(40)(cols.map(_ -> (rnd.nextDouble() * 20 - 10)).toMap) ++
      Seq(cols.map(_ -> 0.0).toMap, cols.map(_ -> -1.0).toMap) // edge rows
  }

  private lazy val df = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(m => Row(cols.map(m): _*)), 2), schema)
  }
  private lazy val ez = EzFrame(df)

  // ---- generators ------------------------------------------------------
  private def genLeaf: Gen[Ast] = Gen.oneOf(
    Gen.oneOf(cols).map(Id(_)),
    Gen.chooseNum(-5.0, 5.0).map(d => Num(f"$d%.3f")),
    Gen.chooseNum(-4L, 4L).map(i => Num(i.toString)))

  private def genNum(depth: Int): Gen[Ast] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      2 -> genLeaf,
      4 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/")
        l <- genNum(depth - 1); r <- genNum(depth - 1)
      } yield Bin(op, l, r)),
      1 -> (for { l <- genNum(depth - 1); r <- Gen.chooseNum(0, 3).map(i => Num(i.toString)) }
        yield Bin("**", l, r)),
      1 -> genNum(depth - 1).map(Un("-", _)),
      2 -> (for {
        fn <- Gen.oneOf("log", "log10", "sqrt", "abs", "exp", "sin", "cos")
        x <- genNum(depth - 1)
      } yield Call(fn, List(x))),
      1 -> (for {
        fn <- Gen.oneOf("minimum", "maximum")
        a <- genNum(depth - 1); b <- genNum(depth - 1)
      } yield Call(fn, List(a, b))),
      1 -> (for {
        c <- genBool(depth - 1); a <- genNum(depth - 1); b <- genNum(depth - 1)
      } yield Call("where", List(c, a, b))))

  private def genBool(depth: Int): Gen[Ast] =
    if (depth <= 0)
      for { op <- Gen.oneOf("<", "<=", ">", ">=", "==", "!="); l <- genLeaf; r <- genLeaf }
        yield Bin(op, l, r)
    else Gen.frequency(
      3 -> (for {
        op <- Gen.oneOf("<", "<=", ">", ">=")
        l <- genNum(depth - 1); r <- genNum(depth - 1)
      } yield Bin(op, l, r)),
      2 -> (for {
        op <- Gen.oneOf("&", "|")
        l <- genBool(depth - 1); r <- genBool(depth - 1)
      } yield Bin(op, l, r)),
      1 -> genBool(depth - 1).map(Un("~", _)))

  // ---- reference (NumPy-semantics) evaluator ---------------------------
  // isInt models NumPy's dtype lattice: integer arithmetic has no -0.0
  // (the `+ 0.0` normalization), while float ops keep signed zeros.
  private final case class Ref(value: Double, sawNaN: Boolean, isInt: Boolean = false)
  private final case class RefB(value: Boolean, sawNaN: Boolean)

  private def evalNum(a: Ast, row: Map[String, Double]): Ref = a match {
    case Num(t) => Ref(t.toDouble, false, isInt = !t.contains('.') && !t.contains('e'))
    case Id(n) => Ref(row(n), row(n).isNaN)
    case Un("-", x) =>
      val r = evalNum(x, row)
      val v = if (r.isInt) -r.value + 0.0 else -r.value
      Ref(v, r.sawNaN || v.isNaN, r.isInt)
    case Bin(op, l, r) =>
      val a1 = evalNum(l, row); val a2 = evalNum(r, row)
      val bothInt = a1.isInt && a2.isInt
      val v0 = op match {
        case "+" => a1.value + a2.value
        case "-" => a1.value - a2.value
        case "*" => a1.value * a2.value
        case "/" => a1.value / a2.value
        case "**" => math.pow(a1.value, a2.value)
      }
      val isInt = bothInt && op != "/" && op != "**"
      val v = if (isInt) v0 + 0.0 else v0
      Ref(v, a1.sawNaN || a2.sawNaN || v.isNaN, isInt)
    case Call("where", List(c, x, y)) =>
      val cb = evalBool(c, row); val xv = evalNum(x, row); val yv = evalNum(y, row)
      val v0 = if (cb.value) xv.value else yv.value
      val isInt = xv.isInt && yv.isInt
      val v = if (isInt) v0 + 0.0 else v0
      Ref(v, cb.sawNaN || xv.sawNaN || yv.sawNaN || v.isNaN, isInt)
    case Call(fn, List(x)) =>
      val r = evalNum(x, row)
      val v = fn match {
        case "log" => math.log(r.value)
        case "log10" => math.log10(r.value)
        case "sqrt" => math.sqrt(r.value)
        case "abs" => math.abs(r.value)
        case "exp" => math.exp(r.value)
        case "sin" => math.sin(r.value)
        case "cos" => math.cos(r.value)
      }
      Ref(v, r.sawNaN || v.isNaN)
    case Call(fn, List(x, y)) =>
      val a1 = evalNum(x, row); val a2 = evalNum(y, row)
      val v = fn match {
        case "minimum" => math.min(a1.value, a2.value)
        case "maximum" => math.max(a1.value, a2.value)
      }
      Ref(v, a1.sawNaN || a2.sawNaN || v.isNaN, a1.isInt && a2.isInt)
    case other => throw new IllegalStateException(s"gen produced $other")
  }

  private def evalBool(a: Ast, row: Map[String, Double]): RefB = a match {
    case Bin(op, l, r) if Set("<", "<=", ">", ">=", "==", "!=").contains(op) =>
      val a1 = evalNum(l, row); val a2 = evalNum(r, row)
      val v = op match {
        case "<" => a1.value < a2.value
        case "<=" => a1.value <= a2.value
        case ">" => a1.value > a2.value
        case ">=" => a1.value >= a2.value
        case "==" => a1.value == a2.value
        case "!=" => a1.value != a2.value
      }
      RefB(v, a1.sawNaN || a2.sawNaN)
    case Bin("&", l, r) =>
      val b1 = evalBool(l, row); val b2 = evalBool(r, row)
      RefB(b1.value && b2.value, b1.sawNaN || b2.sawNaN)
    case Bin("|", l, r) =>
      val b1 = evalBool(l, row); val b2 = evalBool(r, row)
      RefB(b1.value || b2.value, b1.sawNaN || b2.sawNaN)
    case Un("~", x) => val b = evalBool(x, row); RefB(!b.value, b.sawNaN)
    case other => throw new IllegalStateException(s"gen produced $other")
  }

  // ---- properties ------------------------------------------------------
  private def sparkEval(ast: Ast): Seq[Option[Any]] = {
    val typed = NumpyExpr.compile(ast, name =>
      if (cols.contains(name)) Some(Typed(df.col(name), TyFloat)) else None)
    df.select(typed.col.cast(DoubleType).as("r")).collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
  }

  private def eqv(spark: Option[Any], ref: Double): Boolean = spark match {
    case None => ref.isNaN // SQL null ≡ NumPy NaN
    case Some(d: Double) =>
      if (d.isNaN) ref.isNaN
      else if (ref.isInfinite || d.isInfinite) d == ref
      else math.abs(d - ref) <= 1e-9 * math.max(1.0, math.abs(ref))
    case _ => false
  }

  test("numeric expressions agree elementwise with NumPy semantics") {
    forSamples(genNum(4), 120) { ast =>
      val got = sparkEval(ast)
      rows.zip(got).foreach { case (row, s) =>
        val ref = evalNum(ast, row)
        assert(eqv(s, ref.value),
          s"expr=$ast row=$row spark=$s ref=${ref.value}")
      }
    }
  }

  test("boolean predicates agree when no NaN flows through") {
    forSamples(genBool(4), 120) { ast =>
      val typed = NumpyExpr.compile(ast, name =>
        if (cols.contains(name)) Some(Typed(df.col(name), TyFloat)) else None)
      val got = df.select(typed.col.as("r")).collect().toSeq
        .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
      rows.zip(got).foreach { case (row, s) =>
        val ref = evalBool(ast, row)
        if (!ref.sawNaN) assert(s.contains(ref.value), s"expr=$ast row=$row spark=$s ref=${ref.value}")
      }
    }
  }

  test("round-trip: parse(pretty) — tokenizer accepts all generated shapes") {
    forSamples(genNum(3), 60) { ast =>
      // every generated tree must compile without throwing
      sparkEval(ast)
    }
  }
}
