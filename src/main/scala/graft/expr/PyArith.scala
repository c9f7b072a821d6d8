package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Python/NumPy float arithmetic (`/`, `%`, `//`) as single Catalyst
  * expressions with codegen.
  *
  * Two reasons these are custom nodes instead of Column compositions
  * (the shape [[NumpyExpr]] used before round 20):
  *
  *  1. **AST size.**  The Column form of Python's mod-consistent floor
  *     division references each operand 15–25 times (fmod, sign fix,
  *     quotient, floor, half-step correction, divmod special cases).
  *     Operand references duplicate the operand's whole subtree, so
  *     nested arithmetic (`a // b // c % d`) grew EXPONENTIALLY —
  *     measured as a driver OOM planning ~400 fuzz expressions.  A
  *     named binary node binds each operand exactly once at any depth.
  *  2. **Semantics in one place.**  Spark's own `/` returns null for a
  *     zero divisor (Hive heritage) and its `%` throws
  *     REMAINDER_BY_ZERO under ANSI; numpy wants IEEE infinities and
  *     NaNs.  The JVM's double arithmetic IS IEEE, so the scalar
  *     kernels below are small and exactly the numpy/CPython
  *     algorithms (verified by tools/numpy_parity.py against numpy's
  *     array path, including signed zeros, infinite dividends/
  *     divisors, and quotient overflow).
  *
  * Null convention: a null operand stands for a NumPy domain-error NaN
  * (the engine-wide rule), so these nodes map null inputs to NaN and
  * never return null — `doGenCode` emits one static call and the
  * expressions stay inside whole-stage codegen.
  */
object PyArith {

  /** numpy true division: IEEE `a / b` (0/0 = NaN, x/±0 = ±inf with
    * the zero's sign — plain JVM double division does all of it). */
  def pyDiv(a: Double, b: Double): Double = a / b

  /** numpy `mod`/`%`: C fmod moved to the divisor's sign — the
    * construction numpy itself uses.  mod(a, 0) = NaN; an infinite
    * divisor keeps a same-signed finite dividend (mod(5, inf) = 5)
    * and returns the divisor otherwise (mod(-5, inf) = inf).  A ZERO
    * remainder also carries the divisor's sign (numpy copysigns it:
    * mod(0.5, -0.5) is -0.0) — feeding arctan2 or 1/x, the wrong zero
    * sign flips the answer by π or to the wrong infinity. */
  def pyMod(a: Double, b: Double): Double = {
    val r0 = a % b // JVM % on doubles is C fmod; NaN for b == 0 or a infinite
    if (r0 == 0.0) Math.copySign(0.0, b)
    else if ((r0 < 0.0) != (b < 0.0)) r0 + b
    else r0
  }

  /** CPython float_floor_div, the MOD-CONSISTENT floor division —
    * NOT floor(a/b): 7.0/0.1 rounds up to exactly 70.0 so the naive
    * floor says 70, but fmod(7.0, 0.1) is nonzero and Python/numpy
    * return 69.  q = (a - pyMod)/b, floored, +1 when division noise
    * left it more than half a step low.  Divmod conventions: an
    * infinite dividend over a finite nonzero divisor is NaN; an
    * infinite divisor gives 0 (same signs / zero dividend) or -1
    * (opposite signs); a zero divisor is the floored IEEE divide
    * (±inf / NaN). */
  def pyFloorDiv(a: Double, b: Double): Double = {
    if (a.isNaN || b.isNaN) return Double.NaN
    if (b == 0.0) return math.floor(a / b)
    if (a.isInfinite) return Double.NaN
    if (b.isInfinite) {
      if (a == 0.0 || (a > 0.0) == (b > 0.0)) return a / b // ±0, sign of the quotient
      return -1.0
    }
    val m = pyMod(a, b)
    val div = (a - m) / b
    // CPython float_floor_div's zero-quotient arm: a ZERO quotient is
    // copysigned to the TRUE quotient's sign (-1.1 // -2.7 is +0.0),
    // where floor((a-m)/b) = floor(-0.0) would keep the artifact sign
    // of the division that produced it
    if (div == 0.0) return Math.copySign(0.0, a / b)
    val fd = math.floor(div)
    if (div - fd > 0.5) fd + 1.0 else fd
  }

  /** numpy int64 floor division: exact at every long magnitude
    * (Math.floorDiv — no double or decimal round-trip), divisor 0
    * yields 0 (numpy's integer convention, with a RuntimeWarning we
    * don't mirror).  The one unrepresentable quotient,
    * Long.MinValue // -1, throws (java.lang.ArithmeticException) —
    * the documented loud-beats-silent-wrap deviation from numpy. */
  def pyLongFloorDiv(a: Long, b: Long): Long =
    if (b == 0L) 0L else Math.floorDiv(a, b)

  /** numpy int64 floored mod (sign follows the divisor; exact in
    * longs; divisor 0 yields 0). */
  def pyLongMod(a: Long, b: Long): Long =
    if (b == 0L) 0L else Math.floorMod(a, b)

  // numpy floor/ceil/trunc/rint are C libm, and java.lang.Math's
  // floor/ceil/rint are the SAME IEEE-754 operations — exact past
  // 2^53, NaN/±inf-correct, and zero-SIGN-preserving (floor(-0.0) is
  // -0.0; ceil(-0.4) is -0.0; rint(-0.4) is -0.0).  The Column forms
  // these replace round-tripped through Spark's long-valued floor
  // (erasing zero signs: ceil(+0.0) came back -0.0 via -floor(-x))
  // and bround (rint(-0.4) came back +0.0).
  def pyFloor(a: Double): Double = Math.floor(a)
  def pyCeil(a: Double): Double = Math.ceil(a)
  def pyTrunc(a: Double): Double = if (a < 0.0) Math.ceil(a) else Math.floor(a)
  def pyRint(a: Double): Double = Math.rint(a) // half-to-even, like numpy

  /** numpy arctan2 = C atan2, and Java's Math.atan2 IS that function —
    * including the signed-zero quadrants (atan2(-0.0, -1.0) = -π) that
    * Spark's Atan2 erases by adding 0.0 to both operands for Hive
    * compatibility.  The Column workaround this replaces probed the
    * zero sign through a cast-to-string per row and referenced each
    * operand ~4 times (the exponential-AST hazard the PyArith tier
    * exists to kill). */
  def pyAtan2(y: Double, x: Double): Double = Math.atan2(y, x)

  /** numpy arcsinh, stable at both ends: Spark's asinh is
    * log(x + sqrt(x² + 1)) which collapses to 0 below ~1e-16; the
    * log1p form with the x²/(1+sqrt) correction is exact there, and
    * above 1e150 (x² would overflow) asinh(x) ≈ sign·(ln|x| + ln 2)
    * to well under 1e-12 relative.  Signed zero passes through
    * (asinh(-0.0) = -0.0); the sign transfer multiplies by ±1.0,
    * bit-identical to the signum(x)·v Column form it replaces. */
  def pyAsinh(x: Double): Double = {
    if (x != x) return Double.NaN
    if (x == 0.0) return x
    val s = Math.signum(x)
    val a = Math.abs(x)
    if (a > 1e150) s * (Math.log(a) + 0.6931471805599453)
    else s * Math.log1p(a + a * a / (1.0 + Math.sqrt(a * a + 1.0)))
  }

  /** numpy pow: C pow semantics, with numpy's exponent-0.5 routing
    * through sqrt ((-0.0)**0.5 = -0.0, (-inf)**0.5 = NaN).  The two
    * C-pow corners Java's Math.pow gets wrong (C99 F.10.4.4, verified
    * against numpy): 1**b = 1 for EVERY b including NaN/±inf, and
    * (-1)**±inf = 1; Math.pow returns NaN for all three. */
  def pyPow(a: Double, b: Double): Double =
    if (b == 0.5) Math.sqrt(a)
    else if (a == 1.0) 1.0
    else if (a == -1.0 && b.isInfinite) 1.0
    else Math.pow(a, b)

  def div(l: Column, r: Column): Column = wrap(PyDivExpr, l, r)
  def mod(l: Column, r: Column): Column = wrap(PyModExpr, l, r)
  def atan2(y: Column, x: Column): Column = wrap(PyAtan2Expr, y, x)
  def pow(l: Column, r: Column): Column = wrap(PyPowExpr, l, r)
  def asinh(c: Column): Column = wrap1(PyAsinhExpr, c)
  def floorDiv(l: Column, r: Column): Column = wrap(PyFloorDivExpr, l, r)
  def longFloorDiv(l: Column, r: Column): Column = wrapLong(PyLongFloorDivExpr, l, r)
  def longMod(l: Column, r: Column): Column = wrapLong(PyLongModExpr, l, r)
  def floor(c: Column): Column = wrap1(PyFloorExpr, c)
  def ceil(c: Column): Column = wrap1(PyCeilExpr, c)
  def trunc(c: Column): Column = wrap1(PyTruncExpr, c)
  def rint(c: Column): Column = wrap1(PyRintExpr, c)

  private def wrap1(f: Expression => Expression, c: Column): Column =
    GraftBridge.column(f(GraftBridge.expression(c.cast(DoubleType))))

  private def wrap(f: (Expression, Expression) => Expression,
                   l: Column, r: Column): Column =
    GraftBridge.column(f(
      GraftBridge.expression(l.cast(DoubleType)),
      GraftBridge.expression(r.cast(DoubleType))))

  private def wrapLong(f: (Expression, Expression) => Expression,
                       l: Column, r: Column): Column =
    GraftBridge.column(f(
      GraftBridge.expression(l.cast(org.apache.spark.sql.types.LongType)),
      GraftBridge.expression(r.cast(org.apache.spark.sql.types.LongType))))
}

/** Shared shape: double children, never-null double result (null
  * operands read as NaN), one static call in codegen. */
abstract class PyArithBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  protected def kernel(a: Double, b: Double): Double
  protected def kernelName: String // static method on graft.expr.PyArith

  private def asD(v: Any): Double =
    if (v == null) Double.NaN else v.asInstanceOf[Double]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    kernel(asD(left.eval(input)), asD(right.eval(input)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val le = left.genCode(ctx)
    val re = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${le.code}
        ${re.code}
        double ${ev.value} = graft.expr.PyArith.$kernelName(
          ${le.isNull} ? Double.NaN : ${le.value},
          ${re.isNull} ? Double.NaN : ${re.value});""",
      isNull = FalseLiteral)
  }
}

case class PyDivExpr(left: Expression, right: Expression) extends PyArithBinary {
  override def prettyName: String = "py_div"
  override protected def kernel(a: Double, b: Double): Double = PyArith.pyDiv(a, b)
  override protected def kernelName: String = "pyDiv"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class PyModExpr(left: Expression, right: Expression) extends PyArithBinary {
  override def prettyName: String = "py_mod"
  override protected def kernel(a: Double, b: Double): Double = PyArith.pyMod(a, b)
  override protected def kernelName: String = "pyMod"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class PyFloorDivExpr(left: Expression, right: Expression) extends PyArithBinary {
  override def prettyName: String = "py_floordiv"
  override protected def kernel(a: Double, b: Double): Double = PyArith.pyFloorDiv(a, b)
  override protected def kernelName: String = "pyFloorDiv"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Long twin of [[PyArithBinary]]: null propagates (the null-as-NaN
  * convention is a FLOAT-domain rule; integer columns have no NaN to
  * stand for), codegen is one static call. */
abstract class PyLongArithBinary extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  protected def kernel(a: Long, b: Long): Long
  protected def kernelName: String // static method on graft.expr.PyArith

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.PyArith.$kernelName($a, $b);")
}

case class PyLongFloorDivExpr(left: Expression, right: Expression) extends PyLongArithBinary {
  override def prettyName: String = "py_long_floordiv"
  override protected def kernel(a: Long, b: Long): Long = PyArith.pyLongFloorDiv(a, b)
  override protected def kernelName: String = "pyLongFloorDiv"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class PyLongModExpr(left: Expression, right: Expression) extends PyLongArithBinary {
  override def prettyName: String = "py_long_mod"
  override protected def kernel(a: Long, b: Long): Long = PyArith.pyLongMod(a, b)
  override protected def kernelName: String = "pyLongMod"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Unary twin of [[PyArithBinary]]: double child, never-null double
  * result (null reads as NaN), one static call in codegen. */
abstract class PyArithUnary extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  protected def kernel(a: Double): Double
  protected def kernelName: String // static method on graft.expr.PyArith

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    kernel(if (v == null) Double.NaN else v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ce = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${ce.code}
        double ${ev.value} = graft.expr.PyArith.$kernelName(
          ${ce.isNull} ? Double.NaN : ${ce.value});""",
      isNull = FalseLiteral)
  }
}

case class PyAtan2Expr(left: Expression, right: Expression) extends PyArithBinary {
  override def prettyName: String = "py_atan2"
  override protected def kernel(a: Double, b: Double): Double = PyArith.pyAtan2(a, b)
  override protected def kernelName: String = "pyAtan2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class PyPowExpr(left: Expression, right: Expression) extends PyArithBinary {
  override def prettyName: String = "py_pow"
  override protected def kernel(a: Double, b: Double): Double = PyArith.pyPow(a, b)
  override protected def kernelName: String = "pyPow"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class PyAsinhExpr(child: Expression) extends PyArithUnary {
  override def prettyName: String = "py_asinh"
  override protected def kernel(a: Double): Double = PyArith.pyAsinh(a)
  override protected def kernelName: String = "pyAsinh"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PyFloorExpr(child: Expression) extends PyArithUnary {
  override def prettyName: String = "py_floor"
  override protected def kernel(a: Double): Double = PyArith.pyFloor(a)
  override protected def kernelName: String = "pyFloor"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PyCeilExpr(child: Expression) extends PyArithUnary {
  override def prettyName: String = "py_ceil"
  override protected def kernel(a: Double): Double = PyArith.pyCeil(a)
  override protected def kernelName: String = "pyCeil"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PyTruncExpr(child: Expression) extends PyArithUnary {
  override def prettyName: String = "py_trunc"
  override protected def kernel(a: Double): Double = PyArith.pyTrunc(a)
  override protected def kernelName: String = "pyTrunc"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PyRintExpr(child: Expression) extends PyArithUnary {
  override def prettyName: String = "py_rint"
  override protected def kernel(a: Double): Double = PyArith.pyRint(a)
  override protected def kernelName: String = "pyRint"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
