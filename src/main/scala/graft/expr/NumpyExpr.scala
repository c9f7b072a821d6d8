package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NumPy-surface expression language compiled to Catalyst Columns.
  *
  * The reference evaluates query predicates/expressions by Python
  * `eval` over a NumPy namespace (ezdata/simpletable.py:2710–2747,
  * ezdata/dictdataframe.py:883–934).  We re-express the same surface
  * — Python operator precedence, `**` power, bitwise `& | ~ ^` acting
  * as elementwise logical ops on booleans, NumPy ufuncs — as a small
  * Pratt parser producing an AST that is compiled to Spark `Column`s,
  * so every expression stays inside whole-stage codegen (no UDFs).
  *
  * Deliberate fix vs the reference: identifier binding is by real
  * tokenization, not the substring test of simpletable.py:2731–2734.
  */
object NumpyExpr {

  // ---------------------------------------------------------------- tokens
  sealed trait Tok
  final case class TNum(text: String) extends Tok
  final case class TId(name: String) extends Tok
  final case class TStr(value: String) extends Tok
  final case class TOp(op: String) extends Tok

  private val twoCharOps = Set("**", "//", "<<", ">>", "<=", ">=", "==", "!=")
  private val oneCharOps = Set("+", "-", "*", "/", "%", "<", ">", "&", "|", "^", "~", "(", ")", ",", ".")

  def tokenize(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
          val save = i
          i += 1
          if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
          if (i < n && s.charAt(i).isDigit) { while (i < n && s.charAt(i).isDigit) i += 1 }
          else i = save
        }
        out += TNum(s.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += TId(s.substring(start, i))
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && s.charAt(i) != quote) {
          if (s.charAt(i) == '\\' && i + 1 < n) {
            // Python escape semantics (the reference evals these with
            // Python literals): '\n' is a NEWLINE, not the letter n —
            // treating it as skip-and-keep-raw silently diverged every
            // comparison against control characters.  Numeric escapes
            // follow Python exactly: \ooo is 1–3 OCTAL digits (so
            // '\01' is ONE char, 0o1 — never NUL + '1'), \xhh requires
            // exactly 2 hex digits (fewer is a Python SyntaxError —
            // throw; silently keeping the backslash diverged for
            // '\x41'), \uXXXX / \UXXXXXXXX take 4 / 8 hex digits and
            // \U may exceed the BMP (surrogate-pair append).  Unknown
            // escapes keep the backslash (Python's own behavior for
            // e.g. '\d').
            def hexRun(from: Int, count: Int, kind: String): Int = {
              val end = from + count
              if (end > n || !(from until end).forall(j => Character.digit(s.charAt(j), 16) >= 0))
                throw new IllegalArgumentException(
                  s"truncated \\$kind escape (needs $count hex digits) in: $s")
              java.lang.Long.parseLong(s.substring(from, end), 16).toInt
            }
            s.charAt(i + 1) match {
              case 'n' => sb += '\n'; i += 2
              case 't' => sb += '\t'; i += 2
              case 'r' => sb += '\r'; i += 2
              case 'a' => sb += '\u0007'; i += 2
              case 'b' => sb += '\b'; i += 2
              case 'f' => sb += '\f'; i += 2
              case 'v' => sb += '\u000B'; i += 2
              case '\\' => sb += '\\'; i += 2
              case '\'' => sb += '\''; i += 2
              case '"' => sb += '"'; i += 2
              case d if d >= '0' && d <= '7' =>
                var j = i + 1
                var v = 0
                while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                  v = v * 8 + (s.charAt(j) - '0'); j += 1
                }
                sb += v.toChar // Python caps \ooo at \777 = 511: always one char
                i = j
              case 'x' =>
                sb += hexRun(i + 2, 2, "x").toChar; i += 4
              case 'u' =>
                sb += hexRun(i + 2, 4, "u").toChar; i += 6
              case 'U' =>
                val cp = hexRun(i + 2, 8, "U")
                if (!Character.isValidCodePoint(cp))
                  throw new IllegalArgumentException(s"\\U escape out of range in: $s")
                sb ++= new String(Character.toChars(cp)); i += 10
              case 'N' =>
                // Python's \N{UNICODE NAME}: no JVM name table worth
                // shipping — refusing loudly beats silent divergence
                throw new IllegalArgumentException(
                  s"named escape \\N{...} is not supported in: $s")
              case other => sb += '\\'; sb += other; i += 2
            }
          } else { sb += s.charAt(i); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException(s"unterminated string literal in: $s")
        i += 1
        out += TStr(sb.toString)
      } else {
        if (i + 1 < n && twoCharOps.contains(s.substring(i, i + 2))) {
          out += TOp(s.substring(i, i + 2)); i += 2
        } else if (oneCharOps.contains(c.toString)) {
          out += TOp(c.toString); i += 1
        } else throw new IllegalArgumentException(s"unexpected character '$c' in expression: $s")
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------ AST
  sealed trait Ast
  final case class Num(text: String) extends Ast
  final case class Id(name: String) extends Ast
  final case class StrLit(value: String) extends Ast
  final case class Bin(op: String, l: Ast, r: Ast) extends Ast
  final case class Un(op: String, x: Ast) extends Ast
  final case class Call(fn: String, args: List[Ast]) extends Ast

  /** Python operator precedence (low → high); comparisons bind *looser*
    * than bitwise ops, which is why NumPy predicates are parenthesized. */
  private def lbp(op: String): Int = op match {
    case "or"                                      => 2
    case "and"                                     => 3
    case "<" | "<=" | ">" | ">=" | "==" | "!="     => 5
    case "|"                                       => 10
    case "^"                                       => 20
    case "&"                                       => 30
    case "<<" | ">>"                               => 40
    case "+" | "-"                                 => 50
    case "*" | "/" | "//" | "%"                    => 60
    case "**"                                      => 80
    case _                                         => -1
  }

  final class Parser(tokens: List[Tok], src: String) {
    private var toks = tokens
    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = {
      val t = toks.headOption.getOrElse(throw new IllegalArgumentException(s"unexpected end of expression: $src"))
      toks = toks.tail; t
    }
    private def expectOp(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case other => throw new IllegalArgumentException(s"expected '$op' but found $other in: $src")
    }

    def parse(): Ast = {
      val e = expr(0)
      if (toks.nonEmpty) throw new IllegalArgumentException(s"trailing tokens $toks in: $src")
      e
    }

    def expr(minBp: Int): Ast = {
      var left = nud()
      var continue = true
      while (continue) {
        peek match {
          case Some(TOp(op)) if lbp(op) > minBp =>
            next()
            // '**' is right-associative; everything else left-associative.
            val rightBp = if (op == "**") lbp(op) - 1 else lbp(op)
            left = Bin(op, left, expr(rightBp))
          case Some(TId(kw @ ("and" | "or"))) if lbp(kw) > minBp =>
            next()
            left = Bin(kw, left, expr(lbp(kw)))
          case _ => continue = false
        }
      }
      left
    }

    private def nud(): Ast = next() match {
      case TNum(t) => Num(t)
      case TStr(v) => StrLit(v)
      case TOp("(") =>
        val e = expr(0); expectOp(")"); e
      case TOp("-") => Un("-", expr(69))   // unary binds tighter than '*', looser than '**'
      case TOp("+") => expr(69)
      case TOp("~") => Un("~", expr(69))
      case TId("not") => Un("not", expr(4))
      case TId("np") if peek.contains(TOp(".")) =>
        next() // '.'
        next() match {
          case TId(fn) => identOrCall(fn)
          case other   => throw new IllegalArgumentException(s"expected name after 'np.' but found $other in: $src")
        }
      case TId(name) => identOrCall(name)
      case other => throw new IllegalArgumentException(s"unexpected token $other in: $src")
    }

    private def identOrCall(name: String): Ast = peek match {
      case Some(TOp("(")) =>
        next()
        val args = List.newBuilder[Ast]
        if (!peek.contains(TOp(")"))) {
          args += expr(0)
          while (peek.contains(TOp(","))) { next(); args += expr(0) }
        }
        expectOp(")")
        Call(name, args.result())
      case _ => Id(name)
    }
  }

  def parse(s: String): Ast = new Parser(tokenize(s), s).parse()

  // ------------------------------------------------------------- compile
  /** Coarse type lattice for deciding whether `& | ^ ~` are logical or
    * bitwise, mirroring NumPy's behavior on bool vs int arrays. */
  sealed trait Ty
  case object TyBool extends Ty
  case object TyInt extends Ty
  case object TyFloat extends Ty
  case object TyStr extends Ty
  case object TyOther extends Ty

  final case class Typed(col: Column, ty: Ty)

  private[graft] def tyOf(dt: DataType): Ty = dt match {
    case BooleanType                                      => TyBool
    case _: IntegerType | _: LongType | ShortType | ByteType => TyInt
    case _: FloatType | _: DoubleType | _: DecimalType    => TyFloat
    case _: StringType                                    => TyStr
    case _                                                => TyOther
  }

  private def numJoin(a: Ty, b: Ty): Ty =
    if (a == TyFloat || b == TyFloat) TyFloat
    else if (a == TyInt || b == TyInt) TyInt
    else if (a == TyBool && b == TyBool) TyInt // numpy bool+bool promotes to int for arithmetic
    else TyOther

  /** Compile an AST to a Column.
    *
    * @param resolve  identifier → (Column, type); handles alias/caseless
    *                 resolution (throws on unknown name)
    * @param vars     free variables (`exprvars` in the reference) → literals
    */
  def compile(ast: Ast, resolve: String => Option[Typed], vars: Map[String, Any] = Map.empty): Typed = {
    def go(a: Ast): Typed = a match {
      case Num(t) =>
        if (t.contains('.') || t.contains('e') || t.contains('E'))
          Typed(lit(t.toDouble), TyFloat)
        else Typed(lit(t.toLong), TyInt)
      case StrLit(s) => Typed(lit(s), TyStr)
      case Id(name) =>
        // Resolution order mirrors the reference's eval namespaces
        // (simpletable.py:2744: locals = columns updated with exprvars,
        // globals = numpy): exprvars > columns > constants.  A column
        // named `e` or `pi` must win over the math constant.
        vars.get(name).map(litOf)
          .orElse(resolve(name))
          .orElse(constants.get(name))
          .getOrElse(throw new IllegalArgumentException(s"unknown identifier '$name'"))
      case Un("-", x)   => val t = go(x); Typed(negate(t.col), if (t.ty == TyBool) TyInt else t.ty)
      case Un("~", x)   =>
        val t = go(x)
        if (t.ty == TyBool) Typed(!t.col, TyBool) else Typed(bitwise_not(t.col), TyInt)
      case Un("not", x) => Typed(!go(x).col, TyBool)
      case Bin(op, l, r) => binOp(op, go(l), go(r))
      // np.round(x, decimals): the scale must be a literal — bround's
      // scale is a plan-time constant.  Matched on the RAW ast (before
      // compile) because a compiled Column can't be read back as an int.
      case Call("round" | "around", x :: Num(n) :: Nil)
          if !n.contains('.') && !n.toLowerCase.contains('e') =>
        Typed(bround(go(x).col, n.toInt), TyFloat)
      // negative decimals (np.round(x, -1) rounds to tens): the parser
      // yields Un("-", Num) for a negative literal — bround supports a
      // negative scale directly
      case Call("round" | "around", x :: Un("-", Num(n)) :: Nil)
          if !n.contains('.') && !n.toLowerCase.contains('e') =>
        Typed(bround(go(x).col, -n.toInt), TyFloat)
      case Call(fn, args) => call(fn, args.map(go))
    }

    // (Double-preserving floor/ceil/trunc/rint live in PyArith now:
    // java.lang.Math's are the same IEEE-754 operations as numpy's
    // libm — NaN/±inf propagate, exact past 2^53, and zero SIGNS
    // survive, which the Spark-builtin round-trips erased: ceil(+0.0)
    // came back -0.0 via -floor(-x)'s long cast, rint(-0.4) came back
    // +0.0 from bround.)

    def binOp(op: String, l: Typed, r: Typed): Typed = op match {
      case "+" if l.ty == TyStr && r.ty == TyStr => Typed(concat(l.col, r.col), TyStr)
      case "+"  => Typed(l.col + r.col, numJoin(l.ty, r.ty))
      case "-"  => Typed(l.col - r.col, numJoin(l.ty, r.ty))
      case "*"  => Typed(l.col * r.col, numJoin(l.ty, r.ty))
      // float /, //, % are single codegen'd nodes (PyArith): the
      // Column compositions of the CPython/numpy algorithms reference
      // each operand 15–25×, and operand references duplicate the
      // operand's SUBTREE — nested arithmetic grew exponentially
      // (measured: driver OOM planning ~400 fuzz expressions).  The
      // numpy semantics (fmod+sign-fix mod, mod-consistent floor
      // division, divmod's infinite/zero-divisor conventions, IEEE
      // true division with null→NaN) live in PyArith's scalar
      // kernels, parity-pinned by tools/numpy_parity.py.
      case "/"  => Typed(PyArith.div(l.col, r.col), TyFloat) // numpy true division
      case "//" =>
        if (numJoin(l.ty, r.ty) == TyInt)
          Typed(PyArith.longFloorDiv(l.col, r.col), TyInt)
        else Typed(PyArith.floorDiv(l.col, r.col), TyFloat)
      case "%"  => // numpy mod: floored (sign follows divisor)
        if (numJoin(l.ty, r.ty) == TyInt)
          Typed(PyArith.longMod(l.col, r.col), TyInt)
        else Typed(PyArith.mod(l.col, r.col), TyFloat)
      case "**" => Typed(npPow(l.col, r.col), TyFloat)
      // NumPy comparison semantics with NaN: every comparison is False
      // except '!=' (True).  Spark/SQL instead orders NaN greatest and
      // equal to itself — guard float comparisons explicitly.
      case "<"  => Typed(npCmp(l, r, l.col < r.col, nanResult = false), TyBool)
      case "<=" => Typed(npCmp(l, r, l.col <= r.col, nanResult = false), TyBool)
      case ">"  => Typed(npCmp(l, r, l.col > r.col, nanResult = false), TyBool)
      case ">=" => Typed(npCmp(l, r, l.col >= r.col, nanResult = false), TyBool)
      case "==" => Typed(npCmp(l, r, l.col === r.col, nanResult = false), TyBool)
      case "!=" => Typed(npCmp(l, r, l.col =!= r.col, nanResult = true), TyBool)
      case "&" if l.ty == TyBool && r.ty == TyBool => Typed(l.col && r.col, TyBool)
      case "|" if l.ty == TyBool && r.ty == TyBool => Typed(l.col || r.col, TyBool)
      case "^" if l.ty == TyBool && r.ty == TyBool => Typed(l.col =!= r.col, TyBool)
      case "&"  => Typed(l.col.bitwiseAND(r.col), TyInt)
      case "|"  => Typed(l.col.bitwiseOR(r.col), TyInt)
      case "^"  => Typed(l.col.bitwiseXOR(r.col), TyInt)
      case "<<" => Typed(expr_shiftleft(l, r), TyInt)
      case ">>" => Typed(expr_shiftright(l, r), TyInt)
      case "and" => Typed(l.col && r.col, TyBool)
      case "or"  => Typed(l.col || r.col, TyBool)
      case other => throw new IllegalArgumentException(s"unsupported operator '$other'")
    }

    // (IEEE division itself — NumPy's ±inf / NaN-on-zero semantics
    // Spark's ANSI Divide refuses — lives in PyArith.pyDiv now: the
    // JVM's own double division is IEEE, one codegen'd node.)

    // (EXACT integer floor division / floored mod — values past 2^53
    // exact, zero divisor yields 0 like NumPy, Long.MinValue // -1
    // throws where NumPy wraps — live in PyArith.pyLongFloorDiv /
    // pyLongMod now: Math.floorDiv/floorMod in one codegen'd node
    // replaced the when-guarded DECIMAL(38,0) round-trip.)

    // shiftleft/shiftright builtins take a literal Int count; generic shift
    // via pow-of-two multiply keeps variable shift counts working (every
    // power of two through 2^62 is an exact double).  Counts outside
    // [0, 62] are a LOUD error: a negative count silently produced 0
    // (NumPy raises 'negative shift count'), and 63 overflowed the long
    // cast mid-job under ANSI with an unhelpful message.
    def shiftCountGuard(r: Column): Column =
      when(assert_true(r >= 0 && r <= 62,
          lit("shift count must lie in [0, 62] (NumPy raises on negative " +
            "counts; 2^63 does not fit a signed long)")).isNull, r)
    // the shift ARITHMETIC stays in longs end to end: the old
    // double-divide right shift rounded dividends past 2^53 before
    // flooring (-(2^53+1) >> 3 came back off by one), and the old
    // double-product left shift rounded the same way.  2^count itself
    // is an exact double through 2^62, so only the power-of-two
    // LOOKUP goes through a double; the multiply/divide do not.
    // Left-shift overflow throws under ANSI where numpy wraps — the
    // same documented loud-beats-silent-wrap deviation as `*`.
    def pow2Long(r: Column): Column =
      pow(lit(2.0), shiftCountGuard(r)).cast(LongType)
    def expr_shiftleft(l: Typed, r: Typed): Column =
      l.col.cast(LongType) * pow2Long(r.col)
    def expr_shiftright(l: Typed, r: Typed): Column =
      PyArith.longFloorDiv(l.col, pow2Long(r.col))

    def f1(args: List[Typed])(f: Column => Column): Typed = args match {
      case a :: Nil => Typed(f(a.col), TyFloat)
      case _        => throw new IllegalArgumentException("expected 1 argument")
    }
    def f2(args: List[Typed])(f: (Column, Column) => Column): Typed = args match {
      case a :: b :: Nil => Typed(f(a.col, b.col), TyFloat)
      case _             => throw new IllegalArgumentException("expected 2 arguments")
    }

    // numpy's pow: C pow with the exponent-0.5 sqrt routing — a single
    // codegen'd PyArith kernel (binds each operand once; also fixes the
    // C-pow corners Java Math.pow loses: 1**NaN, (±1)**±inf = 1).
    def npPow(a: Column, b: Column): Column = PyArith.pow(a, b)

    // NumPy log semantics: x>0 → log, x==0 (either sign) → -inf,
    // x<0 → NaN.  Spark's SQL log returns null for x<=0 — a different
    // lattice, so the edges are made explicit here.
    def npLog(f: Column => Column)(x: Column): Column =
      when(isnan(x) || x.isNull, lit(Double.NaN))
        .when(x === 0.0, lit(Double.NegativeInfinity))
        .when(x < 0.0, lit(Double.NaN))
        .otherwise(f(x))

    def call(fn: String, args: List[Typed]): Typed = fn match {
      case "log"     => f1(args)(npLog(log(_)))
      case "log10"   => f1(args)(npLog(log10(_)))
      case "log2"    => f1(args)(npLog(log2(_)))
      // npLog's edge cases applied DIRECTLY on c: routing through
      // (c+1)-1 cancels catastrophically for |c| < ~1e-16 — the exact
      // inputs log1p exists for
      case "log1p"   => f1(args)(c =>
        when(c === lit(-1.0), lit(Double.NegativeInfinity))
          .when(c < lit(-1.0), lit(Double.NaN))
          .otherwise(log1p(c)))
      case "exp"     => f1(args)(exp(_))
      case "expm1"   => f1(args)(expm1(_))
      case "exp2"    => f1(args)(pow(lit(2.0), _))
      case "sqrt"    => f1(args)(sqrt(_))
      case "cbrt"    => f1(args)(cbrt(_))
      case "square"  => f1(args)(c => c * c)
      case "abs" | "absolute" | "fabs" => args match {
        case a :: Nil => Typed(abs(a.col), if (a.ty == TyInt) TyInt else TyFloat)
        case _ => throw new IllegalArgumentException("abs expects 1 argument")
      }
      case "sign"    => f1(args)(signum(_))
      case "floor"   => f1(args)(PyArith.floor)
      case "ceil"    => f1(args)(PyArith.ceil)
      case "rint" | "round" | "around" => args match { // numpy: half-to-even
        case a :: Nil => Typed(PyArith.rint(a.col), TyFloat)
        case _ :: _ :: Nil => throw new IllegalArgumentException(
          s"$fn(x, decimals): decimals must be an integer literal (it is a plan-time constant)")
        case _ => throw new IllegalArgumentException(s"$fn expects 1 argument")
      }
      case "trunc"   => f1(args)(PyArith.trunc)
      case "sin"     => f1(args)(sin(_))
      case "cos"     => f1(args)(cos(_))
      case "tan"     => f1(args)(tan(_))
      case "arcsin"  => f1(args)(asin(_))
      case "arccos"  => f1(args)(acos(_))
      case "arctan"  => f1(args)(atan(_))
      // Spark's Atan2 adds 0.0 to both operands (Hive compat), which
      // ERASES negative zero: atan2(-0.0, -1) must be -π (numpy), not
      // +π.  Java's Math.atan2 already honors zero signs, so the
      // PyArith kernel IS C atan2 — no per-row cast-to-string probe,
      // and each operand is bound exactly once (the Column form
      // referenced them ~4× and re-grew the exponential AST the
      // PyArith tier removed).
      case "arctan2" => f2(args)(PyArith.atan2(_, _))
      case "sinh"    => f1(args)(sinh(_))
      case "cosh"    => f1(args)(cosh(_))
      case "tanh"    => f1(args)(tanh(_))
      // Spark's asinh is log(x + sqrt(x² + 1)), which collapses to
      // log(1) = 0 for |x| below ~1e-16 (asinh(1e-300) must be 1e-300).
      // The stable log1p form lives in the PyArith kernel (one operand
      // binding; the Column form referenced c ~8× — nested arcsinh
      // grew ~8^depth).
      case "arcsinh" => f1(args)(PyArith.asinh)
      case "arccosh" => f1(args)(acosh(_))
      case "arctanh" => f1(args)(atanh(_))
      case "hypot"   => f2(args)(hypot(_, _))
      case "degrees" | "rad2deg" => f1(args)(degrees(_))
      case "radians" | "deg2rad" => f1(args)(radians(_))
      case "power" | "pow" => f2(args)(npPow(_, _))
      // numpy fmod: C fmod (sign of the DIVIDEND, vs '%'/mod's
      // sign-of-divisor).  The JVM's % has exactly those semantics,
      // but ANSI mode (the default) throws REMAINDER_BY_ZERO on a
      // zero divisor where numpy yields NaN (float) / 0 (int) — the
      // guard keeps the zero branch out of the evaluated lane.  Int
      // inputs stay int64 (numpy: fmod(int, int).dtype == int64).
      case "fmod" => args match {
        case a :: b :: Nil if numJoin(a.ty, b.ty) == TyInt =>
          val (ac, bc) = (a.col.cast(LongType), b.col.cast(LongType))
          Typed(when(bc === 0L, lit(0L)).otherwise(ac % bc), TyInt)
        case a :: b :: Nil =>
          val (ac, bc) = (a.col.cast(DoubleType), b.col.cast(DoubleType))
          Typed(when(bc === 0.0, lit(Double.NaN)).otherwise(ac % bc), TyFloat)
        case _ => throw new IllegalArgumentException("fmod expects 2 arguments")
      }
      // np.minimum/np.maximum PROPAGATE NaN; least/greatest skip
      // null/NaN (that's np.fmin/np.fmax).  Nulls stand for NumPy's
      // domain-error NaNs here (SURVEY.md §7.1.1).
      case "minimum" => args match {
        case a :: b :: Nil => Typed(nanPropagating(a.col, b.col, least(a.col, b.col)), TyFloat)
        case _ => throw new IllegalArgumentException("minimum expects 2 arguments")
      }
      case "maximum" => args match {
        case a :: b :: Nil => Typed(nanPropagating(a.col, b.col, greatest(a.col, b.col)), TyFloat)
        case _ => throw new IllegalArgumentException("maximum expects 2 arguments")
      }
      // np.fmin/np.fmax SKIP NaN (return the other operand; NaN only
      // when both are).  least/greatest skip NULLs but order NaN
      // GREATEST, so bare greatest(x, NaN) returned NaN where np.fmax
      // returns x — the float arms make the skip explicit.  (least
      // happens to land right for fmin — NaN-as-greatest never wins a
      // minimum — but the explicit form is the contract, not luck.)
      case "fmin" => args match {
        case a :: b :: Nil if numJoin(a.ty, b.ty) == TyInt =>
          Typed(least(a.col, b.col), TyInt)
        case a :: b :: Nil =>
          Typed(nanSkipping(a.col, b.col, least(a.col, b.col)), TyFloat)
        case _ => throw new IllegalArgumentException("fmin expects 2 arguments")
      }
      case "fmax" => args match {
        case a :: b :: Nil if numJoin(a.ty, b.ty) == TyInt =>
          Typed(greatest(a.col, b.col), TyInt)
        case a :: b :: Nil =>
          Typed(nanSkipping(a.col, b.col, greatest(a.col, b.col)), TyFloat)
        case _ => throw new IllegalArgumentException("fmax expects 2 arguments")
      }
      case "clip" => args match {
        case x :: lo :: hi :: Nil =>
          val ty = numJoin(x.ty, numJoin(lo.ty, hi.ty))
          val base = least(greatest(x.col, lo.col), hi.col)
          // numpy clip = minimum(maximum(x, lo), hi) — NaN PROPAGATES;
          // Spark's least/greatest order NaN greatest, so clip(NaN,0,1)
          // silently returned hi.  Int-typed clips skip the guard so
          // their result type stays integral.
          val guarded = if (ty == TyFloat)
            when(x.col.isNull || isnan(x.col) || lo.col.isNull || isnan(lo.col) ||
              hi.col.isNull || isnan(hi.col), lit(Double.NaN)).otherwise(base)
          else base
          Typed(guarded, ty)
        case _ => throw new IllegalArgumentException("clip expects 3 arguments")
      }
      case "where" => args match {
        case c :: a :: b :: Nil => Typed(when(c.col, a.col).otherwise(b.col), numJoin(a.ty, b.ty))
        case _ => throw new IllegalArgumentException("where expects 3 arguments")
      }
      // Nulls stand for NumPy's domain-error NaNs (SURVEY.md §7.1.1) —
      // the same convention nanPropagating/npCmp already apply — so the
      // classification trio must treat null AS NaN and return GENUINE
      // booleans: Spark's isnan(null) is false and `null === inf` is
      // null, which poisons `~isfinite(x)` into a row-dropping null.
      case "isnan"    => args match {
        case a :: Nil => Typed(a.col.isNull || isnan(a.col), TyBool)
        case _ => throw new IllegalArgumentException("isnan expects 1 argument")
      }
      case "isfinite" => args match {
        case a :: Nil =>
          Typed(!(a.col.isNull || isnan(a.col) ||
            a.col === lit(Double.PositiveInfinity) || a.col === lit(Double.NegativeInfinity)), TyBool)
        case _ => throw new IllegalArgumentException("isfinite expects 1 argument")
      }
      case "isinf" => args match {
        case a :: Nil => Typed(!a.col.isNull &&
          (a.col === lit(Double.PositiveInfinity) || a.col === lit(Double.NegativeInfinity)), TyBool)
        case _ => throw new IllegalArgumentException("isinf expects 1 argument")
      }
      case "logical_and" => f2Bool(args)(_ && _)
      case "logical_or"  => f2Bool(args)(_ || _)
      case "logical_not" => args match {
        case a :: Nil => Typed(!a.col, TyBool)
        case _ => throw new IllegalArgumentException("logical_not expects 1 argument")
      }
      case "sinc" => f1(args) { x => // numpy normalized sinc: sin(pi x)/(pi x), 1 at 0
        val px = x * lit(math.Pi)
        when(x === lit(0.0), lit(1.0)).otherwise(sin(px) / px)
      }
      case other => throw new IllegalArgumentException(s"unsupported function '$other'")
    }

    def f2Bool(args: List[Typed])(f: (Column, Column) => Column): Typed = args match {
      case a :: b :: Nil => Typed(f(a.col, b.col), TyBool)
      case _             => throw new IllegalArgumentException("expected 2 arguments")
    }

    def nanPropagating(a: Column, b: Column, result: Column): Column =
      when(a.isNull || b.isNull || isnan(a) || isnan(b), lit(Double.NaN)).otherwise(result)

    def nanSkipping(a: Column, b: Column, result: Column): Column = {
      def bad(c: Column) = c.isNull || isnan(c)
      when(bad(a) && bad(b), lit(Double.NaN))
        .when(bad(a), b.cast(DoubleType))
        .when(bad(b), a.cast(DoubleType))
        .otherwise(result.cast(DoubleType))
    }

    // Conjunctive/disjunctive form rather than CASE WHEN: the plain
    // comparison conjunct remains eligible for parquet filter pushdown
    // (Spark pushes supported conjuncts of an AND), and SQL's
    // `null AND false = false` makes the result a *genuine* false for
    // null operands, so `~` negation behaves like NumPy too.
    def npCmp(l: Typed, r: Typed, cmp: Column, nanResult: Boolean): Column =
      if (l.ty == TyFloat || r.ty == TyFloat) {
        val anyNaN = (if (l.ty == TyFloat) l.col.isNull || isnan(l.col) else lit(false)) ||
          (if (r.ty == TyFloat) r.col.isNull || isnan(r.col) else lit(false))
        if (nanResult) cmp || anyNaN else cmp && !anyNaN
      } else cmp

    go(ast)
  }

  private val constants: Map[String, Typed] = Map(
    "pi"  -> Typed(lit(math.Pi), TyFloat),
    "e"   -> Typed(lit(math.E), TyFloat),
    "inf" -> Typed(lit(Double.PositiveInfinity), TyFloat),
    "Inf" -> Typed(lit(Double.PositiveInfinity), TyFloat),
    "nan" -> Typed(lit(Double.NaN), TyFloat),
    "NaN" -> Typed(lit(Double.NaN), TyFloat),
    "True"  -> Typed(lit(true), TyBool),
    "False" -> Typed(lit(false), TyBool),
  )

  private def litOf(v: Any): Typed = v match {
    case b: Boolean => Typed(lit(b), TyBool)
    case i: Int     => Typed(lit(i), TyInt)
    case l: Long    => Typed(lit(l), TyInt)
    case f: Float   => Typed(lit(f.toDouble), TyFloat)
    case d: Double  => Typed(lit(d), TyFloat)
    case s: String  => Typed(lit(s), TyStr)
    case c: Column  => Typed(c, TyOther)
    case other      => Typed(lit(other), TyOther)
  }

  /** Collect identifiers referenced by an expression (for column pruning
    * and orphan-alias bookkeeping). */
  def identifiers(ast: Ast): Set[String] = ast match {
    case Id(n)         => Set(n)
    case Bin(_, l, r)  => identifiers(l) ++ identifiers(r)
    case Un(_, x)      => identifiers(x)
    case Call(_, args) => args.flatMap(identifiers).toSet
    case _             => Set.empty
  }
}
