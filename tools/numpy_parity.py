#!/usr/bin/env python3
"""Differential fuzz of the NumPy-surface expression translator
(graft.expr.NumpyExpr) against REAL NumPy — the reference evaluates
these expressions with Python eval over a NumPy namespace, so NumPy is
the ground truth for operator/function semantics (floored mod, true
division, NaN-aware comparisons, half-to-even rounding, domain-error
NaNs...).

Driver-side tool (python3 + numpy/pyarrow are dev/oracle dependencies,
same tier as tools/strict_check.py's duckdb): NOT part of the library.

Usage:
  python3 tools/numpy_parity.py gen     # writes /tmp/graft_npfuzz/{data.parquet,exprs.txt}
  sbt "runMain graft.tools.NumpyParity /tmp/graft_npfuzz/data.parquet \
       /tmp/graft_npfuzz/exprs.txt /tmp/graft_npfuzz/engine.parquet"
  python3 tools/numpy_parity.py check   # compares engine.parquet vs numpy

Comparison contract: bools/ints bit-exact; floats exact on specials
(NaN is NaN, infinities signed) and rel-err <= 1e-12 otherwise
(JVM vs libm transcendental ULP drift is not a semantics divergence).
Dtype CLASS must match (int-vs-float drift is a finding — the strict
oracle checker hard-fails it too).
"""
import sys, os
import numpy as np

OUT = "/tmp/graft_npfuzz"

# ---------------------------------------------------------------- data
def build_data():
    # no nulls: the reference surface is numpy arrays (no missing values)
    x = np.array([0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.5, -2.5, 3.5, 1.5,
                  np.nan, np.inf, -np.inf, 1e300, -1e300, 1e-300, 1e-17,
                  -1e-17, 3.141592653589793, -2.718281828459045, 7.25,
                  -7.25, 1e16, -1e16, 0.1], dtype=np.float64)
    y = np.array([1.0, -1.0, 0.0, -0.0, 2.0, -2.0, 0.5, -0.5, np.nan,
                  np.inf, -np.inf, 3.0, -3.0, 1e300, 1e-300, -1e-300,
                  0.25, -0.25, 10.0, -10.0, 0.1, -0.1, 2.5, -2.5,
                  7.0], dtype=np.float64)
    # i stays multiply-safe (|i * j| < 2^63); the huge magnitudes that
    # exercise exact-int paths past 2^53 live in h, used only in
    # non-overflowing expressions.  DOCUMENTED DEVIATION: numpy int64
    # arithmetic silently WRAPS on overflow; the engine (ANSI mode)
    # throws ARITHMETIC_OVERFLOW instead — loud beats silent wrap at
    # scale, so the harness does not exercise wrap-inducing pairs.
    i = np.array([0, 1, -1, 2, -2, 7, -7, 10, -10, 63, -63, 100, -100,
                  2**40, -(2**40), 2**45, -(2**45), 5, -5, 8, -8, 9,
                  -9, 3, -3], dtype=np.int64)
    h = np.array([2**62, -(2**62), 2**53 + 1, -(2**53) - 1, 2**53,
                  -(2**53), 0, 1, -1, 2**62 + 3, -(2**62) - 3, 7, -7,
                  2**40, -(2**40), 2**61, -(2**61), 13, -13, 2**50 + 7,
                  -(2**50) - 7, 3, -3, 2**33, -(2**33)], dtype=np.int64)
    j = np.array([1, -1, 2, -2, 3, -3, 7, -7, 10, -10, 4, -4, 5, -5,
                  6, -6, 8, -8, 9, -9, 11, -11, 12, -12, 13],
                 dtype=np.int64)
    b = np.array([(k % 2) == 0 for k in range(25)], dtype=np.bool_)
    c = np.array([(k % 3) == 0 for k in range(25)], dtype=np.bool_)
    return dict(x=x, y=y, i=i, j=j, h=h, b=b, c=c)

# ----------------------------------------------------------- expressions
# every expression must be valid for BOTH numpy eval and the translator
EXPRS = [
    # arithmetic + dtype joins
    "x + y", "x - y", "x * y", "x / y", "i + j", "i * j", "i / j",
    "x + i", "i - x",
    # floored mod / floor division (sign follows divisor in numpy);
    # zero and infinite divisors are load-bearing edges: numpy mod/fmod
    # by 0.0 is NaN (int: 0), and an infinite divisor follows Python's
    # divmod convention (mod(-5, inf) = inf, floor_divide(-5, inf) = -1)
    "x % y", "i % j", "x // y", "i // j", "fmod(x, y)", "fmod(i, j)",
    "x % 0.0", "x // 0.0", "fmod(x, 0.0)",
    "i % (j - j)", "i // (j - j)", "fmod(i, j - j)",
    # power (numpy float semantics; -8 ** 0.5 -> nan)
    "x ** 2", "x ** 0.5", "x ** y", "2 ** x", "x ** 3",
    "power(x, 2)",
    # C-pow |base|==1 corners (r21): 1**b = 1 for EVERY b including
    # NaN/±inf, (-1)**±inf = 1 — constant bases pair them with the
    # data's specials, which x**y alone never does
    "1.0 ** y", "(-1.0) ** y", "power(1.0, x)",
    # precedence / unary
    "-x ** 2", "-(x ** 2)", "(-x) ** 2", "-i // j", "~i", "~(i + j)",
    "x * -y", "x - -y",
    # comparisons (NaN-aware: any cmp with NaN is False except !=)
    "x < y", "x <= y", "x > y", "x >= y", "x == y", "x != y",
    "i < j", "i == j", "x < 1.0", "x != 0.0",
    # boolean algebra on bools, bitwise on ints
    "b & c", "b | c", "b ^ c", "~b",
    "i & j", "i | j", "i ^ j",
    "(x < y) & (i < j)", "(x < y) | ~c",
    # shifts (nonnegative shift counts only: numpy raises on negative)
    "i << 2", "i >> 2", "(i & 63) << (j & 7)",
    # huge-magnitude exact-int coverage (past 2^53, no overflow)
    "h + j", "h - j", "h // j", "h % j", "fmod(h, j)", "h >> 3",
    "h & j", "h | j", "h ^ j", "~h", "abs(h)", "-h // j",
    "h == h", "h < j",
    # unary functions: domain edges covered by the data specials
    "sqrt(x)", "cbrt(x)", "square(x)", "abs(x)", "abs(i)", "sign(x)",
    "exp(x)", "expm1(x)", "exp2(x)",
    "log(x)", "log10(x)", "log2(x)", "log1p(x)",
    "floor(x)", "ceil(x)", "trunc(x)", "rint(x)",
    "sin(x)", "cos(x)", "tan(x)", "sinh(x)", "cosh(x)", "tanh(x)",
    "arcsin(x / 10)", "arccos(x / 10)", "arctan(x)", "arctan2(x, y)",
    "arcsinh(x)", "arctanh(x / 10)", "arccosh(x)", "arccosh(abs(x) + 1.0)",
    "hypot(x, y)", "degrees(x)", "radians(x)", "deg2rad(x)",
    "rad2deg(x)",
    # binary functions: NaN propagation vs NaN skipping
    "minimum(x, y)", "maximum(x, y)", "fmin(x, y)", "fmax(x, y)",
    "clip(x, -1.0, 1.0)", "clip(i, -5, 5)",
    # selection + classification
    "where(x < y, x, y)", "where(b, i, j)",
    "isnan(x)", "isfinite(x)", "isinf(x)",
    "logical_and(b, c)", "logical_or(b, c)", "logical_not(b)",
    # compound expressions (the shapes real queries use)
    "sqrt(x * x + y * y)", "log(abs(x) + 1.0)",
    "(x - y) / (abs(y) + 1e-9)",
    "where(isfinite(x), x, 0.0) * 2.0 + 1.0",
    "sin(x) ** 2 + cos(x) ** 2",
    "(i % 7 == 0) & (x > 0.0)",
]

# ------------------------------------------------- random structural fuzz
# Seeded random expressions over a TYPED grammar (floats and bools only:
# every float op is total on both sides, so no ANSI-vs-wrap filtering can
# mask a parse bug).  Python eval of the SAME string is ground truth for
# precedence/associativity as well as values — a mis-parse diverges on
# most rows, unlike 1-row float-noise.  Cancellation-heavy forms can
# legitimately diverge past the tolerance (libm vs JVM ULP diffs
# amplified by subtraction of near-equal values); inspect reported rows
# before calling a divergence a bug.
RAND_N = 300

def rand_exprs(n, seed=20260816):
    import random
    rng = random.Random(seed)
    fn1 = ("sqrt cbrt square abs sign exp expm1 log log10 log1p floor "
           "ceil trunc rint sin cos tan tanh arctan arcsinh").split()
    fn2 = ["arctan2", "hypot", "fmin", "fmax", "minimum", "maximum", "fmod"]
    lits = ["0.5", "2.0", "3.0", "1.0", "7.25", "0.1", "10.0"]
    # integer atoms are BOUNDED (floored-mod wraps them into small
    # ranges on both sides identically) so the documented
    # loud-overflow-vs-numpy-wrap deviation never triggers; shift
    # counts are made nonnegative the same way
    # array-anchored int constants: bare python ints would make a
    # scalar-only subtree whose `% 0` is a true ZeroDivisionError in
    # the python oracle (columns never are — the reference evaluates
    # arrays), so every atom rides a zeroed column
    ilits = ["(j * 0 + 1)", "(j * 0 + 2)", "(i * 0 + 3)", "(i * 0 + 7)",
             "(h * 0 + 12)"]
    def I(d):
        if d <= 0:
            return rng.choice(["(i % 97)", "(j % 13)", "(h % 1021)"] + ilits)
        k = rng.randrange(8)
        if k < 3:
            return f"({I(d-1)} {rng.choice(['+', '-', '&', '|', '^'])} {I(d-1)})"
        if k == 3:
            return f"({I(d-1)} {rng.choice(['//', '%'])} {I(d-1)})"
        if k == 4:
            return f"({I(d-1)} << (j % 5 + 5))" if rng.randrange(2) else \
                   f"({I(d-1)} >> (i % 3 + 3))"
        if k == 5:
            return f"(~{I(d-1)})"
        if k == 6:
            return f"abs({I(d-1)})"
        return f"where({B(d-1)}, {I(d-1)}, {I(d-1)})"
    def F(d):
        if d <= 0:
            return rng.choice(["x", "y"] + lits)
        k = rng.randrange(11)
        if k < 4:
            op = rng.choice(["+", "-", "*", "/", "%", "//"])
            # mixed int/float promotion: one arm may be an int subtree
            a = I(1) if rng.randrange(6) == 0 else F(d-1)
            return f"{a} {op} {F(d-1)}"
        if k == 4:
            return f"{F(d-1)} ** {rng.choice(['2', '3', '0.5', '-1.0', '1.5'])}"
        if k < 7:
            return f"{rng.choice(fn1)}({F(d-1)})"
        if k == 7:
            return f"{rng.choice(fn2)}({F(d-1)}, {F(d-1)})"
        if k == 8:
            return f"where({B(d-1)}, {F(d-1)}, {F(d-1)})"
        if k == 9:
            return f"-{F(d-1)}"
        return f"({I(d-1)} + 0.0)"  # int subtree promoted to float
    def B(d):
        # a COLUMN on the left keeps every boolean a numpy array: with
        # scalar literals on both sides Python eval produces a python
        # bool, whose ~ is INTEGER complement (~True = -2) — an oracle
        # artifact, not reference semantics (the reference evaluates
        # columns)
        if d <= 0 or rng.randrange(4) == 0:
            return (f"({rng.choice(['x', 'y'])} "
                    f"{rng.choice(['<', '<=', '>', '>=', '==', '!='])} {F(0)})")
        k = rng.randrange(4)
        if k == 0: return f"({B(d-1)} & {B(d-1)})"
        if k == 1: return f"({B(d-1)} | {B(d-1)})"
        if k == 2: return f"(~{B(d-1)})"
        return f"isnan({F(d-1)})" if rng.randrange(2) else f"isfinite({F(d-1)})"
    depth = int(os.environ.get("PARITY_DEPTH", "0"))
    out = []
    for _ in range(n):
        r = rng.randrange(10)
        if r == 0:
            out.append(B(3))
        elif r <= 2:
            out.append(I(3))
        else:
            out.append(F(depth if depth else rng.randrange(2, 5)))
    return out

NP_NAMES = {n: getattr(np, n) for n in (
    "sqrt cbrt square abs sign exp expm1 exp2 log log10 log2 log1p "
    "floor ceil trunc rint sin cos tan sinh cosh tanh arcsin arccos "
    "arctan arctan2 arcsinh arccosh arctanh hypot degrees radians deg2rad "
    "rad2deg minimum maximum fmin fmax clip where isnan isfinite "
    "isinf logical_and logical_or logical_not fmod power").split()}

def gen():
    import pyarrow as pa, pyarrow.parquet as pq
    os.makedirs(OUT, exist_ok=True)
    seed = int(os.environ.get("PARITY_SEED", "20260816"))
    d = build_data()
    cols = {"row_id": pa.array(np.arange(25, dtype=np.int64))}
    for k, v in d.items():
        cols[k] = pa.array(v)
    pq.write_table(pa.table(cols), f"{OUT}/data.parquet")
    all_exprs = EXPRS + rand_exprs(RAND_N, seed=seed)
    with open(f"{OUT}/exprs.txt", "w") as f:
        for e in all_exprs:
            f.write(e + "\n")
    print(f"wrote {OUT}/data.parquet (25 rows) and {len(all_exprs)} expressions "
          f"({len(EXPRS)} curated + {RAND_N} random, seed-pinned)")

def np_eval(expr, data):
    with np.errstate(all="ignore"):
        return eval(expr, {"__builtins__": {}}, {**NP_NAMES, **data})

def precision_dominated(expr, data, row, w_row, g_row):
    """float128 cross-check: re-evaluate the numpy reference in
    longdouble.  If numpy's own float64 answer differs materially from
    its higher-precision answer at this row, the expression's value is
    dominated by rounding of intermediates (e.g. an all-LITERAL
    subtree like fmod(log(0.1) ** 27, exp(-0.001)) amplifies a 1-ulp
    pow difference by ~5e9 — input perturbation can't see it because
    there is no input), so a same-magnitude engine-vs-numpy gap is a
    conditioning artifact, not semantics."""
    try:
        d128 = {k: (v.astype(np.longdouble) if v.dtype == np.float64 else v)
                for k, v in data.items()}
        # FLOAT LITERALS must widen too (exactly: f64 value -> f128), or
        # an all-literal chaotic subtree evaluates identically to the
        # f64 pass and the check is vacuous there; int literals stay int
        import re as _re
        e128 = _re.sub(r"(?<![\w.])(\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)",
                       r"__ld(\1)", expr)
        d128["__ld"] = lambda v: np.longdouble(v)
        r = np.asarray(np_eval(e128, d128))
        wl = float(r[row] if r.ndim else r[()])
    except Exception:
        return False
    if np.isnan(w_row) and np.isnan(wl):
        return False  # agreement, not domination
    if np.isnan(w_row) != np.isnan(wl):
        return True   # NaN boundary moved with precision: dominated
    if not np.isfinite(w_row) or not np.isfinite(wl):
        return w_row != wl  # an infinity that flips with precision
    shift = abs(w_row - wl)
    if shift > 1e-9 * max(abs(w_row), abs(wl), 1e-300):
        return True
    # gap-relative arm: the f64->f128 shift being within 4x of the
    # engine-numpy gap means both are the same conditioning noise (a
    # pow-chain modulus amplified through %), not a semantics gap --
    # a real wrong-branch bug dwarfs the precision shift
    return np.isfinite(g_row) and shift * 4.0 >= abs(w_row - g_row) > 0

def ill_conditioned(expr, data, row, w_row, g_row):
    """1-ULP input sensitivity probe: perturb x/y at `row` by one ulp in
    each direction and re-evaluate.  If the numpy result itself swings
    by (or beyond) the engine-numpy gap, the expression is chaotic at
    this point (e.g. fmod by a `** 3`-tiny modulus amplifies a 1-ulp
    libm-vs-JVM difference by ~1e49; tan of a large argument moves by
    O(1) per ulp) — a conditioning artifact, not a semantics bug.
    Backstopped by [[precision_dominated]] for chaos the inputs can't
    reach (literal subtrees; saturated ±inf lanes)."""
    if precision_dominated(expr, data, row, w_row, g_row):
        return True
    spread = [w_row]
    for colname in ("x", "y"):
        for d in (1, -1):
            pert = {k: v.copy() for k, v in data.items()}
            v = pert[colname][row]
            if np.isfinite(v):
                pert[colname][row] = np.nextafter(v, d * np.inf)
            r = np.asarray(np_eval(expr, pert))
            spread.append(r[row] if r.ndim else r[()])
    spread = np.array(spread, dtype=np.float64)
    if np.isnan(spread).any() != np.isnan(spread).all():
        return True  # NaN boundary within one ulp: chaotic
    lo, hi = np.nanmin(spread), np.nanmax(spread)
    swing = hi - lo
    gap = abs(g_row - w_row)
    margin = 1e-9 * max(abs(w_row), abs(g_row), 1e-300)
    return swing + margin >= gap or (lo - margin <= g_row <= hi + margin)

def dtype_class(a):
    if a.dtype == np.bool_: return "bool"
    if np.issubdtype(a.dtype, np.integer): return "int"
    return "float"

def check():
    import glob
    import pyarrow.parquet as pq
    data = build_data()
    chunks = sorted(glob.glob(f"{OUT}/engine.parquet/chunk*"),
                    key=lambda p: int(p.rsplit("chunk", 1)[1]))
    assert chunks, "no engine chunks found — run graft.tools.NumpyParity first"
    eng = None
    for c in chunks:
        t = pq.read_table(c).to_pandas()
        eng = t if eng is None else eng.merge(t, on="row_id")
    eng = eng.sort_values("row_id")
    exprs = [l.strip() for l in open(f"{OUT}/exprs.txt") if l.strip()]
    findings = []
    for k, expr in enumerate(exprs):
        want = np.asarray(np_eval(expr, data))
        if want.ndim == 0:  # scalar broadcast (shouldn't happen with our corpus)
            want = np.full(25, want)
        col = f"e{k}"
        if col not in eng.columns:
            findings.append((expr, "MISSING column in engine output")); continue
        got = eng[col].to_numpy()
        wc, gc = dtype_class(want), dtype_class(np.asarray(got))
        if wc != gc:
            findings.append((expr, f"dtype class: numpy={want.dtype} engine={got.dtype}")); continue
        if wc in ("bool", "int"):
            bad = np.nonzero(want != got)[0]
            if len(bad):
                r = bad[0]
                findings.append((expr, f"row {r}: numpy={want[r]} engine={got[r]} ({len(bad)} rows differ)"))
            continue
        w = want.astype(np.float64); g = got.astype(np.float64)
        both_nan = np.isnan(w) & np.isnan(g)
        exact = (w == g) | both_nan
        # signed-zero check on the exact-equal lane is out of scope
        # (Spark normalizes -0.0 == 0.0); specials must match exactly
        with np.errstate(all="ignore"):
            rel = np.abs(g - w) / np.maximum(np.abs(w), 1e-300)
        ok = exact | (np.isfinite(w) & np.isfinite(g) & (rel <= 1e-12))
        bad = [r for r in np.nonzero(~ok)[0]
               if not ill_conditioned(expr, data, r, w[r], g[r])]
        if len(bad):
            r = bad[0]
            findings.append((expr, f"row {r}: numpy={w[r]!r} engine={g[r]!r} ({len(bad)} rows differ)"))
    if findings:
        print(f"{len(findings)} DIVERGENCES of {len(exprs)} expressions:")
        for e, msg in findings:
            print(f"  {e!r}: {msg}")
        sys.exit(1)
    print(f"{len(exprs)}/{len(exprs)} expressions match NumPy (bool/int exact, float rel<=1e-12)")

if __name__ == "__main__":
    {"gen": gen, "check": check}[sys.argv[1]]()
