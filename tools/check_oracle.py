#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff values.

Usage: python3 tools/check_oracle.py [sfdir] [verify_out_dir]

Not part of the Scala library — a development harness only (the real
gate is driver-side).
"""
import duckdb, glob, json, math, sys
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # decimal.Decimal etc -> float where numeric
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def num_class(s) -> str:
    """integer / float / other — the driver's value hash renders 1 vs 1.0
    differently, so an int-vs-float drift between Spark and the oracle is a
    hash fail even when the values are numerically equal (round-13 q08)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "integer"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"COLUMNS spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in sorted(a.columns):
        ca, cb = num_class(a[c]), num_class(b[c])
        # Decimal comes back as object from both engines; only flag when both
        # sides are concretely numeric and the classes disagree.
        if {ca, cb} == {"integer", "float"}:
            return (f"TYPE-CLASS col={c} spark={a[c].dtype} oracle={b[c].dtype} "
                    f"(driver hash renders these differently — cast one side)")
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            both_nan = av.isna() & bv.isna()
            diff = (av - bv).abs()
            scale = bv.abs().clip(lower=1.0)
            bad = ~both_nan & ~((diff / scale) < 1e-9)
            if bad.any():
                i = bad.idxmax()
                return f"VALUE col={c} row={i} spark={av[i]} oracle={bv[i]}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                i = neq.idxmax()
                return f"VALUE col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
    return "OK"


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    dumps = {p.split("/")[-1] for p in glob.glob(f"{out}/*") if not p.endswith(".json")}
    n_ok = 0
    for name in sorted(dumps):
        spark_df = pd.read_parquet(f"{out}/{name}")
        if name not in oracle:
            print(f"{name}: rows-only ({len(spark_df)} rows) " +
                  ("OK" if len(spark_df) > 0 else "EMPTY!"))
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            continue
        verdict = compare(name, spark_df, duck_df)
        if verdict == "OK":
            n_ok += 1
            print(f"{name}: OK ({len(spark_df)} rows)")
        else:
            print(f"{name}: MISMATCH {verdict}")
    missing = set(oracle) - dumps
    for name in sorted(missing):
        print(f"{name}: NO SPARK DUMP (query failed?)")
    print(f"\n{n_ok}/{len(oracle)} oracle-checked queries OK")


if __name__ == "__main__":
    main()
