#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle in DuckDB over the parquet
tables in <sfDir>, and reports row/schema/value comparison per query
(exact + tolerant float compare so we can see how close we are).
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame):
    """(exact_match, tolerant_match, detail)"""
    if sorted(a.columns) != sorted(b.columns):
        return False, False, f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return False, False, f"rowcount {len(a)} vs {len(b)}"
    a, b = norm(a), norm(b)
    # sort rows by all columns for order-insensitive compare
    try:
        key_cols = list(a.columns)
        a = a.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
        b = b.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
    except Exception:
        pass
    exact = True
    tol = True
    detail = []

    def is_decimal_obj(s: pd.Series) -> bool:
        """object-dtype column whose non-null values are decimal.Decimal."""
        import decimal
        if s.dtype != object:
            return False
        nn = s.dropna()
        return len(nn) > 0 and all(isinstance(v, decimal.Decimal) for v in nn)

    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            # TYPE-PARITY: one side fixed-scale Decimal, the other float.
            # The driver hashes SERIALIZED values — Decimal('0.038360') and
            # 0.03836 hash differently even though they're numerically equal.
            # Float-normalizing here would hide exactly that divergence (it
            # did for q_tpch_q08 in r11), so flag it as a hard failure: the
            # local gate must be strictly STRICTER than the driver.
            a_dec, b_dec = is_decimal_obj(av), is_decimal_obj(bv)
            a_flt = pd.api.types.is_float_dtype(av)
            b_flt = pd.api.types.is_float_dtype(bv)
            if (a_dec and b_flt) or (b_dec and a_flt):
                exact = False; tol = False
                side = "spark" if a_dec else "oracle"
                detail.append(
                    f"{c}: TYPE-PARITY {side} is Decimal vs float — "
                    "serialization-sensitive; CAST the gate to DOUBLE on both dialects")
                continue
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                av = av.astype(float); bv = bv.astype(float)
                eq = ((av == bv) | (av.isna() & bv.isna()))
                if not eq.all():
                    exact = False
                    close = (abs(av - bv) <= 1e-6 * (1 + abs(bv))) | (av.isna() & bv.isna())
                    if not close.all():
                        tol = False
                        i = (~close).idxmax()
                        detail.append(f"{c}[{i}]: {av[i]!r} vs {bv[i]!r}")
                    else:
                        i = (~eq).idxmax()
                        detail.append(f"{c}[{i}] ~ {av[i]!r} vs {bv[i]!r} (tol ok)")
            else:
                av2 = av.astype(str); bv2 = bv.astype(str)
                eq = (av2 == bv2)
                if not eq.all():
                    exact = False; tol = False
                    i = (~eq).idxmax()
                    detail.append(f"{c}[{i}]: {av[i]!r} vs {bv[i]!r}")
        except Exception as e:
            exact = False; tol = False
            detail.append(f"{c}: compare error {e}")
    return exact, tol, "; ".join(detail[:3])


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = ("MISSING", "no spark output")
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            want = con.execute(sql).df()
        except Exception as e:
            results[name] = ("ORACLE_ERR", str(e)[:200])
            continue
        exact, tol, detail = compare(got, want)
        status = "EXACT" if exact else ("TOL" if tol else "FAIL")
        results[name] = (status, detail)
    # queries without oracle → rows-only
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle:
            files = glob.glob(f"{out_dir}/{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            results[d] = ("ROWS_ONLY", f"{n} rows")
    n_bad = 0
    for name, (status, detail) in sorted(results.items()):
        flag = {"EXACT": "ok ", "TOL": "~  ", "ROWS_ONLY": "r  "}.get(status, "BAD")
        if flag == "BAD":
            n_bad += 1
        print(f"{flag} {status:9s} {name:28s} {detail}")
    print(f"\n{len(results)} queries, {n_bad} failing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
