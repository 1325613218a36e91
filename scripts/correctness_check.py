"""Driver-mimic correctness harness.

Runs every ``queries()`` entry from ``__spark_entry__.py`` at sf0.01 and
compares it against the matching ``oracle_sql()`` statement executed by
DuckDB over the same parquet tables, the way the round driver does:
row count, column-name set, and a value hash computed after sorting
columns by name and rows by value.

Beyond the driver's green/red, this also reports *dtype* divergence
between the two pandas frames (int64 vs float64, object vs string...)
because the driver's value hash is dtype-sensitive — that exact gap is
what turned ``pack_greedy`` red in round 2 while every value matched.

Usage:
    python scripts/correctness_check.py [--sf-dir /root/testdata/sf0.01] \
        [--only name1,name2] [--skip-tail]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            # round to kill 1-ulp formatting noise; oracles already round
            df[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s) or s.dtype == object and s.map(
            lambda v: isinstance(v, int) or v is None
        ).all():
            try:
                df[c] = s.astype("Int64")
            except (TypeError, OverflowError):
                pass
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip-tail", action="store_true",
                    help="skip the rows-only queries (no oracle)")
    ap.add_argument("--all-oracles", action="store_true",
                    help="adjudicate against the FULL _oracle_sql_all() "
                         "twin set, not just the driver-facing window")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from graphrole_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    if args.all_oracles:
        oracles = entry._oracle_sql_all()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    only = {s for s in args.only.split(",") if s}
    results: dict[str, dict] = {}
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            if not args.skip_tail:
                t0 = time.time()
                try:
                    rows = fn(spark, args.sf_dir).count()
                    results[name] = {"err": "no_oracle", "spark_rows": rows,
                                     "sec": round(time.time() - t0, 2)}
                    print(f"{name:24s} rows-only  rows={rows}")
                except Exception as e:  # noqa: BLE001
                    n_fail += 1
                    results[name] = {"err": repr(e)}
                    print(f"{name:24s} ERROR {e!r}")
            continue
        t0 = time.time()
        try:
            sdf = canon(fn(spark, args.sf_dir).toPandas())
            odf = canon(con.execute(oracles[name]).df())
            rows_ok = len(sdf) == len(odf)
            schema_ok = list(sdf.columns) == list(odf.columns)
            hash_ok = rows_ok and schema_ok and value_hash(sdf) == value_hash(odf)
            dtype_notes = [
                f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
                for c in sdf.columns
                if schema_ok and str(sdf[c].dtype) != str(odf[c].dtype)
            ]
            ok = rows_ok and schema_ok and hash_ok
            if not ok:
                n_fail += 1
            results[name] = {
                "rows_match": rows_ok, "schema_match": schema_ok,
                "hash_match": hash_ok, "spark_rows": len(sdf),
                "oracle_rows": len(odf), "dtype_notes": dtype_notes,
                "sec": round(time.time() - t0, 2),
            }
            flag = "ok " if ok else "FAIL"
            extra = f"  DTYPE {dtype_notes}" if dtype_notes else ""
            print(f"{name:24s} {flag} rows={len(sdf)}/{len(odf)} "
                  f"{results[name]['sec']:6.1f}s{extra}")
            if not ok and rows_ok and schema_ok:
                merged = sdf.compare(odf) if sdf.shape == odf.shape else None
                if merged is not None and len(merged):
                    print(merged.head(5).to_string())
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            results[name] = {"err": traceback.format_exc(limit=3)}
            print(f"{name:24s} ERROR {e!r}")

    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: --only names not in queries(): {sorted(unknown)}")
        n_fail += 1

    out = "/tmp/correctness_local.json"
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"\n{len(results)} checked, {n_fail} failures -> {out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
