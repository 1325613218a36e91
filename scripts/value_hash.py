#!/usr/bin/env python
"""Order-insensitive value hash of declared queries — for before/after
parity when restructuring a query (optimization rounds). Mirrors the
driver's canonicalization: columns sorted by name, floats rounded to 6,
rows sorted by value.

Usage: python scripts/value_hash.py <sf_dir> <query> [query ...]
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from graphrole_spark.session import get_spark

    spark = get_spark("value_hash", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    for name in names:
        pdf = canon(queries[name](spark, sf_dir).toPandas())
        h = hashlib.sha256(
            pdf.to_csv(index=False).encode()
        ).hexdigest()[:16]
        print(f"{name} rows={len(pdf)} hash={h}", flush=True)


if __name__ == "__main__":
    main()
