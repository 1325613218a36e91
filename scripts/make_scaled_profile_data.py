#!/usr/bin/env python
"""Build a 10x-scaled PROFILING dataset (default /root/scaled/sf1x) from
the read-only sf0.1 testdata, mimicking the driver's sf1.0 scale.

NOT used by bench.py or any query — profiling only (guide §1: measure at
the scale the driver measures). Construction per table: 10 copies with
key columns offset by copy*OFF so joins stay consistent; text is
token-rotated per copy (so copies are not near-duplicates of each
other); embeddings get a seeded dimension-permutation + sign-flip per
copy (intra-copy geometry exact, cross-copy cosines randomized);
timestamps are kept (the generator repeats the same window at any sf).
nation/region stay single-copy (fixed dimensions).

Output is written as a SINGLE row group per table, matching the
testdata layout (one unsplittable scan task — the property several
queries have to work around).
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/scaled/sf1x"
COPIES = int(os.environ.get("SCALE_COPIES", "10"))
OFF = 10_000_000  # key offset per copy; far above any sf0.1 key

os.makedirs(DST, exist_ok=True)

KEYS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}


def rotate_text(arr: pa.ChunkedArray, k: int) -> pa.Array:
    # Deterministic per-copy token SHUFFLE: a cyclic rotation preserves
    # nearly every n-gram shingle, which made every copy cluster a
    # minhash near-duplicate group (kept 1/10 of the corpus — a shape
    # the driver's distinct-document generator does not produce). A
    # full permutation keeps the unigram/token statistics (lm_score,
    # quality, mix budgets) while destroying cross-copy shingles.
    if k == 0:
        return arr.combine_chunks()
    rng = np.random.default_rng(9000 + k)
    texts = arr.to_pylist()
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        toks = t.split(" ")
        perm = rng.permutation(len(toks))
        out.append(" ".join(toks[i] for i in perm))
    return pa.array(out, type=pa.string())


def permute_embeddings(arr: pa.ChunkedArray, k: int) -> pa.Array:
    vals = arr.to_pylist()
    if k == 0:
        return arr.combine_chunks()
    dim = len(vals[0])
    rng = np.random.default_rng(1234 + k)
    perm = rng.permutation(dim)
    signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
    mat = np.asarray(vals, dtype=np.float32)
    mat = mat[:, perm] * signs[None, :]
    return pa.array(list(mat), type=pa.list_(pa.float32()))


for name in [
    "events", "documents", "embeddings", "customer", "lineitem",
    "orders", "part", "supplier", "nation", "region",
]:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    if name in ("nation", "region"):
        out = src
    else:
        parts = []
        for k in range(COPIES):
            cols = {}
            for field in src.schema:
                col = src[field.name]
                if field.name in KEYS[name]:
                    cols[field.name] = pc.add(col, k * OFF)
                elif name == "documents" and field.name == "text":
                    cols[field.name] = rotate_text(col, k)
                elif name == "embeddings" and field.name == "embedding":
                    cols[field.name] = permute_embeddings(col, k)
                else:
                    cols[field.name] = col.combine_chunks()
            parts.append(pa.table(cols))
        out = pa.concat_tables(parts).combine_chunks()
    pq.write_table(
        out, f"{DST}/{name}.parquet", row_group_size=out.num_rows
    )
    print(name, out.num_rows)
print("done ->", DST)
