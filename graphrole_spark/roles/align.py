"""Role alignment across model fits — NMF role indices are arbitrary
(any row permutation of G with the matching column permutation of F is
the same factorization), so "role_2 at cutoff T1" and "role_2 at T2"
name unrelated behaviors unless the fits are reconciled.

`pipeline.extract_roles_at_cutoffs` sidesteps this by fitting ONE
joint model over all cutoffs; alignment is for the cases where that is
impossible — separately fitted epochs, different `n_roles` chosen by
MDL in different months, a refreshed model that must stay comparable
with the dashboard built on the old one.

Everything here is driver-side numpy over the role→feature factors
(n_roles × n_features — tiny by construction; the reference's RolX
keeps the same factor in memory, dkaslovsky/GraphRole
graphrole/roles/extract.py), plus one codegen relabel projection."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_roles(
    factor_a: pd.DataFrame,
    factor_b: pd.DataFrame,
    min_similarity: float = 0.0,
) -> pd.DataFrame:
    """Match roles of fit B onto roles of fit A by greedy maximum
    cosine similarity over the role→feature factors (rows L2-
    normalized; compared on the INTERSECTION of feature columns —
    pruning may differ between fits).

    Greedy global-max matching (not Hungarian): at role counts ≤ tens
    the difference is immaterial and greedy is order-independent and
    auditable — each accepted pair's similarity is reported.

    Returns one row per role of B: ``(role_b, role_a, similarity,
    matched)`` — ``matched = 0`` when B's role found no partner (A had
    fewer roles, or best similarity < ``min_similarity``); unmatched
    roles keep ``role_a = None`` and represent genuinely new behavior.
    """
    shared = [c for c in factor_a.columns if c in set(factor_b.columns)]
    if not shared:
        raise ValueError("factors share no feature columns")
    A = factor_a[shared].to_numpy(dtype=float)
    B = factor_b[shared].to_numpy(dtype=float)

    def _norm(M):
        n = np.linalg.norm(M, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return M / n

    sim = _norm(B) @ _norm(A).T  # (rb, ra)
    rb, ra = sim.shape
    taken_a: set[int] = set()
    out = {i: (None, None) for i in range(rb)}
    order = np.dstack(
        np.unravel_index(np.argsort(-sim, axis=None), sim.shape)
    )[0]
    for i, j in order:
        i, j = int(i), int(j)
        if out[i][0] is not None or j in taken_a:
            continue
        if sim[i, j] < min_similarity:
            continue
        out[i] = (j, float(sim[i, j]))
        taken_a.add(j)
        if len(taken_a) == min(ra, rb):
            break
    rows = []
    for i in range(rb):
        j, s = out[i]
        rows.append(
            {
                "role_b": str(factor_b.index[i]),
                "role_a": None if j is None else str(factor_a.index[j]),
                "similarity": None if s is None else round(s, 9),
                "matched": int(j is not None),
            }
        )
    return pd.DataFrame(rows)


def relabel_assignments(
    roles: DataFrame,
    mapping: pd.DataFrame,
    role_col: str = "role",
    unmatched_prefix: str = "new:",
) -> DataFrame:
    """Rewrite a ``(node, role)`` assignment frame from fit B into fit
    A's labels using :func:`align_roles`' mapping — matched roles take
    their partner's name, unmatched ones get ``new:<role_b>`` so they
    stay distinguishable. One codegen CASE projection, no shuffle."""
    expr = F.col(role_col)
    out: Optional[F.Column] = None
    for _, r in mapping.iterrows():
        target = (
            r["role_a"] if r["matched"] else f"{unmatched_prefix}{r['role_b']}"
        )
        branch = F.when(expr == r["role_b"], F.lit(target))
        out = branch if out is None else out.when(
            expr == r["role_b"], F.lit(target)
        )
    if out is None:
        raise ValueError("empty mapping")
    return roles.withColumn(role_col, out.otherwise(expr))
