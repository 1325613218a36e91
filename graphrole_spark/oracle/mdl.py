"""Minimum-description-length costs for role-model selection.

Semantics per the reference (graphrole/roles/description_length.py:8-61)
and §2.3 of the RolX paper (Henderson et al., KDD 2012):

* encoding cost = ceil(log2(max unique count over both factors)) times
  the total number of factor cells;
* error cost = KL divergence sum(v1*log(v1/v2) - v1 + v2) over cells
  where v1 != 0 (zero cells contribute exactly 0).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def encoding_cost(G_encoded: np.ndarray, F_encoded: np.ndarray) -> float:
    n_vals = max(len(np.unique(G_encoded)), len(np.unique(F_encoded)))
    bits = float(np.ceil(np.log2(n_vals))) if n_vals > 1 else 0.0
    return bits * (G_encoded.size + F_encoded.size)


def error_cost(V: np.ndarray, V_approx: np.ndarray) -> float:
    a = np.asarray(V, dtype=np.float64).ravel()
    b = np.asarray(V_approx, dtype=np.float64).ravel()
    nz = a != 0
    logs = np.zeros_like(a)
    np.log(np.divide(a, b, where=nz, out=np.ones_like(a)), where=nz, out=logs)
    return float(np.sum(np.where(nz, a * logs - a + b, 0.0)))


def description_length_costs(
    V: np.ndarray, model: Tuple[np.ndarray, np.ndarray]
) -> Tuple[float, float]:
    G_enc, F_enc = model
    V_arr = V.values if hasattr(V, "values") else np.asarray(V)
    return encoding_cost(G_enc, F_enc), error_cost(V_arr, G_enc @ F_enc)
