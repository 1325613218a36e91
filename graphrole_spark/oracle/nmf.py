"""Non-negative matrix factorization: NNDSVDa init + multiplicative updates.

The reference delegates to sklearn's ``NMF(solver='mu', init='nndsvda')``
(reference: graphrole/roles/factor.py:10-26). sklearn is not installed
here, so this module implements the same published algorithms from
scratch:

* NNDSVDa initialization (Boutsidis & Gallopoulos, "SVD based
  initialization: A head start for nonnegative matrix factorization",
  Pattern Recognition 2008): per-component SVD sign-split, zeros filled
  with the matrix mean — fully deterministic.
* Multiplicative updates for the Frobenius objective (Lee & Seung, NIPS
  2000), with the standard small-epsilon guard against division by zero.

Bitwise parity with sklearn is neither attainable nor required — the
reference tests pin only shapes, non-negativity and the MDL model
choice, and a poorly converged factorization is rejected by cost, not
by exception (same policy as the reference, factor.py:20-23).

The distributed engine reuses ``mu_update_G`` / gram-matrix algebra from
here: G-row blocks update independently given F (embarrassingly
parallel), F updates need only the k×k and k×m partial products — the
math is identical on a numpy block or an Arrow batch.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_EPS = float(np.finfo(np.float64).eps)


def nndsvda_init(X: np.ndarray, rank: int) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic SVD-based non-negative initialization (variant 'a')."""
    n, m = X.shape
    U, S, Vt = np.linalg.svd(X, full_matrices=False)
    W = np.zeros((n, rank))
    H = np.zeros((rank, m))

    W[:, 0] = np.sqrt(S[0]) * np.abs(U[:, 0])
    H[0, :] = np.sqrt(S[0]) * np.abs(Vt[0, :])

    for j in range(1, rank):
        x, y = U[:, j], Vt[j, :]
        xp, xn = np.clip(x, 0, None), np.clip(-x, 0, None)
        yp, yn = np.clip(y, 0, None), np.clip(-y, 0, None)
        xp_n, yp_n = np.linalg.norm(xp), np.linalg.norm(yp)
        xn_n, yn_n = np.linalg.norm(xn), np.linalg.norm(yn)
        mp, mn = xp_n * yp_n, xn_n * yn_n
        if mp >= mn:
            u = xp / xp_n if xp_n > 0 else xp
            v = yp / yp_n if yp_n > 0 else yp
            sigma = mp
        else:
            u = xn / xn_n if xn_n > 0 else xn
            v = yn / yn_n if yn_n > 0 else yn
            sigma = mn
        W[:, j] = np.sqrt(S[j] * sigma) * u
        H[j, :] = np.sqrt(S[j] * sigma) * v

    # variant 'a': replace zeros with the mean of X (keeps MU alive,
    # since multiplicative updates cannot move a cell off exact zero)
    avg = X.mean()
    W[W <= 0] = avg
    H[H <= 0] = avg
    return W, H


def mu_update_G(G: np.ndarray, V: np.ndarray, F: np.ndarray) -> np.ndarray:
    """One Frobenius multiplicative update of the left factor.

    Row-decomposable: each row of G depends only on the matching row of
    V and on F — this is the executor-side kernel of the distributed NMF.
    """
    numer = V @ F.T
    denom = G @ (F @ F.T) + _EPS
    return G * (numer / denom)


def mu_update_F(F: np.ndarray, GtV: np.ndarray, GtG: np.ndarray) -> np.ndarray:
    """One Frobenius multiplicative update of the right factor.

    Consumes only the k×m and k×k partial sums (driver-side reduce of
    executor block products at scale).
    """
    denom = GtG @ F + _EPS
    return F * (GtV / denom)


def nmf(
    X: np.ndarray,
    rank: int,
    max_iter: int = 200,
    tol: float = 1e-4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Factor X ≈ G @ F with non-negative factors.

    :returns: (G: n×rank, F: rank×m), both non-negative float64.
    """
    X = np.asarray(X, dtype=np.float64)
    if np.any(X < 0):
        raise ValueError("NMF input must be non-negative")
    rank = int(rank)
    if rank < 1 or rank > min(X.shape):
        raise ValueError(f"rank must be in [1, min(X.shape)]; got {rank}")

    G, F = nndsvda_init(X, rank)
    err_init = np.linalg.norm(X - G @ F)
    prev_err = err_init
    for it in range(max_iter):
        G = mu_update_G(G, X, F)
        F = mu_update_F(F, G.T @ X, G.T @ G)
        if (it + 1) % 10 == 0 and err_init > 0:
            err = np.linalg.norm(X - G @ F)
            if (prev_err - err) / err_init < tol:
                break
            prev_err = err
    return G, F
