"""Responsibility regularisation, VP refits and inlier counting.

Dense masked re-derivations of ``weight_matrix`` (``vp_localisation.py:
515-524``), ``calc_new_vanishing_point`` (``vp_localisation.py:453-479``) and
``calc_vp_line_counts`` (``vp_localisation.py:482-512``) of
fkluger/vanishing_points_2017.

``calc_new_vanishing_point`` replaces the reference's SVD of the N x 3
weighted line matrix with the smallest eigenvector of the 3 x 3 Gram matrix
L^T diag(w~^2) L — identical null direction, but a fixed-size symmetric
eigenproblem that vmaps and compiles cleanly on TPU (SURVEY §7 hard-part 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import probability as prob


def weight_matrix(p_vl: jnp.ndarray, lweight: jnp.ndarray, lsim: jnp.ndarray,
                  bias: float = 1.0) -> jnp.ndarray:
    """Smooth responsibilities across similar lines.

    w[m, k] = (w'[k] + bias lw[k] <w', lsim[:, k]>) /
              (1 + bias lw[k] sum_n lsim[n, k]),   w' = p_vl[m, :] * lweight.

    One (M, N) x (N, N) matmul — the reference's dominant O(M N^2) Python
    loop, mapped onto the MXU. Rows of dead VP slots (p_vl row = 0) stay 0;
    invalid lines (lweight = 0, lsim row/col = 0) stay 0.
    """
    wp = p_vl * lweight[None, :]  # (M, N)
    smooth = wp @ lsim  # (M, N)
    colsum = jnp.sum(lsim, axis=0)  # (N,)
    return (wp + bias * lweight[None, :] * smooth) / \
        (1.0 + bias * lweight * colsum)[None, :]


def calc_new_vanishing_point(l: jnp.ndarray, w: jnp.ndarray):
    """Weighted total-least-squares VP: null vector of diag(w / max w) @ L.

    l: (N, 3) unit lines, w: (N,) nonnegative weights (zero on padding).
    Returns (vp (3,), valid ()). valid is False when all weights are zero
    (the reference returns None there). The sign fix multiplies by
    sign(z) — a VP with z exactly 0 collapses to the zero vector, matching
    ``vp_localisation.py:474``; downstream NaN/err checks then remove it.
    """
    wmax = jnp.max(w)
    valid = wmax > 0
    wn = w / jnp.where(valid, wmax, 1.0)
    lw = l * wn[:, None]
    gram = lw.T @ lw  # (3, 3) = L^T diag(wn^2) L
    _, vecs = jnp.linalg.eigh(gram)
    vp = vecs[:, 0]  # smallest eigenvalue's eigenvector = SVD null direction
    vp = vp / jnp.linalg.norm(vp)
    vp = vp * jnp.sign(vp[2])
    return vp, valid


def assoc_argmax(w: jnp.ndarray, alive: jnp.ndarray,
                 lmask: jnp.ndarray) -> jnp.ndarray:
    """Per-line best VP slot by weight; -1 for invalid lines.

    Dead slots are pushed to -1 weight so they can never win a tie against an
    alive slot (the reference has no dead slots to begin with).
    """
    wm = jnp.where(alive[:, None], w, -1.0)
    a = jnp.argmax(wm, axis=0)
    return jnp.where(lmask, a, -1)


def calc_vp_line_counts(vp: jnp.ndarray, alive: jnp.ndarray, l: jnp.ndarray,
                        lp: jnp.ndarray, lmask: jnp.ndarray,
                        log_s: jnp.ndarray, decision_metric: jnp.ndarray,
                        lweights: jnp.ndarray, distance_measure: str,
                        thresh: float = 1.96 ** 2):
    """Inlier counting with outlier rejection (``calc_vp_line_counts``).

    Line n belongs to its argmax VP m unless its distance exceeds
    thresh * sqrt(s_m) or its weight is zero. Returns
    (counts (M,), counts_weighted (M,), vp_assoc (N,) with -1 outliers).
    """
    n = l.shape[0]
    assoc = assoc_argmax(decision_metric, alive, lmask)
    safe = jnp.clip(assoc, 0, vp.shape[0] - 1)
    vpn = vp[safe]  # (N, 3)

    if distance_measure == "dotprod":
        dist = jnp.abs(jnp.sum(vpn * l, axis=-1))
    elif distance_measure == "angle":
        dist = prob.calc_lvsq_single(vpn, lp)
    elif distance_measure == "area":
        dist = prob.calc_lvsq_area_single(vpn, lp)
    else:
        raise ValueError(f"unknown distance measure: {distance_measure}")

    cut = thresh * jnp.exp(0.5 * log_s)[safe]
    keep = (assoc >= 0) & ~(dist > cut) & (lweights != 0)
    assoc = jnp.where(keep, assoc, -1)

    onehot = (assoc[None, :] == jnp.arange(vp.shape[0])[:, None])  # (M, N)
    counts = jnp.sum(onehot, axis=1).astype(l.dtype)
    counts_weighted = jnp.sum(onehot * lweights[None, :], axis=1)
    return counts, counts_weighted, assoc
