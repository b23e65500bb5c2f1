"""Reference-shaped result contracts.

The EM core returns masked fixed-slot arrays (TPU-native); the reference
returns compact arrays keyed exactly as ``vp_localisation.py:441-442`` of
fkluger/vanishing_points_2017. This module converts between the two and
offers a ``run_em_single``-style convenience entry
(``evaluation.py:332-354``) for users migrating from the reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .em import EMConfig, EMResult, expectation_maximisation


def em_result_to_dict(res: EMResult) -> dict:
    """Masked slots -> the reference's compact result dict.

    VP slot indices in ``vp_assoc`` are renumbered to the compact order;
    outliers stay -1. An invalid result maps to the reference's empty dict
    (``vp_localisation.py:205-206``: vp=None etc.).
    """
    if not bool(res.valid):
        return {"vp_assoc": None, "vp": None, "counts": None,
                "count_id": None, "decision_metric": None, "iterations": 0}

    alive = np.asarray(res.alive).astype(bool)
    slots = np.flatnonzero(alive)
    renumber = np.full(alive.shape[0], -1, np.int64)
    renumber[slots] = np.arange(slots.shape[0])

    assoc = np.asarray(res.vp_assoc)
    assoc_c = np.where(assoc >= 0, renumber[np.clip(assoc, 0, None)], -1)

    return {
        "vp": np.asarray(res.vp)[alive],
        "vp_assoc": assoc_c,
        "counts": np.asarray(res.counts)[alive],
        "counts_weighted": np.asarray(res.counts_weighted)[alive],
        "count_id": None,
        "decision_metric": np.asarray(res.decision_metric)[alive],
        "sigma": np.exp(np.asarray(res.log_sigma))[alive],
        "iterations": int(res.iterations),
    }


def run_em_single(lines: np.ndarray, line_segments: np.ndarray,
                  cnn_prediction: np.ndarray, sphere_image: np.ndarray,
                  distance_measure: str = "angle", use_weights: bool = True,
                  do_split: bool = True, do_merge: bool = True,
                  n_pad: int = 512) -> dict:
    """Reference-style one-image EM (``run_em_single``): compact dict out.

    lines: (N, 3), line_segments: (N, 4) in the normalized frame,
    cnn_prediction: (20, 20), sphere_image: (S, S) Agg orientation.
    """
    cfg = EMConfig(distance_measure=distance_measure,
                   use_weights=use_weights, do_split=do_split,
                   do_merge=do_merge)
    n = lines.shape[0]
    if n > n_pad:
        raise ValueError(f"{n} lines exceed the n_pad bucket {n_pad}")
    l = np.zeros((n_pad, 3), np.float32)
    lp = np.zeros((n_pad, 4), np.float32)
    l[:n] = lines[:, :3]
    lp[:n] = line_segments[:, :4]
    lmask = np.arange(n_pad) < n
    res = expectation_maximisation(
        jnp.asarray(l), jnp.asarray(lp),
        jnp.asarray(cnn_prediction, dtype=jnp.float32),
        jnp.asarray(sphere_image, dtype=jnp.float32),
        jnp.asarray(lmask), cfg)
    out = em_result_to_dict(res)
    if out["vp_assoc"] is not None:
        out["vp_assoc"] = out["vp_assoc"][:n]
    return out
