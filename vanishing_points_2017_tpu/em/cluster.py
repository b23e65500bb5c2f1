"""Masked average-linkage agglomerative 2-clustering, inside jit.

The reference's split move clusters the worst VP's lines with
``sklearn.cluster.AgglomerativeClustering(linkage='average',
affinity='precomputed', n_clusters=2)`` (``vp_localisation.py:574-576`` of
fkluger/vanishing_points_2017) on a dense pairwise distance matrix. sklearn
cannot run inside an XLA program, and the merge count is data-dependent, so
this is a ``lax.while_loop`` over masked static shapes (SURVEY §7 hard-part
5): each step merges the closest active cluster pair and updates average-
linkage distances in closed form

    D[new, :] = (n_i D[i, :] + n_j D[j, :]) / (n_i + n_j)

until exactly two active clusters remain over the masked item set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e12


def agglomerative_two(dist: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Average-linkage clustering of the active items into 2 clusters.

    dist: (N, N) symmetric pairwise distances; active: (N,) item mask.
    Returns a boolean (N,) array: True for items in the cluster containing
    the lowest-indexed active item (False elsewhere, including inactive
    items). With < 3 active items no merging is needed.
    """
    n = dist.shape[0]
    labels0 = jnp.arange(n)
    sizes0 = jnp.ones(n)
    pair_ok = active[:, None] & active[None, :] & ~jnp.eye(n, dtype=bool)
    d0 = jnp.where(pair_ok, dist, BIG)
    num_active0 = jnp.sum(active)

    def cond(state):
        _, _, _, num_clusters = state
        return num_clusters > 2

    def body(state):
        d, labels, sizes, num_clusters = state
        # guard so the body is a no-op once this element reaches 2 clusters
        # (under vmap the loop runs while ANY batch element still merges)
        go = num_clusters > 2
        flat = jnp.argmin(d)
        i, j = flat // n, flat % n  # merge j into i
        ni, nj = sizes[i], sizes[j]
        newrow = (ni * d[i, :] + nj * d[j, :]) / (ni + nj)
        d2 = d.at[i, :].set(newrow).at[:, i].set(newrow)
        d2 = d2.at[j, :].set(BIG).at[:, j].set(BIG)
        d2 = d2.at[i, i].set(BIG)
        labels2 = jnp.where(labels == j, i, labels)
        sizes2 = sizes.at[i].set(ni + nj)
        return (jnp.where(go, d2, d), jnp.where(go, labels2, labels),
                jnp.where(go, sizes2, sizes),
                jnp.where(go, num_clusters - 1, num_clusters))

    _, labels, _, _ = jax.lax.while_loop(
        cond, body, (d0, labels0, sizes0, num_active0))

    first = jnp.argmax(active)  # lowest-indexed active item
    return active & (labels == labels[first])
