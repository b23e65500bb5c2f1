"""Initial vanishing-point proposals from the CNN grid + sphere image.

Masked, vectorized re-derivation of ``find_maxima`` and ``find_initial_vps``
(``vp_localisation.py:13-31, 111-165`` of fkluger/vanishing_points_2017).

Reference quirks preserved:

* ``find_maxima`` boundary handling uses ``a-1 > 0`` / ``b-1 > 0`` (not >= 0):
  neighbours at index 0 are treated as 0, so column/row 1 compares against 0
  instead of the true edge value.
* The sphere image is flipped vertically before patch extraction
  (``vp_localisation.py:113-114``: Agg's row 0 is beta=+pi/2, the grid's
  index convention wants beta increasing with the row index).
* Per selected grid cell, the VP position is the AVERAGE index of all pixels
  equal to the patch maximum; cells whose sphere patch is all-zero are
  skipped (``vp_localisation.py:141-142``).
* VPs are emitted in row-major (cell-row, cell-col) scan order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import coords


def find_maxima(cnn_response: jnp.ndarray) -> jnp.ndarray:
    """Strict 4-neighbour local maxima with the reference's edge quirk.

    Returns a boolean (B, A) mask. Neighbours: left/right along the second
    axis, up/down along the first; a neighbour AT index 0 (quirk: index
    ``x-1`` with ``x-1 > 0`` false) or beyond the far edge counts as 0.
    """
    r = cnn_response
    b_dim, a_dim = r.shape
    zeros_col = jnp.zeros((b_dim, 1), r.dtype)
    zeros_row = jnp.zeros((1, a_dim), r.dtype)
    # value at (b, a+1); 0 past the right edge
    vu = jnp.concatenate([r[:, 1:], zeros_col], axis=1)
    # value at (b, a-1); 0 when a-1 <= 0  (columns 0 and 1 see 0)
    vd = jnp.concatenate([zeros_col, zeros_col, r[:, 1:-1]], axis=1)
    # value at (b-1, a); 0 when b-1 <= 0
    vl = jnp.concatenate([zeros_row, zeros_row, r[1:-1, :]], axis=0)
    # value at (b+1, a); 0 past the bottom edge
    vr = jnp.concatenate([r[1:, :], zeros_row], axis=0)
    return (r > vu) & (r > vd) & (r > vl) & (r > vr)


def find_initial_vps(sphere_image: jnp.ndarray, cnn_response: jnp.ndarray,
                     num_max: int, m_slots: int):
    """CNN maxima -> refined hemisphere points via the sphere image.

    sphere_image: (S, S) in Agg orientation (row 0 = beta +pi/2);
    cnn_response: (B, A) sigmoid grid. Returns (v0, alive):
    v0 (m_slots, 3) unit hemisphere VPs packed in row-major cell order,
    alive (m_slots,) validity mask. At most num_max cells are used.
    """
    sphere = jnp.flip(sphere_image.astype(jnp.float32), axis=0)
    b_dim, a_dim = cnn_response.shape
    s_dim = sphere.shape[0]
    pb, pa = s_dim // b_dim, sphere.shape[1] // a_dim  # patch size (25, 25)

    maxima = find_maxima(cnn_response)
    flat = cnn_response.reshape(-1)
    flat_max = maxima.reshape(-1)
    scores = jnp.where(flat_max, flat, -jnp.inf)
    # keep only the num_max best maxima (reference: argsort + zero the rest)
    k = min(num_max, flat.shape[0])
    topv, _ = jax.lax.top_k(scores, k)
    kth = topv[k - 1]
    selected = flat_max & (scores >= kth) & jnp.isfinite(scores)

    # per-cell patch statistics of the flipped sphere image
    patches = sphere.reshape(b_dim, pb, a_dim, pa)
    pmax = jnp.max(patches, axis=(1, 3))  # (B, A)
    eq = patches >= pmax[:, None, :, None]
    cnt = jnp.sum(eq, axis=(1, 3))
    rows = jnp.arange(pb, dtype=jnp.float32)[None, :, None, None]
    cols = jnp.arange(pa, dtype=jnp.float32)[None, None, None, :]
    avg_row = jnp.sum(eq * rows, axis=(1, 3)) / cnt
    avg_col = jnp.sum(eq * cols, axis=(1, 3)) / cnt

    # all-zero patches are skipped (reference's empty maxed_idx continue)
    selected = selected & (pmax.reshape(-1) > 0)

    cell_b = jnp.repeat(jnp.arange(b_dim), a_dim).astype(jnp.float32)
    cell_a = jnp.tile(jnp.arange(a_dim), b_dim).astype(jnp.float32)
    # index[0] = alpha axis (columns), index[1] = beta axis (rows)
    idx_alpha = avg_col.reshape(-1) + cell_a * pa
    idx_beta = avg_row.reshape(-1) + cell_b * pb
    angles = coords.index_to_angle(
        jnp.stack([idx_alpha, idx_beta], axis=-1), sphere.shape)
    vps = coords.angle_to_point(angles)  # (B*A, 3)

    # pack selected cells into the leading slots, preserving scan order
    order = jnp.argsort(~selected, stable=True)  # selected first, in order
    packed = vps[order[:m_slots]]
    alive = jnp.sum(selected) > jnp.arange(m_slots)
    packed = jnp.where(alive[:, None], packed, 0.0)
    return packed, alive
