"""Batch-vectorized Pallas raster CCL for the device line detector.

``lines_device._connected_components`` runs the classic raster
connected-components pass as a ``lax.scan`` over rows: per row, inject
min labels from the previous row through the N/NW/NE edges, then spread
within the row by two segmented min scans (W/E edges). On TPU the scan
executes one (1, W) row body per step — measured ~0.47 us/row, ~2.4
ms/img for 8 passes at 640x640 (BASELINE.md round-3 stage table), with
the VPU mostly idle: a (1, W) int32 row occupies 1/8 of each vreg's
sublanes and the per-step loop overhead dominates.

This kernel restores the wasted vector width by processing the SAME row
of EVERY image in the batch as one (B, W) vector op. Rows stream
HBM->VMEM in blocks of R rows per sequential grid step; the previous
row's final labels are carried in a VMEM scratch across grid steps
(TPU grids execute in order). One ``pallas_call`` per half-pass;
descending and ascending variants differ only in row order and which
neighbour bits inject.

Semantics are exactly ``_connected_components``'s: same edge masks
(packed here as one int32 bit-plane), same min-label lattice, same
pass alternation — the fixpoint tests (BFS oracle) apply unchanged.
Replaces the hot path of /root/reference's LSD region growing
(evaluation.py:238) on device; the XLA scan stays for CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = jnp.iinfo(jnp.int32).max

# bit index per neighbour direction, following lines_device._NEIGHBOURS
_BIT = {(-1, -1): 0, (-1, 0): 1, (-1, 1): 2, (0, -1): 3,
        (0, 1): 4, (1, -1): 5, (1, 0): 6, (1, 1): 7}


def _half_pass_kernel(lab_ref, mask_ref, out_ref, prev_ref, *,
                      rows: int, wp: int, asc: bool):
    """One raster half pass over an (B, R, Wp) row block.

    prev_ref (B, Wp) scratch carries the previous (already final) row's
    labels across grid steps; rows inside the block are processed
    sequentially (static unroll), all B images at once.
    """
    lane_i = jax.lax.broadcasted_iota(jnp.int32, prev_ref.shape, 1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        prev_ref[...] = jnp.full(prev_ref.shape, _I32_MAX, jnp.int32)

    if asc:
        b_up, b_upl, b_upr = _BIT[(1, 0)], _BIT[(1, -1)], _BIT[(1, 1)]
        order = range(rows - 1, -1, -1)
    else:
        b_up, b_upl, b_upr = _BIT[(-1, 0)], _BIT[(-1, -1)], _BIT[(-1, 1)]
        order = range(rows)
    b_w, b_e = _BIT[(0, -1)], _BIT[(0, 1)]

    log_w = max(1, math.ceil(math.log2(wp)))
    for i in order:
        row = lab_ref[:, i, :]
        mrow = mask_ref[:, i, :]
        prev = prev_ref[...]

        mu = (mrow >> b_up) & 1
        mul = (mrow >> b_upl) & 1
        mur = (mrow >> b_upr) & 1
        up = jnp.where(mu == 1, prev, _I32_MAX)
        upl_v = pltpu.roll(prev, 1, 1)                 # prev[x-1]
        upl = jnp.where((mul == 1) & (lane_i >= 1), upl_v, _I32_MAX)
        upr_v = pltpu.roll(prev, wp - 1, 1)            # prev[x+1]
        upr = jnp.where((mur == 1) & (lane_i < wp - 1), upr_v, _I32_MAX)
        init = jnp.minimum(jnp.minimum(row, up), jnp.minimum(upl, upr))

        # forward segmented min scan (conn[x]: x joins x-1)
        v, m = init, (mrow >> b_w) & 1
        for k in range(log_w):
            d = 1 << k
            v_sh = jnp.where(lane_i >= d, pltpu.roll(v, d, 1), _I32_MAX)
            m_sh = jnp.where(lane_i >= d, pltpu.roll(m, d, 1), 0)
            v = jnp.where(m == 1, jnp.minimum(v, v_sh), v)
            m = m * m_sh
        # backward segmented min scan (conn[x]: x joins x+1)
        v2, m2 = init, (mrow >> b_e) & 1
        for k in range(log_w):
            d = 1 << k
            v_sh = jnp.where(lane_i < wp - d,
                             pltpu.roll(v2, wp - d, 1), _I32_MAX)
            m_sh = jnp.where(lane_i < wp - d,
                             pltpu.roll(m2, wp - d, 1), 0)
            v2 = jnp.where(m2 == 1, jnp.minimum(v2, v_sh), v2)
            m2 = m2 * m_sh
        out = jnp.minimum(v, v2)
        out_ref[:, i, :] = out
        prev_ref[...] = out


def _pack_masks(active: jnp.ndarray, ux: jnp.ndarray, uy: jnp.ndarray,
                cos_tol: float) -> jnp.ndarray:
    """(B, H, W) activity + level-line direction -> int32 bit plane of
    the 8 directed edge masks (lines_device._edge_masks, batched)."""

    def shift(a, dy, dx, fill):
        b, h, w = a.shape
        p = jnp.pad(a, ((0, 0), (1, 1), (1, 1)), constant_values=fill)
        return jax.lax.dynamic_slice(p, (0, 1 + dy, 1 + dx), (b, h, w))

    packed = jnp.zeros(active.shape, jnp.int32)
    for (dy, dx), bit in _BIT.items():
        dot = ux * shift(ux, dy, dx, 0.0) + uy * shift(uy, dy, dx, 0.0)
        edge = active & shift(active, dy, dx, False) & (dot > cos_tol)
        packed = packed | (edge.astype(jnp.int32) << bit)
    return packed


@functools.partial(jax.jit,
                   static_argnames=("cos_tol", "passes", "rows_per_block",
                                    "interpret"))
def connected_components_pallas_batch(active: jnp.ndarray, ux: jnp.ndarray,
                                      uy: jnp.ndarray, cos_tol: float,
                                      passes: int = 8,
                                      rows_per_block: int = 8,
                                      interpret: bool = False) -> jnp.ndarray:
    """Batched min-label raster CCL: (B, H, W) -> (B, H*W) int32 roots.

    Drop-in batched equivalent of ``lines_device._connected_components``
    (inactive pixels keep their own flat index; labels are flat indices
    into the unpadded (H, W) grid).
    """
    b, h, w = active.shape
    wp = ((w + 127) // 128) * 128
    r = rows_per_block
    hp = ((h + r - 1) // r) * r

    packed = _pack_masks(active, ux, uy, cos_tol)
    packed = jnp.pad(packed, ((0, 0), (0, hp - h), (0, wp - w)))
    row_i = jax.lax.broadcasted_iota(jnp.int32, (b, hp, wp), 1)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (b, hp, wp), 2)
    lab = jnp.where((row_i < h) & (col_i < w), row_i * w + col_i, _I32_MAX)

    grid = hp // r
    specs = dict(
        in_specs=[
            pl.BlockSpec((b, r, wp), lambda g: (0, g, 0)),
            pl.BlockSpec((b, r, wp), lambda g: (0, g, 0)),
        ],
        out_specs=pl.BlockSpec((b, r, wp), lambda g: (0, g, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b, wp), jnp.int32)],
        grid=(grid,),
        interpret=interpret,
    )
    specs_rev = dict(specs)
    specs_rev["in_specs"] = [
        pl.BlockSpec((b, r, wp), lambda g, n=grid: (0, n - 1 - g, 0)),
        pl.BlockSpec((b, r, wp), lambda g, n=grid: (0, n - 1 - g, 0)),
    ]
    specs_rev["out_specs"] = pl.BlockSpec(
        (b, r, wp), lambda g, n=grid: (0, n - 1 - g, 0))

    desc = pl.pallas_call(
        functools.partial(_half_pass_kernel, rows=r, wp=wp, asc=False),
        **specs)
    asc = pl.pallas_call(
        functools.partial(_half_pass_kernel, rows=r, wp=wp, asc=True),
        **specs_rev)

    for _ in range(max(1, passes // 2)):
        lab = desc(lab, packed)
        lab = asc(lab, packed)

    return lab[:, :h, :w].reshape(b, h * w)
