"""Pallas TPU kernel for the inverse-gnomonic sphere renderer.

The XLA version (``ops/sphere.py``) scans line chunks and materialises a
(chunk, S, S) coverage tensor per step in HBM-visible buffers; this kernel
keeps everything in VMEM: the grid tiles the output image over rows, each
program instance holds its (TILE_R, S) strip of accumulated coverage in a
VMEM accumulator and loops over all lines in registers, so the image is
written to HBM exactly once.

Math is identical to ``sphere.sphere_render``: per column alpha, the curve
row centre rc = S/2 - 1/2 - beta(alpha) * S/pi, slope via central
differences, anti-aliased perpendicular coverage, composite
1 - (1-a)^(sum cov).

The kernel runs on TPU via Mosaic; ``interpret=True`` runs it anywhere
(used by the CPU test suite).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sphere import DEFAULT_LINEWIDTH_PX

LINE_CHUNK = 8


def _atan(u: jnp.ndarray) -> jnp.ndarray:
    """arctan via range-reduced polynomial (Mosaic has no atan primitive).

    Abramowitz & Stegun 4.4.49 on t = min(|u|, 1/|u|) (|err| <= 1e-5 rad,
    i.e. < 0.002 px at size 500), completed by atan(u) = pi/2 - atan(1/u)
    for |u| > 1 and odd symmetry. atan(+-inf) -> +-pi/2 falls out of the
    reduction (1/inf = 0).
    """
    au = jnp.abs(u)
    inv = au > 1.0
    t = jnp.where(inv, 1.0 / jnp.where(au == 0, 1.0, au), au)
    t2 = t * t
    p = (0.9998660 + t2 * (-0.3302995 + t2 * (0.1801410 + t2 * (
        -0.0851330 + t2 * 0.0208351))))
    a = t * p
    a = jnp.where(inv, jnp.pi / 2 - a, a)
    return jnp.sign(u) * a


def _render_kernel(l_ref, mask_ref, out_ref, *, size: int, tile_r: int,
                   alpha: float, half_w: float):
    i = pl.program_id(0)
    row0 = i * tile_r

    # iota must be integer-typed on Mosaic; cast to float after
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1).astype(jnp.float32)
    alphas = (cols - 0.5 * size + 0.5) * (jnp.pi / size)
    sa = jnp.sin(alphas)  # (1, S)
    ca = jnp.cos(alphas)
    rows = row0 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_r, 1), 0).astype(jnp.float32)

    n_chunks = l_ref.shape[0] // LINE_CHUNK

    def body(c, cov_acc):
        lc = l_ref[pl.ds(c * LINE_CHUNK, LINE_CHUNK), :]  # (C, 3)
        mc = mask_ref[pl.ds(c * LINE_CHUNK, LINE_CHUNK), :]  # (C, 1)
        l0 = lc[:, 0:1]
        l1 = lc[:, 1:2]
        l2 = lc[:, 2:3]
        beta = _atan((-l0 * sa - l2 * ca) / l1)  # (C, S)
        rc = 0.5 * size - 0.5 - beta * (size / jnp.pi)
        rc = jnp.where(jnp.isnan(rc), -1e6, rc)
        # central-difference slope over columns
        rcp = pltpu.roll(rc, size - 1, axis=1)  # rc[j+1] (roll -1)
        rcm = pltpu.roll(rc, 1, axis=1)         # rc[j-1]
        m = 0.5 * (rcp - rcm)
        # fix the rolled edges to one-sided differences
        first = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1) == 0
        last = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1) == size - 1
        m = jnp.where(first, rcp - rc, jnp.where(last, rc - rcm, m))
        inv_scale = jax.lax.rsqrt(1.0 + m * m)  # (C, S)

        # static unroll over the chunk: Mosaic cannot dynamic_slice a value
        # by a traced index, and static indexing keeps each (R, S) coverage
        # temporary live only briefly in VMEM
        acc = cov_acc
        for k in range(LINE_CHUNK):
            dist = jnp.abs(rows - rc[k, :][None, :]) * inv_scale[k, :][None, :]
            cov = jnp.clip(0.5 + half_w - dist, 0.0, 1.0)
            acc = acc + jnp.where(mc[k, 0] > 0, cov, 0.0)
        return acc

    # coverage sum + single (1-a)^acc composite — same formulation (and
    # numerics) as ops/sphere.sphere_render
    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((tile_r, size), jnp.float32))
    out_ref[:, :] = 1.0 - jnp.exp(acc * math.log1p(-alpha))


@functools.partial(jax.jit,
                   static_argnames=("size", "tile_r", "interpret"))
def sphere_render_pallas(l: jnp.ndarray, lmask: jnp.ndarray, size: int = 500,
                         alpha: float = 0.1,
                         linewidth: float = DEFAULT_LINEWIDTH_PX,
                         tile_r: int = 100,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ``sphere.sphere_render`` (float32 in [0,1])."""
    num = l.shape[0]
    pad = (-num) % LINE_CHUNK
    if pad:
        l = jnp.concatenate([l, jnp.zeros((pad, 3), l.dtype)], axis=0)
        lmask = jnp.concatenate([lmask, jnp.zeros((pad,), bool)], axis=0)
    l = l.astype(jnp.float32)
    maskf = lmask.astype(jnp.float32)[:, None]

    # Mosaic requires the sublane (second-to-last) block dim to be a
    # multiple of 8 or the full array dim; 500 has no such divisor, so fall
    # back to one full-image tile (1 MB VMEM accumulator) when needed.
    if size % tile_r or tile_r % 8:
        tile_r = size

    kernel = functools.partial(_render_kernel, size=size, tile_r=tile_r,
                               alpha=alpha, half_w=0.5 * linewidth)
    return pl.pallas_call(
        kernel,
        grid=(size // tile_r,),
        in_specs=[
            pl.BlockSpec((l.shape[0], 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, size), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((size, size), jnp.float32),
        interpret=interpret,
    )(l, maskf)
