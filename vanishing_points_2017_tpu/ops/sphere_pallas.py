"""Pallas TPU kernel for the inverse-gnomonic sphere renderer.

The XLA version (``ops/sphere.py``) scans line chunks and materialises a
(chunk, S, S) coverage tensor per step in HBM-visible buffers; this kernel
keeps everything in VMEM: the grid tiles the output image over rows, each
program instance holds its (TILE_R, S) strip of log-transmittance in a VMEM
accumulator and loops over all lines in registers, so the image is written
to HBM exactly once.

Math is identical to ``sphere.sphere_render``: per column alpha, the curve
row centre rc = S/2 - 1/2 - beta(alpha) * S/pi, slope via central
differences, anti-aliased perpendicular coverage, white-over-black alpha
compositing 1 - prod(1 - a * cov) accumulated in log space.

The kernel runs on TPU via Mosaic; ``interpret=True`` runs it anywhere
(used by the CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sphere import DEFAULT_LINEWIDTH_PX

LINE_CHUNK = 8


def _render_kernel(l_ref, mask_ref, out_ref, *, size: int, tile_r: int,
                   alpha: float, half_w: float):
    i = pl.program_id(0)
    row0 = i * tile_r

    cols = jax.lax.broadcasted_iota(jnp.float32, (1, size), 1)
    alphas = (cols - 0.5 * size + 0.5) * (jnp.pi / size)
    sa = jnp.sin(alphas)  # (1, S)
    ca = jnp.cos(alphas)
    rows = row0 + jax.lax.broadcasted_iota(jnp.float32, (tile_r, 1), 0)

    n_chunks = l_ref.shape[0] // LINE_CHUNK

    def body(c, log_t):
        lc = l_ref[pl.ds(c * LINE_CHUNK, LINE_CHUNK), :]  # (C, 3)
        mc = mask_ref[pl.ds(c * LINE_CHUNK, LINE_CHUNK), :]  # (C, 1)
        l0 = lc[:, 0:1]
        l1 = lc[:, 1:2]
        l2 = lc[:, 2:3]
        beta = jnp.arctan((-l0 * sa - l2 * ca) / l1)  # (C, S)
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

        def one_line(k, acc):
            dist = jnp.abs(rows - rc[k, :][None, :]) * inv_scale[k, :][None, :]
            cov = jnp.clip(0.5 + half_w - dist, 0.0, 1.0)
            cov = jnp.where(mc[k, 0] > 0, cov, 0.0)
            return acc + jnp.log1p(-alpha * cov)

        return jax.lax.fori_loop(0, LINE_CHUNK, one_line, log_t)

    log_t = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((tile_r, size), jnp.float32))
    out_ref[:, :] = 1.0 - jnp.exp(log_t)


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

    if size % tile_r:
        tile_r = size  # fall back to one tile

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
