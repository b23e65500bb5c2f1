"""Inverse-gnomonic sphere-image renderer.

The signature transform of the GCPR'17 paper: every homogeneous image line
(l0, l1, l2) maps to a curve in hemisphere angle space

    beta(alpha) = arctan((-l0 sin(alpha) - l2 cos(alpha)) / l1)

and all curves are alpha-composited in white (alpha=0.1) onto a black
size x size canvas; bright spots appear where many curves overlap — i.e. at
vanishing points. The reference rasterizes with matplotlib's Agg backend
(``sphere_mapping.py:36-72`` of fkluger/vanishing_points_2017: 10000-sample
polylines on a 100-dpi figure, framebuffer grabbed and channel-averaged).

This module replaces the C++ rasterizer with an analytic, jittable kernel:
for each pixel column the curve's row centre and slope are evaluated, pixel
coverage is an anti-aliased perpendicular-distance hat function, and the
composite is 1 - (1-alpha)^(sum_i cov_i) — identical to the
order-independent product 1 - prod_i (1 - alpha*cov_i) wherever coverage
is 0/1 and within 0.13% on anti-aliased edge pixels; coverage accumulates
over line chunks with ``lax.scan`` so memory stays at O(chunk * size^2).

Orientation matches the Agg framebuffer: row 0 is the TOP of the figure
(beta = +pi/2), column 0 is alpha = -pi/2. Downstream consumers
(``find_initial_vps``) flip vertically exactly like the reference
(``vp_localisation.py:113-114``).

Fidelity notes (parity target is downstream AUC, not pixels — SURVEY §2.2):
* Agg quantizes to uint8 after every polyline blend; we composite in float
  and quantize once.
* Where ``beta(alpha)`` jumps between +-pi/2 (the arctan wrap when l1 crosses
  the curve's pole), Agg draws the connecting near-vertical polyline segment;
  the slope-scaled coverage model reproduces that full-column streak.
* Default stroke width = 1 pt at 100 dpi = 100/72 px, matplotlib 1.5's
  default line width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_LINEWIDTH_PX = 100.0 / 72.0


def curve_beta(l: jnp.ndarray, alpha: jnp.ndarray,
               alternative: bool = False) -> jnp.ndarray:
    """beta(alpha) for homogeneous lines.

    l: (..., 3), alpha: (A,) -> (..., A). ``alternative`` selects the second
    parameterisation of ``sphere_mapping.py:59`` (unused in the pipeline but
    part of the API surface).
    """
    l0 = l[..., 0:1]
    l1 = l[..., 1:2]
    l2 = l[..., 2:3]
    sa = jnp.sin(alpha)[None, :]
    ca = jnp.cos(alpha)[None, :]
    if alternative:
        return jnp.arctan(-l2 / (ca * l0 + sa * l1))
    return jnp.arctan((-l0 * sa - l2 * ca) / l1)


@functools.partial(jax.jit, static_argnames=("size", "chunk", "alternative"))
def sphere_render(l: jnp.ndarray, lmask: jnp.ndarray, size: int = 500,
                  alpha: float = 0.1,
                  linewidth: float = DEFAULT_LINEWIDTH_PX,
                  alternative: bool = False,
                  chunk: int = 8) -> jnp.ndarray:
    """Render homogeneous lines to a float32 sphere image in [0, 1].

    l: (L, 3) homogeneous lines (any scale), lmask: (L,) validity.
    Returns (size, size) float32, Agg orientation (row 0 = beta +pi/2).
    """
    num = l.shape[0]
    pad = (-num) % chunk
    if pad:
        l = jnp.concatenate([l, jnp.zeros((pad, 3), l.dtype)], axis=0)
        lmask = jnp.concatenate([lmask, jnp.zeros((pad,), bool)], axis=0)
    num_chunks = l.shape[0] // chunk

    # pixel-centre alphas per column
    col = jnp.arange(size, dtype=jnp.float32)
    alphas = (col - 0.5 * size + 0.5) * (jnp.pi / size)
    rows = col[:, None]  # (S, 1) row index

    l = l.astype(jnp.float32).reshape(num_chunks, chunk, 3)
    lmask = lmask.reshape(num_chunks, chunk)

    half_w = 0.5 * linewidth

    def body(acc, operand):
        lc, mc = operand  # (chunk, 3), (chunk,)
        beta = curve_beta(lc, alphas, alternative=alternative)  # (chunk, S)
        # row centre: row 0 top = beta +pi/2
        rc = 0.5 * size - 0.5 - beta * (size / jnp.pi)
        rc = jnp.where(jnp.isnan(rc), -1e6, rc)
        # slope via central differences over columns (handles both branches
        # and reproduces the Agg wrap streak where beta jumps)
        m = 0.5 * (rc[:, 2:] - rc[:, :-2])
        m = jnp.concatenate([(rc[:, 1:2] - rc[:, 0:1]), m,
                             (rc[:, -1:] - rc[:, -2:-1])], axis=1)
        inv_scale = jax.lax.rsqrt(1.0 + m * m)  # (chunk, S)
        # perpendicular distance of every pixel to the curve, per column
        dist = jnp.abs(rows[None, :, :] - rc[:, None, :]) * inv_scale[:, None, :]
        cov = jnp.clip(0.5 + half_w - dist, 0.0, 1.0)  # (chunk, S, S)
        cov = jnp.where(mc[:, None, None], cov, 0.0)
        return acc + jnp.sum(cov, axis=0), None

    # Accumulate total coverage and composite once: 1 - (1-a)^acc.  For
    # integer coverage this is EXACTLY the per-line product
    # 1 - prod(1 - a*cov_i); for fractional (anti-aliased edge) coverage
    # the difference is <= a/8 relative on that line's own term (0.13% at
    # a=0.1) — far below the Agg-vs-analytic tolerance — and it removes
    # the per-(line, pixel) log1p transcendental from the hot loop.
    acc0 = jnp.zeros((size, size), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (l, lmask))
    return 1.0 - jnp.exp(acc * jnp.log1p(-jnp.float32(alpha)))


def sphere_image_uint8(l: jnp.ndarray, lmask: jnp.ndarray, size: int = 500,
                       alpha: float = 0.1,
                       linewidth: float = DEFAULT_LINEWIDTH_PX) -> jnp.ndarray:
    """uint8 grayscale sphere image, the CNN-input contract of the reference
    (``evaluation.py:12-14,175``: size=500, alpha=0.1)."""
    img = sphere_render(l, lmask, size=size, alpha=alpha, linewidth=linewidth)
    return jnp.floor(img * 255.0).astype(jnp.uint8)


def save_sphere_image(l, lmask, filename: str, size: int = 500,
                      alpha: float = 0.5) -> None:
    """Render + save to an image file (the reference's
    ``sphere_line_plot_image``/``plot_sphere_lines_to_tile``,
    ``sphere_mapping.py:75-83``)."""
    import numpy as np
    from PIL import Image

    img = np.asarray(sphere_image_uint8(l, lmask, size=size, alpha=alpha))
    Image.fromarray(img, "L").save(filename)


def segments_image(lp: jnp.ndarray, lmask: jnp.ndarray,
                   size: int = 250) -> jnp.ndarray:
    """Rasterize raw segments in the normalized frame to a grayscale image
    (the reference's unused ``makeImage``, ``sphere_mapping.py:86-104``) —
    white 1-px segments on black, analytic coverage like the main renderer.
    """
    lp = lp.astype(jnp.float32)
    px = jnp.arange(size, dtype=jnp.float32)
    # data range [-1, 1] across the canvas; y up -> row 0 top
    xs = (px - 0.5 * size + 0.5) * (2.0 / size)
    ys = -(px - 0.5 * size + 0.5) * (2.0 / size)
    gx, gy = jnp.meshgrid(xs, ys)
    pts = jnp.stack([gx, gy], axis=-1)  # (S, S, 2)

    a = lp[:, 0:2]
    b = lp[:, 2:4]
    ab = b - a
    denom = jnp.sum(ab * ab, axis=-1)
    denom = jnp.where(denom == 0, 1.0, denom)

    def one(seg_a, seg_ab, seg_denom, valid):
        t = jnp.clip(jnp.sum((pts - seg_a) * seg_ab, axis=-1) / seg_denom,
                     0.0, 1.0)
        closest = seg_a + t[..., None] * seg_ab
        dist = jnp.linalg.norm(pts - closest, axis=-1) * (size / 2.0)
        cov = jnp.clip(1.0 - dist, 0.0, 1.0)
        return jnp.where(valid, cov, 0.0)

    cov = jax.vmap(one)(a, ab, denom, lmask)  # (L, S, S)
    img = jnp.max(cov, axis=0)
    return jnp.floor(img * 255.0).astype(jnp.uint8)
