"""On-device line-segment detection (XLA, static shapes).

The reference's only host-side hot stage is LSD (C/Cython there, C++ in
``lsd/`` here). Region growing is inherently sequential, so this module
implements a different, TPU-friendly detector for the fully fused path:

1. 2x2 gradient + level-line angles (exactly LSD's operators).
2. Threshold at rho = quant / sin(tol) like LSD.
3. Orientation-binned Hough accumulation: each active pixel votes into a
   (theta_bin, rho_bin) cell with its gradient magnitude; per cell the
   weighted centroid, refined orientation (doubled-angle mean), and the
   min/max projection along the line direction are accumulated with
   scatter ops.
4. Cells with enough mass and fill ratio become segments: endpoints =
   centroid +- the projection extremes along the refined direction.

vs LSD: no connected-component analysis, so collinear segments separated by
a large gap can merge (the fill-ratio gate suppresses the worst cases), and
no NFA validation (the mass threshold plays that role). The payoff: the
detector is pure XLA with static output shape (max_segments, 4) + mask, so
image -> segments -> sphere -> CNN -> EM -> horizon compiles into ONE
device program with no host round-trip (``pipeline.device_pipeline_full``).

Outputs use the same normalized frame as ``data/io.normalize_segments``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

QUANT = 2.0
TOL_DEG = 22.5
RHO_BIN_PX = 2.0


def _refine_pass(seg_px: jnp.ndarray, mask: jnp.ndarray, xs, ys, mag, th,
                 active, r_tol: float = 2.0, chunk: int = 16384):
    """One parallel refit of every segment against nearby compatible pixels.

    For each segment, pixels within r_tol of its support line, inside its
    [t1, t2] extent (padded by r_tol), with compatible undirected gradient
    orientation, are gathered into weighted first/second moments via one
    (S, P) x (P, C) matmul per pixel chunk (MXU work, no scatters); the
    segment is refit by weighted PCA with the w^2-span rule.
    """
    s_count = seg_px.shape[0]
    p1 = seg_px[:, 0:2]
    p2 = seg_px[:, 2:4]
    d = p2 - p1
    seg_len = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(seg_len, 1e-6)[:, None]  # (S, 2)
    nx, ny = -dn[:, 1], dn[:, 0]
    c = 0.5 * (p1 + p2)
    rho0 = c[:, 0] * nx + c[:, 1] * ny
    t1 = p1[:, 0] * dn[:, 0] + p1[:, 1] * dn[:, 1]
    t2 = p2[:, 0] * dn[:, 0] + p2[:, 1] * dn[:, 1]
    cos2s = dn[:, 0] * dn[:, 0] - dn[:, 1] * dn[:, 1]  # cos(2 theta_seg)
    sin2s = 2 * dn[:, 0] * dn[:, 1]

    npix = xs.shape[0]
    pad = (-npix) % chunk
    def padv(v):
        return jnp.concatenate([v, jnp.zeros((pad,), v.dtype)]) if pad else v
    xs, ys, mag, th = padv(xs), padv(ys), padv(mag), padv(th)
    active = jnp.concatenate([active, jnp.zeros((pad,), bool)]) if pad else active
    n_chunks = xs.shape[0] // chunk

    cos2p_all = jnp.cos(2 * th)
    sin2p_all = jnp.sin(2 * th)

    def body(carry, idx):
        moments = carry
        sl = lambda v: jax.lax.dynamic_slice_in_dim(v, idx * chunk, chunk)
        x, y, w0, act = sl(xs), sl(ys), sl(mag), sl(active)
        c2, s2 = sl(cos2p_all), sl(sin2p_all)
        # (S, P) gates
        rho_p = nx[:, None] * x[None, :] + ny[:, None] * y[None, :]
        t_p = dn[:, 0][:, None] * x[None, :] + dn[:, 1][:, None] * y[None, :]
        near = jnp.abs(rho_p - rho0[:, None]) <= r_tol
        inside = (t_p >= (t1 - r_tol)[:, None]) & (t_p <= (t2 + r_tol)[:, None])
        ang_ok = (cos2s[:, None] * c2[None, :]
                  + sin2s[:, None] * s2[None, :]) > 0.0
        wmat = jnp.where(near & inside & ang_ok & act[None, :],
                         w0[None, :], 0.0)  # (S, P)
        base = wmat @ jnp.stack(
            [jnp.ones_like(x), x, y, x * x, x * y, y * y], axis=-1)  # (S, 6)
        # w^2 span stats (plain-w was measured slightly worse downstream:
        # fused AUC 0.456 vs 0.483 — the length-shrinkage fix needs the
        # round-2 connected-components rework, see TODO.md)
        w2mat = wmat * wmat
        t_stats = jnp.stack([
            jnp.sum(w2mat, axis=1),
            jnp.sum(w2mat * t_p, axis=1),
            jnp.sum(w2mat * t_p * t_p, axis=1),
        ], axis=-1)  # (S, 3)
        return moments + jnp.concatenate([base, t_stats], axis=-1), None

    m0 = jnp.zeros((s_count, 9), jnp.float32)
    moments, _ = jax.lax.scan(body, m0, jnp.arange(n_chunks))
    s_w, s_wx, s_wy, s_wxx, s_wxy, s_wyy, s_w2, s_wt, s_wtt = [
        moments[:, i] for i in range(9)]

    sw = jnp.maximum(s_w, 1e-9)
    cx, cy = s_wx / sw, s_wy / sw
    vxx = s_wxx / sw - cx * cx
    vxy = s_wxy / sw - cx * cy
    vyy = s_wyy / sw - cy * cy
    tr = vxx + vyy
    det = vxx * vyy - vxy * vxy
    lam = 0.5 * tr + jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    ex = jnp.where(jnp.abs(vxy) > 1e-12, vxy, lam - vyy)
    ey = jnp.where(jnp.abs(vxy) > 1e-12, lam - vxx, jnp.zeros_like(lam))
    en = jnp.sqrt(ex * ex + ey * ey)
    ok = (en > 1e-9) & (s_w > 0) & mask
    ddx = jnp.where(ok, ex / jnp.where(ok, en, 1.0), dn[:, 0])
    ddy = jnp.where(ok, ey / jnp.where(ok, en, 1.0), dn[:, 1])

    sw2 = jnp.maximum(s_w2, 1e-9)
    t_mean = s_wt / sw2
    t_var = jnp.maximum(s_wtt / sw2 - t_mean * t_mean, 0.0)
    span = jnp.sqrt(12.0 * t_var)
    # NB: t here was measured along the OLD direction; for the small angle
    # corrections of a refinement pass the difference is second order
    t_c = cx * ddx + cy * ddy
    mx = cx + (t_mean - t_c) * ddx
    my = cy + (t_mean - t_c) * ddy
    new_seg = jnp.stack([mx - 0.5 * span * ddx, my - 0.5 * span * ddy,
                         mx + 0.5 * span * ddx, my + 0.5 * span * ddy],
                        axis=-1)
    keep_new = ok & (span > 1.0)
    return jnp.where(keep_new[:, None], new_seg, seg_px), mask


@functools.partial(jax.jit,
                   static_argnames=("max_segments", "theta_bins",
                                    "min_count", "min_len_px",
                                    "refine_iters"))
def detect_segments_device(image: jnp.ndarray, max_segments: int = 512,
                           theta_bins: int = 24, min_count: int = 10,
                           min_len_px: float = 10.0,
                           refine_iters: int = 2):
    """(H, W) grayscale in [0, 255] -> (segments (S, 4) normalized, mask).

    Segments are sorted by decreasing accumulated gradient mass.
    """
    h, w = image.shape
    img = image.astype(jnp.float32)

    # ---- 2x2 gradient (LSD's operators) on the (H-1, W-1) inner grid
    com1 = img[1:, 1:] - img[:-1, :-1]
    com2 = img[:-1, 1:] - img[1:, :-1]
    gx = 0.5 * (com1 + com2)
    gy = 0.5 * (com1 - com2)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # level-line (edge) direction, undirected in [0, pi)
    theta = jnp.arctan2(gx, -gy)
    theta = jnp.where(theta < 0, theta + jnp.pi, theta)
    theta = jnp.where(theta >= jnp.pi, theta - jnp.pi, theta)

    # adaptive magnitude threshold: LSD's quantization bound, raised to the
    # top-quantile level so sensor noise cannot flood the accumulator (LSD
    # relies on region growing + NFA to reject noise; this detector has no
    # connectivity, so it gates harder at the source)
    rho_thresh = QUANT / jnp.sin(jnp.deg2rad(TOL_DEG))
    q = jnp.quantile(mag.reshape(-1), 0.92)
    active = mag > jnp.maximum(rho_thresh, q)
    wgt = jnp.where(active, mag, 0.0).reshape(-1)

    ys, xs = jnp.meshgrid(jnp.arange(h - 1, dtype=jnp.float32),
                          jnp.arange(w - 1, dtype=jnp.float32), indexing="ij")
    # pixel centre of the 2x2 support
    xs = (xs + 0.5).reshape(-1)
    ys = (ys + 0.5).reshape(-1)
    th = theta.reshape(-1)

    tbin = jnp.clip((th / jnp.pi * theta_bins).astype(jnp.int32),
                    0, theta_bins - 1)
    # bin-centre direction for consistent rho
    bin_theta = (tbin.astype(jnp.float32) + 0.5) * (jnp.pi / theta_bins)
    dx, dy = jnp.cos(bin_theta), jnp.sin(bin_theta)
    nx, ny = -dy, dx
    diag = (h * h + w * w) ** 0.5
    rho = xs * nx + ys * ny  # in [-diag, diag]
    rbin = jnp.clip(((rho + diag) / RHO_BIN_PX).astype(jnp.int32), 0,
                    int(2 * diag / RHO_BIN_PX))
    n_rho = int(2 * diag / RHO_BIN_PX) + 1
    cell = tbin * n_rho + rbin
    n_cells = theta_bins * n_rho

    t = xs * dx + ys * dy  # projection along the line direction

    # one multi-channel scatter-add (separate scatters are much slower).
    # The along-line span statistics are weighted by w^2: strong edge pixels
    # (mag ~60+) dominate residual noise votes (mag ~5) quadratically, which
    # keeps the variance-based span robust without a second trimming pass.
    w2 = wgt * wgt
    payload = jnp.stack([
        wgt, wgt * xs, wgt * ys, wgt * xs * xs, wgt * xs * ys,
        wgt * ys * ys, active.reshape(-1).astype(jnp.float32),
        w2, w2 * t, w2 * t * t,
    ], axis=-1)  # (Npix, 10)
    acc = jnp.zeros((n_cells, 10), jnp.float32).at[cell].add(payload)
    (s_w, s_wx, s_wy, s_wxx, s_wxy, s_wyy, s_cnt, s_w2, s_wt,
     s_wtt) = [acc[:, i] for i in range(10)]

    sw = jnp.maximum(s_w, 1e-9)
    cx = s_wx / sw
    cy = s_wy / sw
    # weighted PCA: the principal axis of the cell's pixel mass is the
    # segment direction (more accurate than the bin centre)
    vxx = s_wxx / sw - cx * cx
    vxy = s_wxy / sw - cx * cy
    vyy = s_wyy / sw - cy * cy
    # leading eigenvector of [[vxx, vxy], [vxy, vyy]]
    tr = vxx + vyy
    det = vxx * vyy - vxy * vxy
    lam = 0.5 * tr + jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    ex = jnp.where(jnp.abs(vxy) > 1e-12, vxy, lam - vyy)
    ey = jnp.where(jnp.abs(vxy) > 1e-12, lam - vxx, jnp.zeros_like(lam))
    # degenerate (isotropic) cells fall back to the bin direction
    en = jnp.sqrt(ex * ex + ey * ey)
    bdx = jnp.cos((jnp.arange(n_cells) // n_rho + 0.5) * (jnp.pi / theta_bins))
    bdy = jnp.sin((jnp.arange(n_cells) // n_rho + 0.5) * (jnp.pi / theta_bins))
    ok_e = en > 1e-9
    ddx = jnp.where(ok_e, ex / jnp.where(ok_e, en, 1.0), bdx)
    ddy = jnp.where(ok_e, ey / jnp.where(ok_e, en, 1.0), bdy)

    # segment extent from the weighted variance of the along-line projection
    # (a uniform segment of length L has sigma = L / sqrt(12)); robust to
    # stray same-band pixels, unlike a min/max span
    sw2 = jnp.maximum(s_w2, 1e-9)
    t_mean = s_wt / sw2
    t_var = jnp.maximum(s_wtt / sw2 - t_mean * t_mean, 0.0)
    span = jnp.sqrt(12.0 * t_var)
    fill = s_cnt / jnp.maximum(span, 1.0)
    valid = (s_cnt >= min_count) & (span >= min_len_px) & (fill >= 0.5)

    # centre the segment at the along-line mean, not the raw centroid
    t_c = cx * ddx + cy * ddy
    mx = cx + (t_mean - t_c) * ddx
    my = cy + (t_mean - t_c) * ddy
    p1x = mx - 0.5 * span * ddx
    p1y = my - 0.5 * span * ddy
    p2x = mx + 0.5 * span * ddx
    p2y = my + 0.5 * span * ddy

    score = jnp.where(valid, s_w, -1.0)
    top, idx = jax.lax.top_k(score, max_segments)
    mask = top > 0
    seg_px = jnp.stack([p1x[idx], p1y[idx], p2x[idx], p2y[idx]], axis=-1)
    seg_px = jnp.where(mask[:, None], seg_px, 0.0)

    # refinement: refit each segment against the raw pixels near its
    # support line (repairs the coarse Hough-cell geometry)
    for _ in range(refine_iters):
        seg_px, mask = _refine_pass(seg_px, mask, xs, ys, wgt, th,
                                    active.reshape(-1))

    # normalized frame: centre origin, +y up, long axis to [-1, 1]
    s = max(h, w) / 2.0
    seg = jnp.stack([
        (seg_px[:, 0] - w / 2.0) / s,
        -(seg_px[:, 1] - h / 2.0) / s,
        (seg_px[:, 2] - w / 2.0) / s,
        -(seg_px[:, 3] - h / 2.0) / s,
    ], axis=-1)
    return seg, mask
