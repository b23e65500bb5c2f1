"""Pallas TPU kernel for the EM hot loop (the plain E+M iterations).

The XLA EM (``em/em.py``) vmaps a ``lax.while_loop`` over the image batch,
which makes convergence LOCKSTEP: every image pays the batch maximum
iteration count (measured medians are ~5 iterations but stragglers hit the
100 cap, so typical batches waste >10x), and each iteration dispatches
~150 small (M, N) ops.

This kernel runs one image's full phase of ``split_merge_freq - 1`` plain
iterations (the body between split/merge events — see ``em.body`` with
``with_split_merge=False``) as ONE fused program instance with every
operand resident in VMEM (lsim 512x512 = 1 MB dominates) and an in-kernel
``while_loop`` that exits at convergence — per-image early exit instead of
batch lockstep. Split/merge, initialisation and finalisation stay in XLA
(they run once per phase / per EM, off the hot path).

Semantics mirror ``em.body`` exactly — same op order, same masks, same
freeze-once-done behaviour — so phases can alternate between this kernel
and the XLA body. Supported config: ``distance_measure="angle"`` (the
production default); other measures fall back to XLA.

Mosaic has no atan/asin/acos primitives; they are built from the same
range-reduced atan polynomial as ``ops/sphere_pallas`` (|err| <= 1e-5 rad).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.probability import LOG2PI, LOG_PL_FLOOR, LOG_S_FLOOR

LOG_S_THRESH = math.log(1e-200)


def _atan(u):
    """Range-reduced A&S 4.4.49 arctan (|err| <= 1e-5 rad)."""
    au = jnp.abs(u)
    inv = au > 1.0
    t = jnp.where(inv, 1.0 / jnp.where(au == 0, 1.0, au), au)
    t2 = t * t
    p = (0.9998660 + t2 * (-0.3302995 + t2 * (0.1801410 + t2 * (
        -0.0851330 + t2 * 0.0208351))))
    a = t * p
    a = jnp.where(inv, jnp.pi / 2 - a, a)
    return jnp.sign(u) * a


def _asin(x):
    x = jnp.clip(x, -1.0, 1.0)
    d = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    return jnp.where(d > 0, _atan(x / jnp.where(d > 0, d, 1.0)),
                     jnp.sign(x) * (jnp.pi / 2))


def _acos(x):
    return jnp.pi / 2 - _asin(x)


def _safe_log(x):
    """log with the XLA path's conventions: 0 -> -inf, nan propagates."""
    pos = x > 0
    out = jnp.where(pos, jnp.log(jnp.where(pos, x, 1.0)), -jnp.inf)
    return jnp.where(jnp.isnan(x), jnp.nan, out)


def _smallest_eigvec_3x3_cols(axx, axy, axz, ayy, ayz, azz):
    """Columnwise port of ``em.weights.smallest_eigvec_3x3`` for (M, 1)
    component arrays (symmetric 3x3 per row). Returns (vx, vy, vz)."""
    q = (axx + ayy + azz) / 3.0
    bxx, byy, bzz = axx - q, ayy - q, azz - q
    p2 = (bxx * bxx + byy * byy + bzz * bzz
          + 2.0 * (axy * axy + axz * axz + ayz * ayz)) / 6.0
    p = jnp.sqrt(p2)
    ps = jnp.where(p > 0, p, 1.0)
    nxx, nxy, nxz = bxx / ps, axy / ps, axz / ps
    nyy, nyz, nzz = byy / ps, ayz / ps, bzz / ps
    det = (nxx * (nyy * nzz - nyz * nyz)
           - nxy * (nxy * nzz - nyz * nxz)
           + nxz * (nxy * nyz - nyy * nxz))
    r = jnp.clip(det / 2.0, -1.0, 1.0)
    phi = _acos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    mxx, myy, mzz = axx - lam_min, ayy - lam_min, azz - lam_min
    # rows of m: r0 = (mxx, axy, axz), r1 = (axy, myy, ayz), r2 = (axz, ayz, mzz)
    def cross(a0, a1, a2, b0, b1, b2):
        return (a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0)

    c01 = cross(mxx, axy, axz, axy, myy, ayz)
    c02 = cross(mxx, axy, axz, axz, ayz, mzz)
    c12 = cross(axy, myy, ayz, axz, ayz, mzz)

    def n2(c):
        return c[0] * c[0] + c[1] * c[1] + c[2] * c[2]

    n01, n02, n12 = n2(c01), n2(c02), n2(c12)
    # argmax over the three candidates via selects
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = (~use01) & (n02 >= n12)
    vx = jnp.where(use01, c01[0], jnp.where(use02, c02[0], c12[0]))
    vy = jnp.where(use01, c01[1], jnp.where(use02, c02[1], c12[1]))
    vz = jnp.where(use01, c01[2], jnp.where(use02, c02[2], c12[2]))
    nbest = jnp.where(use01, n01, jnp.where(use02, n02, n12))

    rn0 = mxx * mxx + axy * axy + axz * axz
    rn1 = axy * axy + myy * myy + ayz * ayz
    rn2 = axz * axz + ayz * ayz + mzz * mzz
    rn_max = jnp.maximum(rn0, jnp.maximum(rn1, rn2))
    good = nbest > 1e-6 * rn_max * rn_max

    # fallback: vector orthogonal to the largest row of m
    b0is = (rn0 >= rn1) & (rn0 >= rn2)
    b1is = (~b0is) & (rn1 >= rn2)
    brx = jnp.where(b0is, mxx, jnp.where(b1is, axy, axz))
    bry = jnp.where(b0is, axy, jnp.where(b1is, myy, ayz))
    brz = jnp.where(b0is, axz, jnp.where(b1is, ayz, mzz))
    # cross with the axis least aligned with brow
    abx, aby, abz = jnp.abs(brx), jnp.abs(bry), jnp.abs(brz)
    e0is = (abx <= aby) & (abx <= abz)
    e1is = (~e0is) & (aby <= abz)
    ex = jnp.where(e0is, 1.0, 0.0)
    ey = jnp.where(e1is, 1.0, 0.0)
    ez = 1.0 - ex - ey
    alt = cross(brx, bry, brz, ex, ey, ez)
    iso = rn_max <= 0
    altx = jnp.where(iso, 1.0, alt[0])
    alty = jnp.where(iso, 0.0, alt[1])
    altz = jnp.where(iso, 0.0, alt[2])

    vx = jnp.where(good, vx, altx)
    vy = jnp.where(good, vy, alty)
    vz = jnp.where(good, vz, altz)
    nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    return vx / nrm, vy / nrm, vz / nrm


def _em_phase_kernel(l_ref, lpmid_ref, lpdir_ref, llt_ref, lsim_ref,
                     lweight_ref, means_ref, gw_ref, scal_ref,
                     v_in_ref, vn_in_ref, logs_in_ref, flags_in_ref,
                     v_out_ref, vn_out_ref, logs_out_ref, flags_out_ref,
                     *, m_slots: int, n_lines: int, n_comp: int,
                     plain_steps: int, wbias: float, final_conv: float,
                     num_iter: int, wrap_quirk: bool):
    """One image's plain-iteration phase. Shapes:
    l (N, 3) unit lines (0 rows on padding), lpmid (N, 2) segment midpoints,
    lpdir (N, 2) p1 - p2, llt (N, 9) row-flattened l l^T, lsim (N, N),
    lweight (N, 1), means (K, 2), gw (K, 1) GMM weights, scal (1, 8)
    [sigma, log_max_stdd, i, done, empty, pad...], v/vn (M, 3), logs (M, 1).
    flags (1, 8): [i, done, empty] as f32 (out).
    """
    f32 = jnp.float32
    lsim = lsim_ref[...]                      # (N, N)
    lw_row = lweight_ref[...].reshape(1, n_lines)   # (1, N)
    l_nx3 = l_ref[...]                        # (N, 3)
    llt = llt_ref[...]                        # (N, 9)
    midx = lpmid_ref[..., 0].reshape(1, n_lines)
    midy = lpmid_ref[..., 1].reshape(1, n_lines)
    dirx = lpdir_ref[..., 0].reshape(1, n_lines)
    diry = lpdir_ref[..., 1].reshape(1, n_lines)
    n2dir = jnp.sqrt(dirx * dirx + diry * diry)      # (1, N) |p1 - p2|
    lmask_row = (jnp.abs(l_nx3[:, 0]) + jnp.abs(l_nx3[:, 1])
                 + jnp.abs(l_nx3[:, 2])).reshape(1, n_lines) > 0

    mx = means_ref[..., 0].reshape(1, n_comp)
    my = means_ref[..., 1].reshape(1, n_comp)
    gw = gw_ref[...].reshape(1, n_comp)

    sigma = scal_ref[0, 0]
    log_max_stdd = scal_ref[0, 1]

    v0 = v_in_ref[...]            # (M, 3)
    vn0 = vn_in_ref[...]
    i0 = flags_in_ref[0, 2]
    done0 = flags_in_ref[0, 3]
    empty0 = flags_in_ref[0, 4]
    # log_s and the alive mask (as f32) arrive packed as (M, 2) columns
    logs_col0 = logs_in_ref[..., 0:1]
    alive_col0 = logs_in_ref[..., 1:2]

    def one_iter(carry):
        step, vc, vn, logs, alive_c, i, done, empty = carry
        alive_b = alive_c > 0.5                      # (M, 1)
        alive_n = jnp.sum(alive_c)
        empty_now = alive_n == 0
        go = (done < 0.5) & (~empty_now)

        # ---- E-step -------------------------------------------------
        vx = jnp.where(alive_b, vc[:, 0:1], 0.0)     # (M, 1)
        vy = jnp.where(alive_b, vc[:, 1:2], 0.0)
        vz = jnp.where(alive_b, vc[:, 2:3], 1.0)

        beta = _asin(jnp.clip(vy, -1.0, 1.0))
        cosb = jnp.cos(beta)
        alpha = _asin(jnp.clip(vx / cosb, -1.0, 1.0))

        # GMM prior with the 5 wraparound terms (d4 doubled when quirky)
        inv = -0.5 / (sigma * sigma)
        qx, qy = alpha, beta                          # (M, 1)
        d1 = (qx - mx) ** 2 + (qy - my) ** 2          # (M, K)
        d2 = (qx - mx + jnp.pi) ** 2 + (qy + my) ** 2
        d3 = (qx - mx - jnp.pi) ** 2 + (qy + my) ** 2
        d4 = (qx + mx) ** 2 + (qy - my - jnp.pi) ** 2
        if wrap_quirk:
            e = (jnp.exp(d1 * inv) + jnp.exp(d2 * inv) + jnp.exp(d3 * inv)
                 + 2.0 * jnp.exp(d4 * inv))
        else:
            d5 = (qx + mx) ** 2 + (qy - my + jnp.pi) ** 2
            e = (jnp.exp(d1 * inv) + jnp.exp(d2 * inv) + jnp.exp(d3 * inv)
                 + jnp.exp(d4 * inv) + jnp.exp(d5 * inv))
        p_v = jnp.sum(e * gw, axis=1, keepdims=True)  # (M, 1)
        p_v = jnp.where(alive_b, p_v, 0.0)

        # lvsq, "angle" measure, laid out (M, N)
        w2x = vx / vz                                 # (M, 1) dehomogenized
        w2y = vy / vz
        v1x = midx - w2x                              # (M, N)
        v1y = midy - w2y
        dot = v1x * dirx + v1y * diry
        n1 = jnp.sqrt(v1x * v1x + v1y * v1y)
        c = jnp.abs(dot / (n1 * n2dir))
        d = 1.0 - c
        lvsq = d * d                                  # (M, N)

        logs_f = jnp.maximum(logs, LOG_S_FLOOR)       # (M, 1)
        expo = -jnp.exp(_safe_log(lvsq) - logs_f - math.log(2.0))
        log_plv = expo - 0.5 * (LOG2PI + logs_f)      # (M, N)
        log_pv = _safe_log(p_v)
        joint = log_plv + log_pv                      # (M, N)
        joint = jnp.where(alive_b, joint, -jnp.inf)
        jmax = jnp.max(joint, axis=0, keepdims=True)  # (1, N)
        jmax_s = jnp.where(jnp.isfinite(jmax), jmax, 0.0)
        log_pl = jmax_s + jnp.log(
            jnp.sum(jnp.exp(joint - jmax_s), axis=0, keepdims=True))
        log_pl = jnp.maximum(log_pl, LOG_PL_FLOOR)    # (1, N)
        p_vl = jnp.exp(joint - log_pl)                # (M, N)
        p_vl = jnp.where(alive_b & lmask_row, p_vl, 0.0)

        # weight_matrix
        wp = p_vl * lw_row                            # (M, N)
        smooth = jnp.dot(wp, lsim, preferred_element_type=f32)
        colsum = jnp.sum(lsim, axis=0, keepdims=True)  # (1, N)
        w = (wp + wbias * lw_row * smooth) / (1.0 + wbias * lw_row * colsum)

        # ---- M-step -------------------------------------------------
        wmax = jnp.max(w, axis=1, keepdims=True)      # (M, 1)
        vp_ok = wmax > 0
        wn = w / jnp.where(vp_ok, wmax, 1.0)
        gram = jnp.dot(wn * wn, llt, preferred_element_type=f32)  # (M, 9)
        gxx, gxy, gxz = gram[:, 0:1], gram[:, 1:2], gram[:, 2:3]
        gyy, gyz, gzz = gram[:, 4:5], gram[:, 5:6], gram[:, 8:9]
        nvx, nvy, nvz = _smallest_eigvec_3x3_cols(gxx, gxy, gxz,
                                                  gyy, gyz, gzz)
        sgn = jnp.sign(nvz)
        nvx, nvy, nvz = nvx * sgn, nvy * sgn, nvz * sgn

        # s update: log s = logsumexp(log lvsq + log p_vl) - log sum p_vl
        log_lvsq = _safe_log(lvsq)
        lb = _safe_log(p_vl)
        t = jnp.where(p_vl > 0, log_lvsq + lb, -jnp.inf)
        tm = jnp.max(t, axis=1, keepdims=True)
        tm_s = jnp.where(jnp.isfinite(tm), tm, 0.0)
        num = tm_s + jnp.log(jnp.sum(jnp.exp(t - tm_s), axis=1,
                                     keepdims=True))
        has_nan = jnp.any(jnp.isnan(t), axis=1, keepdims=True)
        num = jnp.where(has_nan, jnp.nan, num)
        den_lin = jnp.sum(p_vl, axis=1, keepdims=True)
        den = _safe_log(den_lin)
        s_log_new = num - den
        s_log_new = jnp.clip(s_log_new, LOG_S_THRESH, log_max_stdd)
        s_nan = jnp.isnan(s_log_new)

        upd = alive_b & vp_ok
        vnx = jnp.where(upd, nvx, vc[:, 0:1])
        vny = jnp.where(upd, nvy, vc[:, 1:2])
        vnz = jnp.where(upd, nvz, vc[:, 2:3])
        logs2 = jnp.where(upd, s_log_new, logs)
        dotv = jnp.abs(vc[:, 0:1] * vnx + vc[:, 1:2] * vny
                       + vc[:, 2:3] * vnz)
        err = _acos(jnp.minimum(dotv, 1.0))           # (M, 1)
        contributes = upd & (~s_nan)
        max_err = jnp.max(jnp.where(contributes, err, 0.0))
        removed = alive_b & ((~vp_ok) | s_nan | (contributes & (err > 1.5)))
        alive2 = alive_b & (~removed)

        v_next2 = jnp.concatenate([vnx, vny, vnz], axis=1)
        vn2 = jnp.where(go, v_next2, vn)
        logs2 = jnp.where(go, logs2, logs)
        alive_c2 = jnp.where(go, alive2.astype(f32), alive_c)

        converged = (max_err < final_conv) | (i == num_iter - 1)
        done2 = jnp.maximum(done, jnp.where(
            (go & converged) | empty_now, 1.0, 0.0))
        empty2 = jnp.maximum(empty, jnp.where(
            (done < 0.5) & empty_now, 1.0, 0.0))

        swap = go & (~converged)
        i2 = jnp.where(swap, i + 1.0, i)
        vc2 = jnp.where(swap, vn2, vc)
        return (step + 1, vc2, vn2, logs2, alive_c2, i2, done2, empty2)

    def cond(carry):
        step = carry[0]
        done = carry[6]
        return (step < plain_steps) & (done < 0.5)

    init = (jnp.int32(0), v0, vn0, logs_col0, alive_col0, i0, done0, empty0)
    out = jax.lax.while_loop(cond, one_iter, init)
    _, vc, vn, logs, alive_c, i, done, empty = out

    v_out_ref[...] = vc
    vn_out_ref[...] = vn
    logs_out_ref[...] = jnp.concatenate([logs, alive_c], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    flg = jnp.where(cols == 2, i, jnp.where(cols == 3, done,
                    jnp.where(cols == 4, empty, 0.0)))
    flags_out_ref[...] = flg.astype(f32)


@functools.partial(jax.jit, static_argnames=(
    "plain_steps", "wbias", "final_conv", "num_iter", "wrap_quirk",
    "interpret"))
def em_phase_pallas(l, lp, llt, lsim, lweight, means, gweights, sigma,
                   log_max_stdd, v_cur, v_next, log_s, alive, i, done,
                   empty, *, plain_steps: int, wbias: float,
                   final_conv: float, num_iter: int, wrap_quirk: bool,
                   interpret: bool = False):
    """Single-image plain-iteration phase (vmap over a batch for the
    pipeline). Returns (v_cur, v_next, log_s, alive, i, done, empty)
    exactly as ``plain_steps`` applications of ``em.body`` (modulo f32
    op-order and the polynomial atan) with per-image early exit."""
    f32 = jnp.float32
    n = l.shape[0]
    m = v_cur.shape[0]
    k = means.shape[0]

    lpmid = 0.5 * (lp[:, 0:2] + lp[:, 2:4])
    lpdir = lp[:, 0:2] - lp[:, 2:4]
    logs_pack = jnp.stack([log_s, alive.astype(f32)], axis=1)  # (M, 2)
    flags = jnp.zeros((1, 8), f32)
    flags = flags.at[0, 2].set(i.astype(f32))
    flags = flags.at[0, 3].set(done.astype(f32))
    flags = flags.at[0, 4].set(empty.astype(f32))
    scal = jnp.zeros((1, 8), f32)
    scal = scal.at[0, 0].set(sigma)
    scal = scal.at[0, 1].set(log_max_stdd)

    kern = functools.partial(
        _em_phase_kernel, m_slots=m, n_lines=n, n_comp=k,
        plain_steps=plain_steps, wbias=wbias, final_conv=final_conv,
        num_iter=num_iter, wrap_quirk=wrap_quirk)
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13
    v_o, vn_o, logs_o, flags_o = pl.pallas_call(
        kern,
        in_specs=specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((m, 3), f32),
            jax.ShapeDtypeStruct((m, 3), f32),
            jax.ShapeDtypeStruct((m, 2), f32),
            jax.ShapeDtypeStruct((1, 8), f32),
        ],
        interpret=interpret,
    )(l.astype(f32), lpmid.astype(f32), lpdir.astype(f32), llt.astype(f32),
      lsim.astype(f32), lweight.astype(f32)[:, None], means.astype(f32),
      gweights.astype(f32)[:, None], scal, v_cur.astype(f32),
      v_next.astype(f32), logs_pack, flags)

    return (v_o, vn_o, logs_o[:, 0], logs_o[:, 1] > 0.5,
            flags_o[0, 2].astype(jnp.int32), flags_o[0, 3] > 0.5,
            flags_o[0, 4] > 0.5)
