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

Mosaic-compatibility notes: every operand arrives in its final layout
(row vectors pre-transposed to (1, N)/(1, K) by the wrapper — in-kernel
(N,) -> (1, N) reshapes are sublane->lane relayouts), the VP state is
carried as (M, 1) COLUMNS (no in-kernel concatenate), counters/flags live
in SMEM, and asin/acos/atan come from the same range-reduced atan
polynomial as ``ops/sphere_pallas`` (|err| <= 1e-5 rad).
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
    return jnp.where(u < 0, -a, jnp.where(u > 0, a, 0.0))


def _asin(x):
    x = jnp.clip(x, -1.0, 1.0)
    d = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    return jnp.where(d > 0, _atan(x / jnp.where(d > 0, d, 1.0)),
                     jnp.where(x < 0, -jnp.pi / 2, jnp.pi / 2))


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


def _em_phase_kernel(midx_ref, midy_ref, dirx_ref, diry_ref, lmask_ref,
                     llt_ref, lsim_ref, lweight_ref, mx_ref, my_ref, gw_ref,
                     scal_ref, v_in_ref, vn_in_ref, logs_in_ref,
                     alive_in_ref,
                     v_out_ref, vn_out_ref, logs_out_ref, alive_out_ref,
                     flags_out_ref,
                     *, m_slots: int, n_lines: int, n_comp: int,
                     plain_steps: int, wbias: float, final_conv: float,
                     num_iter: int, wrap_quirk: bool):
    """One image's plain-iteration phase. All row vectors arrive (1, N) /
    (1, K); llt is (N, 16) (9 used); scal is SMEM (8,):
    [sigma, log_max_stdd, i, done, empty, ...]; VP state is (M, 3) refs
    read/written columnwise; flags out SMEM (8,): [i, done, empty]."""
    f32 = jnp.float32
    lsim = lsim_ref[...]                      # (N, N)
    lw_row = lweight_ref[...]                 # (1, N)
    llt = llt_ref[...]                        # (N, 16)
    midx = midx_ref[...]                      # (1, N)
    midy = midy_ref[...]
    dirx = dirx_ref[...]
    diry = diry_ref[...]
    n2dir = jnp.sqrt(dirx * dirx + diry * diry)
    lmask_row = lmask_ref[...] > 0            # (1, N)

    mx = mx_ref[...]                          # (1, K)
    my = my_ref[...]
    gw = gw_ref[...]

    sigma = scal_ref[0, 0]
    log_max_stdd = scal_ref[0, 1]
    i0 = scal_ref[0, 2]
    done0 = scal_ref[0, 3]
    empty0 = scal_ref[0, 4]

    vx0 = v_in_ref[:, 0:1]                    # (M, 1)
    vy0 = v_in_ref[:, 1:2]
    vz0 = v_in_ref[:, 2:3]
    wx0 = vn_in_ref[:, 0:1]
    wy0 = vn_in_ref[:, 1:2]
    wz0 = vn_in_ref[:, 2:3]
    logs0 = logs_in_ref[...]                  # (M, 1)
    alive0 = alive_in_ref[...]                # (M, 1) f32

    def one_iter(carry):
        (step, vcx, vcy, vcz, wnx, wny, wnz, logs, alive_c,
         i, done, empty) = carry
        alive_b = alive_c > 0.5                      # (M, 1)
        alive_n = jnp.sum(alive_c)
        empty_now = alive_n == 0
        go = (done < 0.5) & (~empty_now)

        # ---- E-step -------------------------------------------------
        vx = jnp.where(alive_b, vcx, 0.0)            # (M, 1)
        vy = jnp.where(alive_b, vcy, 0.0)
        vz = jnp.where(alive_b, vcz, 1.0)

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
        gram = jnp.dot(wn * wn, llt, preferred_element_type=f32)  # (M, 16)
        gxx, gxy, gxz = gram[:, 0:1], gram[:, 1:2], gram[:, 2:3]
        gyy, gyz, gzz = gram[:, 4:5], gram[:, 5:6], gram[:, 8:9]
        nvx, nvy, nvz = _smallest_eigvec_3x3_cols(gxx, gxy, gxz,
                                                  gyy, gyz, gzz)
        sgn = jnp.where(nvz > 0, 1.0, jnp.where(nvz < 0, -1.0, 0.0))
        nvx, nvy, nvz = nvx * sgn, nvy * sgn, nvz * sgn

        # s update: log s = logsumexp(log lvsq + log p_vl) - log sum p_vl
        log_lvsq = _safe_log(lvsq)
        lb = _safe_log(p_vl)
        t = jnp.where(p_vl > 0, log_lvsq + lb, -jnp.inf)
        tm = jnp.max(t, axis=1, keepdims=True)
        tm_s = jnp.where(jnp.isfinite(tm), tm, 0.0)
        num = tm_s + jnp.log(jnp.sum(jnp.exp(t - tm_s), axis=1,
                                     keepdims=True))
        nan_cnt = jnp.sum(jnp.where(jnp.isnan(t), 1.0, 0.0), axis=1,
                          keepdims=True)
        num = jnp.where(nan_cnt > 0, jnp.nan, num)
        den_lin = jnp.sum(p_vl, axis=1, keepdims=True)
        den = _safe_log(den_lin)
        s_log_new = num - den
        s_log_new = jnp.clip(s_log_new, LOG_S_THRESH, log_max_stdd)
        s_nan = jnp.isnan(s_log_new)

        upd = alive_b & vp_ok
        cnx = jnp.where(upd, nvx, vcx)
        cny = jnp.where(upd, nvy, vcy)
        cnz = jnp.where(upd, nvz, vcz)
        logs2 = jnp.where(upd, s_log_new, logs)
        dotv = jnp.abs(vcx * cnx + vcy * cny + vcz * cnz)
        err = _acos(jnp.minimum(dotv, 1.0))           # (M, 1)
        contributes = upd & (~s_nan)
        max_err = jnp.max(jnp.where(contributes, err, 0.0))
        removed = alive_b & ((~vp_ok) | s_nan | (contributes & (err > 1.5)))
        alive2 = alive_b & (~removed)

        wnx2 = jnp.where(go, cnx, wnx)
        wny2 = jnp.where(go, cny, wny)
        wnz2 = jnp.where(go, cnz, wnz)
        logs2 = jnp.where(go, logs2, logs)
        alive_c2 = jnp.where(go, jnp.where(alive2, 1.0, 0.0), alive_c)

        converged = (max_err < final_conv) | (i == num_iter - 1)
        done2 = jnp.maximum(done, jnp.where(
            (go & converged) | empty_now, 1.0, 0.0))
        empty2 = jnp.maximum(empty, jnp.where(
            (done < 0.5) & empty_now, 1.0, 0.0))

        swap = go & (~converged)
        i2 = jnp.where(swap, i + 1.0, i)
        vcx2 = jnp.where(swap, wnx2, vcx)
        vcy2 = jnp.where(swap, wny2, vcy)
        vcz2 = jnp.where(swap, wnz2, vcz)
        return (step + 1, vcx2, vcy2, vcz2, wnx2, wny2, wnz2, logs2,
                alive_c2, i2, done2, empty2)

    def cond(carry):
        step = carry[0]
        done = carry[10]
        return (step < plain_steps) & (done < 0.5)

    init = (jnp.int32(0), vx0, vy0, vz0, wx0, wy0, wz0, logs0, alive0,
            i0, done0, empty0)
    out = jax.lax.while_loop(cond, one_iter, init)
    (_, vcx, vcy, vcz, wnx, wny, wnz, logs, alive_c, i, done, empty) = out

    v_out_ref[:, 0:1] = vcx
    v_out_ref[:, 1:2] = vcy
    v_out_ref[:, 2:3] = vcz
    vn_out_ref[:, 0:1] = wnx
    vn_out_ref[:, 1:2] = wny
    vn_out_ref[:, 2:3] = wnz
    logs_out_ref[...] = logs
    alive_out_ref[...] = alive_c
    flags_out_ref[0, 0] = jnp.float32(0.0)
    flags_out_ref[0, 1] = jnp.float32(0.0)
    flags_out_ref[0, 2] = i
    flags_out_ref[0, 3] = done
    flags_out_ref[0, 4] = empty
    flags_out_ref[0, 5] = jnp.float32(0.0)
    flags_out_ref[0, 6] = jnp.float32(0.0)
    flags_out_ref[0, 7] = jnp.float32(0.0)


@functools.partial(jax.jit, static_argnames=(
    "plain_steps", "wbias", "final_conv", "num_iter", "wrap_quirk",
    "interpret"))
def em_phase_pallas(l, lp, llt, lsim, lweight, means, gweights, sigma,
                   log_max_stdd, v_cur, v_next, log_s, alive, i, done,
                   empty, line_mask=None, *, plain_steps: int, wbias: float,
                   final_conv: float, num_iter: int, wrap_quirk: bool,
                   interpret: bool = False):
    """Single-image plain-iteration phase (vmap over a batch for the
    pipeline). Returns (v_cur, v_next, log_s, alive, i, done, empty)
    exactly as ``plain_steps`` applications of ``em.body`` (modulo f32
    op-order and the polynomial atan) with per-image early exit."""
    f32 = jnp.float32
    n = l.shape[0]
    m = v_cur.shape[0]

    lpmid = 0.5 * (lp[:, 0:2] + lp[:, 2:4])
    lpdir = lp[:, 0:2] - lp[:, 2:4]
    midx = lpmid[:, 0].astype(f32).reshape(1, n)
    midy = lpmid[:, 1].astype(f32).reshape(1, n)
    dirx = lpdir[:, 0].astype(f32).reshape(1, n)
    diry = lpdir[:, 1].astype(f32).reshape(1, n)
    if line_mask is None:
        # fallback: infer validity from the zeroed padded rows (a masked-
        # valid degenerate segment with all-zero coords would be missed —
        # callers should pass the real mask)
        lmask = (jnp.sum(jnp.abs(l), axis=1) > 0).astype(f32).reshape(1, n)
    else:
        lmask = line_mask.astype(f32).reshape(1, n)
    llt16 = jnp.pad(llt.astype(f32), ((0, 0), (0, 16 - llt.shape[1])))
    mx = means[:, 0].astype(f32).reshape(1, -1)
    my = means[:, 1].astype(f32).reshape(1, -1)
    gw = gweights.astype(f32).reshape(1, -1)

    scal = jnp.stack([
        jnp.asarray(sigma, f32), jnp.asarray(log_max_stdd, f32),
        i.astype(f32), jnp.where(done, 1.0, 0.0).astype(f32),
        jnp.where(empty, 1.0, 0.0).astype(f32),
        jnp.float32(0), jnp.float32(0), jnp.float32(0)])[None, :]

    kern = functools.partial(
        _em_phase_kernel, m_slots=m, n_lines=n, n_comp=mx.shape[1],
        plain_steps=plain_steps, wbias=wbias, final_conv=final_conv,
        num_iter=num_iter, wrap_quirk=wrap_quirk)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    v_o, vn_o, logs_o, alive_o, flags_o = pl.pallas_call(
        kern,
        in_specs=[vspec] * 11 + [sspec] + [vspec] * 4,
        out_specs=[vspec, vspec, vspec, vspec, sspec],
        out_shape=[
            jax.ShapeDtypeStruct((m, 3), f32),
            jax.ShapeDtypeStruct((m, 3), f32),
            jax.ShapeDtypeStruct((m, 1), f32),
            jax.ShapeDtypeStruct((m, 1), f32),
            jax.ShapeDtypeStruct((1, 8), f32),
        ],
        interpret=interpret,
    )(midx, midy, dirx, diry, lmask, llt16, lsim.astype(f32),
      lweight.astype(f32).reshape(1, n), mx, my, gw, scal,
      v_cur.astype(f32), v_next.astype(f32),
      log_s.astype(f32)[:, None], alive.astype(f32)[:, None])

    return (v_o, vn_o, logs_o[:, 0], alive_o[:, 0] > 0.5,
            flags_o[0, 2].astype(jnp.int32), flags_o[0, 3] > 0.5,
            flags_o[0, 4] > 0.5)
