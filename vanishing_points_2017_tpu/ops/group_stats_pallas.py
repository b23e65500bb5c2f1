"""Fused Pallas group-statistics for the detector's record pipeline.

After the bitonic sort (``sort_pallas``) the detector reduces each
root-group of run records: segmented prefix sums of 7 moment channels,
per-group principal direction, an end-to-start broadcast of that
direction, extremal projections (segmented min/max), and a per-group
score. In XLA these are ~50 doubling-step HLO ops over (R,) arrays —
measured ~25 ms/batch-of-16 of pure per-op dispatch overhead on TPU
v5e. Here the whole chain — sort substages AND reduction phases — runs
as a sequence of small Mosaic kernels over the SAME packed (S, 128)
column-major layout, so records are packed/unpacked exactly once.

Element order is the sort's: element i lives at (row i mod S, lane
i div S). A doubling shift by d along element order is:
  * d multiple of S: a pure lane roll (d/S lanes);
  * d < S: a sublane roll, with the wrapped rows taken from the
    neighbouring lane (one extra lane roll) — 3 rolls + 2 selects.
Masks are carried as int32 0/1 (Mosaic cannot reshape/slice i1
vectors; elementwise i1 compare/select is fine).

Semantics are element-for-element those of
``lines_device._component_stats`` between the sort and the final
top-k (which stays in XLA: one top_k(512) + ten 512-wide takes) — with
one round-3 exception: the XLA path now sorts records by the canonical
(root, run position) key pair, while this path sorts by root only, so
equal-root tie order (and f32 association of the reductions) here
still depends on the pre-sort record order. Opt-in via
``VP_SORT_IMPL=pallas``: chip-measured at parity with the rewritten
XLA path inside the whole detector (the ``lax.map`` batching below
serializes images); see ``sort_pallas``'s postscript.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sort_pallas import LANES, _ceil_pow2, _kernel as _sort_kernel

_I32_MAX = jnp.iinfo(jnp.int32).max


def _iotas(S):
    row_i = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    return row_i, lane_i


def _shift_fwd(x, d, S, fill):
    """Value of element i-d at position i (elements i < d get fill)."""
    row_i, lane_i = _iotas(S)
    if d % S == 0:
        q = d // S
        out = pltpu.roll(x, q, 1)
        return jnp.where(lane_i < q, fill, out)
    a = pltpu.roll(x, d, 0)
    b = pltpu.roll(pltpu.roll(x, 1, 1), d, 0)
    out = jnp.where(row_i >= d, a, b)
    return jnp.where((lane_i == 0) & (row_i < d), fill, out)


def _shift_bwd(x, d, S, fill):
    """Value of element i+d at position i (elements i >= n-d get fill)."""
    row_i, lane_i = _iotas(S)
    if d % S == 0:
        q = d // S
        out = pltpu.roll(x, LANES - q, 1)
        return jnp.where(lane_i >= LANES - q, fill, out)
    a = pltpu.roll(x, S - d, 0)
    b = pltpu.roll(pltpu.roll(x, LANES - 1, 1), S - d, 0)
    out = jnp.where(row_i < S - d, a, b)
    return jnp.where((lane_i == LANES - 1) & (row_i >= S - d), fill, out)


# ---------------------------------------------------------------------------
# phase kernels (each handles a chunk of doubling steps; state in/out)
# ---------------------------------------------------------------------------

def _sums_kernel(m_ref, sums_ref, om_ref, osums_ref, *, S, steps):
    """Segmented inclusive prefix-sum doubling steps for 7 channels.
    m: int32 0/1 'still connected to the element d to the left' chain."""
    m = m_ref[...]
    sums = [sums_ref[i] for i in range(7)]
    for d in steps:
        m_ok = m == 1
        for i in range(7):
            sh = _shift_fwd(sums[i], d, S, 0.0)
            sums[i] = jnp.where(m_ok, sums[i] + sh, sums[i])
        m = m * _shift_fwd(m, d, S, 0)
    om_ref[...] = m
    for i in range(7):
        osums_ref[i] = sums[i]


def _moments_kernel(sums_ref, out_ref, *, S):
    """Elementwise: group sums -> (cx, cy, ddx, ddy, lam_min).
    Exact transcription of lines_device._component_stats' moment block
    (meaningful at group-end positions)."""
    s_w = sums_ref[0]
    s_wx, s_wy = sums_ref[1], sums_ref[2]
    s_wxx, s_wxy, s_wyy = sums_ref[3], sums_ref[4], sums_ref[5]
    sw = jnp.maximum(s_w, 1e-9)
    cx, cy = s_wx / sw, s_wy / sw
    vxx = jnp.maximum(s_wxx / sw - cx * cx, 0.0)
    vxy = s_wxy / sw - cx * cy
    vyy = jnp.maximum(s_wyy / sw - cy * cy, 0.0)
    tr = vxx + vyy
    det = vxx * vyy - vxy * vxy
    lam_max = 0.5 * tr + jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    lam_min = jnp.maximum(tr - lam_max, 0.0)
    ex_a, ey_a = vxy, lam_max - vxx
    ex_b, ey_b = lam_max - vyy, vxy
    use_a = ex_a * ex_a + ey_a * ey_a >= ex_b * ex_b + ey_b * ey_b
    ex = jnp.where(use_a, ex_a, ex_b)
    ey = jnp.where(use_a, ey_a, ey_b)
    en = jnp.sqrt(ex * ex + ey * ey)
    ok_e = en > 1e-12
    ddx = jnp.where(ok_e, ex / jnp.where(ok_e, en, 1.0), 1.0)
    ddy = jnp.where(ok_e, ey / jnp.where(ok_e, en, 1.0), 0.0)
    out_ref[0] = cx
    out_ref[1] = cy
    out_ref[2] = ddx
    out_ref[3] = ddy
    out_ref[4] = lam_min


def _bcast_kernel(m_ref, dd_ref, om_ref, odd_ref, *, S, steps):
    """Reverse broadcast: each group END's (ddx, ddy) to all members.
    m: int32 0/1 'same group as the element d to the right' chain."""
    m = m_ref[...]
    dd = [dd_ref[0], dd_ref[1]]
    for d in steps:
        m_ok = m == 1
        for i in range(2):
            sh = _shift_bwd(dd[i], d, S, 0.0)
            dd[i] = jnp.where(m_ok, sh, dd[i])
        m = m * _shift_bwd(m, d, S, 0)
    om_ref[...] = m
    odd_ref[0] = dd[0]
    odd_ref[1] = dd[1]


def _minmax_kernel(m_ref, v_ref, om_ref, ov_ref, *, S, steps):
    """Segmented min doubling for 2 channels (vmin, and -vmax as a min).
    Same forward mask chain as the sums."""
    m = m_ref[...]
    v = [v_ref[0], v_ref[1]]
    for d in steps:
        m_ok = m == 1
        for i in range(2):
            sh = _shift_fwd(v[i], d, S, jnp.float32(jnp.inf))
            v[i] = jnp.where(m_ok, jnp.minimum(v[i], sh), v[i])
        m = m * _shift_fwd(m, d, S, 0)
    om_ref[...] = m
    ov_ref[0] = v[0]
    ov_ref[1] = v[1]


def _prep_kernel(rs_ref, pay_ref, gconn_ref, rconn_ref, q7_ref, *, S):
    """rs + sorted payload -> gconn/rconn masks (i32) + the 7 sum
    channels (copies; the sums kernel accumulates in place)."""
    rs = rs_ref[...]
    prev = _shift_fwd(rs, 1, S, -2)
    nxt = _shift_bwd(rs, 1, S, -3)
    gconn_ref[...] = (rs == prev).astype(jnp.int32)
    rconn_ref[...] = (rs == nxt).astype(jnp.int32)
    for i in range(7):
        q7_ref[i] = pay_ref[i]


def _proj_kernel(rs_ref, pay_ref, dd_ref, v_ref, *, S):
    """Projections t0/t1 from broadcast directions; emits the two
    min-scan channels (min(t0,t1)+inf, -max(t0,t1)+inf)."""
    rs = rs_ref[...]
    sx0, sx1, sy = pay_ref[7], pay_ref[8], pay_ref[9]
    ddx_b, ddy_b = dd_ref[0], dd_ref[1]
    t0 = ddx_b * sx0 + ddy_b * sy
    t1 = ddx_b * sx1 + ddy_b * sy
    inf = jnp.where(rs >= 0, 0.0, jnp.float32(jnp.inf))
    v_ref[0] = jnp.minimum(t0, t1) + inf
    v_ref[1] = -jnp.maximum(t0, t1) + inf


def _final_kernel(rs_ref, sums_ref, mom_ref, v_ref, out_ref, *, S):
    """Assemble the 11 output channels (score + end-valued stats)."""
    rs = rs_ref[...]
    nxt = _shift_bwd(rs, 1, S, -3)
    g_end = rs != nxt
    score = jnp.where(g_end & (rs >= 0), sums_ref[0], -1.0)
    out_ref[0] = score
    out_ref[1] = rs.astype(jnp.float32)
    out_ref[2] = sums_ref[0]              # mass
    out_ref[3] = sums_ref[6]              # cnt
    out_ref[4] = mom_ref[0]               # cx
    out_ref[5] = mom_ref[1]               # cy
    out_ref[6] = mom_ref[2]               # ddx
    out_ref[7] = mom_ref[3]               # ddy
    out_ref[8] = mom_ref[4]               # lam_min
    out_ref[9] = v_ref[0]                 # gmin
    out_ref[10] = -v_ref[1]               # gmax


# ---------------------------------------------------------------------------
# orchestration: pack once -> sort chunks -> reduction phases -> unpack
# ---------------------------------------------------------------------------

def _vmem_call(kernel, out_shapes, *ins, scratch=(), interpret=False):
    """pallas_call with whole-array VMEM refs (operands are <= ~4 MB)."""
    return pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct(s, d) for s, d in out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ins],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shapes),
        scratch_shapes=list(scratch),
        interpret=interpret,
    )(*ins)


@functools.partial(jax.jit, static_argnames=("interpret",))
def detector_group_stats(rec_root: jnp.ndarray, payload: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """rec_root (R,) i32, payload (10, R) f32 -> (11, R) f32 channels:

    [score, root, mass, cnt, cx, cy, ddx, ddy, lam_min, gmin, gmax]

    score is the group's total mass at group-END positions (-1
    elsewhere and for the root<0 invalid group); the stat channels are
    meaningful at the same end positions. The caller finishes with
    top_k(score) + takes — everything else runs in packed Pallas space.
    """
    (r,) = rec_root.shape
    n = max(_ceil_pow2(r), 2 * LANES)
    s = n // LANES
    pad = n - r
    f32 = jnp.float32
    kp = jnp.pad(rec_root, (0, pad), constant_values=_I32_MAX)
    pp = jnp.pad(payload, ((0, 0), (0, pad)))
    k2 = kp.reshape(LANES, s).T
    p2 = jnp.transpose(pp.reshape(10, LANES, s), (0, 2, 1))

    # ---- bitonic sort (chunks of ~20 substages; see sort_pallas)
    m_log = n.bit_length() - 1
    stages = [(k, j) for k in range(1, m_log + 1)
              for j in range(k - 1, -1, -1)]
    for c0 in range(0, len(stages), 20):
        part = tuple(stages[c0:c0 + 20])
        k2, p2 = _vmem_call(
            functools.partial(_sort_kernel, S=s, L=10, stages=part),
            [((s, LANES), jnp.int32), ((10, s, LANES), f32)],
            k2, p2,
            scratch=[pltpu.VMEM((s, LANES), jnp.int32),
                     pltpu.VMEM((10, s, LANES), f32),
                     pltpu.VMEM((s, LANES), jnp.int32),
                     pltpu.VMEM((10, s, LANES), f32)],
            interpret=interpret)

    # ---- masks + sum channels
    gconn, rconn, sums = _vmem_call(
        functools.partial(_prep_kernel, S=s),
        [((s, LANES), jnp.int32), ((s, LANES), jnp.int32),
         ((7, s, LANES), f32)],
        k2, p2, interpret=interpret)

    steps = [1 << t for t in range(m_log)]
    m = gconn
    for c0 in range(0, len(steps), 8):
        m, sums = _vmem_call(
            functools.partial(_sums_kernel, S=s,
                              steps=tuple(steps[c0:c0 + 8])),
            [((s, LANES), jnp.int32), ((7, s, LANES), f32)],
            m, sums, interpret=interpret)

    mom = _vmem_call(
        functools.partial(_moments_kernel, S=s),
        [((5, s, LANES), f32)], sums, interpret=interpret)[0]

    dd = mom[2:4]
    m2 = rconn
    m2, dd = _vmem_call(
        functools.partial(_bcast_kernel, S=s, steps=tuple(steps)),
        [((s, LANES), jnp.int32), ((2, s, LANES), f32)],
        m2, dd, interpret=interpret)

    v = _vmem_call(
        functools.partial(_proj_kernel, S=s),
        [((2, s, LANES), f32)], k2, p2, dd, interpret=interpret)[0]

    m3 = gconn
    m3, v = _vmem_call(
        functools.partial(_minmax_kernel, S=s, steps=tuple(steps)),
        [((s, LANES), jnp.int32), ((2, s, LANES), f32)],
        m3, v, interpret=interpret)

    out = _vmem_call(
        functools.partial(_final_kernel, S=s),
        [((11, s, LANES), f32)], k2, sums, mom, v, interpret=interpret)[0]

    return jnp.transpose(out, (0, 2, 1)).reshape(11, n)[:, :r]


@functools.partial(jax.custom_batching.custom_vmap)
def group_stats(rec_root: jnp.ndarray, payload: jnp.ndarray):
    """Per-image API for ``detector_group_stats`` composing with
    jax.vmap. Batched through lax.map: this lowering path stages ALL
    pallas_call operands in VMEM wholesale (blocked in_specs with a
    grid, memory_space=ANY and manual in-kernel DMA all produced the
    same 51 MB scoped-vmem OOM on a 16-image batch), so one call's
    operands must fit VMEM themselves; per-image calls under a compiled
    sequential loop do, and the TPU's single core would serialize a
    grid anyway. The optimization_barrier keeps XLA from rematerializing
    the record-producing prefix into every loop iteration."""
    return detector_group_stats(rec_root, payload)


@group_stats.def_vmap
def _group_stats_vmap(axis_size, in_batched, rec_root, payload):
    rb, pb = in_batched
    if not rb:
        rec_root = jnp.broadcast_to(rec_root,
                                    (axis_size,) + rec_root.shape)
    if not pb:
        payload = jnp.broadcast_to(payload, (axis_size,) + payload.shape)
    rec_root, payload = jax.lax.optimization_barrier((rec_root, payload))
    out = jax.lax.map(lambda args: detector_group_stats(*args),
                      (rec_root, payload))
    return out, True
