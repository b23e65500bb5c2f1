"""Pallas TPU bitonic sort: key + payload lanes, one fused kernel.

Why this exists: the detector groups ~41k run records by component root
(``lines_device._component_stats``), and the XLA formulations of that
reorder measured ~85 ms/batch-of-16 (~5.3 ms/img) on TPU v5e. A bitonic
network fused into ONE Mosaic kernel runs the compare-exchanges as
vector instructions over VMEM-resident arrays instead of separate HLO
ops over HBM.

POSTSCRIPT (round 3): the ~85 ms was eventually root-caused NOT to the
sort itself but to the detector's 13 per-channel minor-axis
``take_along_axis`` gathers (~200 ns/element on TPU) hiding in the
same fused region; with record channels fetched by one row-gather and
the sort slimmed to (root, pos, iota), the XLA path dropped to ~1
ms/img and this kernel became an opt-in (``VP_SORT_IMPL=pallas``) at
parity — its ``lax.map`` batching serializes images, giving back what
the fused layout saves. Kept as working large-scale Mosaic machinery
(bitonic network + packed group reductions) and exercised by tests.

Layout: the n = 2^m padded records live in a (S, 128) f32/i32 block
with COLUMN-major element labeling — element i sits at
(row = i mod S, lane = i div S). Keeping the 128-lane axis fixed makes
every row-stride substage (stride < S — 108 of 136 for n = 64k) a free
leading-dim reshape + elementwise select; only lane-stride substages
(28 of 136) need a ``pltpu.roll`` pair.

The network PING-PONGS between two explicit VMEM scratch buffers:
chaining 136 substages as SSA values made Mosaic keep ~18 generations
of all 11 arrays live (51 MB scoped-vmem OOM); with refs the live set
is 2 generations + transients (~6 MB).

Contract (matches ``bitonic.bitonic_sort_key_val`` + payload): keys
ascending, payload lanes carried through the identical exchanges; NOT
stable (ties in any order — group reductions downstream are
order-independent). Padding with INT32_MAX keys sorts to the end.
The caller does the column-major pack/unpack (two cheap XLA
transposes). The production consumer is ``group_stats_pallas``, whose
``group_stats`` wrapper also does the batching (lax.map over per-image
calls — see its docstring for the VMEM platform fact ruling out
grid/vmap batching).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ceil_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _kernel(keys_ref, pay_ref, out_k_ref, out_p_ref,
            ak_ref, ap_ref, bk_ref, bp_ref, *,
            S: int, L: int, stages: tuple):
    """One image, one CHUNK of substages: keys (S, 128) i32, pay
    (L, S, 128) f32, column-major element labeling i = lane * S + row.
    ``stages`` is the ordered (k, j) substage list for this chunk."""
    log_s = S.bit_length() - 1

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)

    ak_ref[...] = keys_ref[...]
    ap_ref[...] = pay_ref[...]

    flip = False  # False: A -> B, True: B -> A
    for k, j in stages:
        src_k, src_p = (bk_ref, bp_ref) if flip else (ak_ref, ap_ref)
        dst_k, dst_p = (ak_ref, ap_ref) if flip else (bk_ref, bp_ref)
        keys = src_k[...]
        if j < log_s:
            # partner lives 2^j rows away: reshape on leading dims
            s = 1 << j
            g = S // (2 * s)
            kk = keys.reshape(g, 2, s, LANES)
            a_k, b_k = kk[:, 0], kk[:, 1]
            # bit k of element index i = lane * S + row, built
            # directly at the pair shape (Mosaic rejects reshaped
            # or sliced i1 vectors)
            if k < log_s:
                gi = jax.lax.broadcasted_iota(jnp.int32,
                                              (g, s, LANES), 0)
                asc4 = (jnp.right_shift(gi, k - j - 1) & 1) == 0
            else:
                li = jax.lax.broadcasted_iota(jnp.int32,
                                              (g, s, LANES), 2)
                asc4 = (jnp.right_shift(li, k - log_s) & 1) == 0
            # a is the lower element of each pair; swap iff the pair
            # is out of the stage's order (strict: ties never move).
            # Logical ops, not where: Mosaic cannot select i1 vectors
            swap = (asc4 & (a_k > b_k)) | (~asc4 & (a_k < b_k))
            lo_k = jnp.where(swap, b_k, a_k)
            hi_k = jnp.where(swap, a_k, b_k)
            dst_k[...] = jnp.stack([lo_k, hi_k], axis=1) \
                .reshape(S, LANES)
            for i in range(L):
                pp = src_p[i].reshape(g, 2, s, LANES)
                a_p, b_p = pp[:, 0], pp[:, 1]
                lo_p = jnp.where(swap, b_p, a_p)
                hi_p = jnp.where(swap, a_p, b_p)
                dst_p[i] = jnp.stack([lo_p, hi_p],
                                     axis=1).reshape(S, LANES)
        else:
            # partner lives 2^(j - log_s) lanes away: roll pair
            sl = 1 << (j - log_s)
            is_lower = (lane_i & sl) == 0
            asc = (jnp.right_shift(lane_i, k - log_s) & 1) == 0

            def partner(x, sl=sl, is_lower=is_lower):
                # roll requires shift >= 0: -sl mod LANES reads [l+sl]
                down = pltpu.roll(x, LANES - sl, 1)  # [l] <- x[l + sl]
                up = pltpu.roll(x, sl, 1)            # [l] <- x[l - sl]
                return jnp.where(is_lower, down, up)

            p_k = partner(keys)
            want_min = ~jnp.logical_xor(asc, is_lower)
            take = (want_min & (p_k < keys)) | (~want_min & (p_k > keys))
            dst_k[...] = jnp.where(take, p_k, keys)
            for i in range(L):
                p = src_p[i]
                dst_p[i] = jnp.where(take, partner(p), p)
        flip = not flip

    fin_k, fin_p = (bk_ref, bp_ref) if flip else (ak_ref, ap_ref)
    out_k_ref[...] = fin_k[...]
    out_p_ref[...] = fin_p[...]


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def sort_records_pallas(keys: jnp.ndarray, payload: jnp.ndarray,
                        interpret: bool = False, chunk: int = 20):
    """Sort ``keys`` (R,) int32 ascending, carrying ``payload`` (L, R).

    Returns (sorted_keys, sorted_payload). Padded slots (key INT32_MAX)
    never appear because the padding is stripped before returning.

    The ~log^2(n)/2 substages are split into chunks of ``chunk``, one
    pallas_call each, chained through HBM: a single fully-unrolled
    kernel (~4k vector ops, 444 KB MLIR) OOM-killed the Mosaic
    compiler, while ~20-substage kernels compile in seconds and the
    extra per-chunk dispatch+DMA (~2.9 MB round trip) is noise.
    """
    (r,) = keys.shape
    l_lanes = payload.shape[0]
    n = max(_ceil_pow2(r), 2 * LANES)
    s = n // LANES
    pad = n - r
    kp = jnp.pad(keys, (0, pad), constant_values=jnp.iinfo(jnp.int32).max)
    pp = jnp.pad(payload, ((0, 0), (0, pad)))
    # column-major pack: element i at (row i mod S, lane i div S)
    k2 = kp.reshape(LANES, s).T
    p2 = jnp.transpose(pp.reshape(l_lanes, LANES, s), (0, 2, 1))

    m = n.bit_length() - 1
    stages = [(k, j) for k in range(1, m + 1)
              for j in range(k - 1, -1, -1)]

    for c0 in range(0, len(stages), chunk):
        part = tuple(stages[c0:c0 + chunk])
        k2, p2 = pl.pallas_call(
            functools.partial(_kernel, S=s, L=l_lanes, stages=part),
            out_shape=(jax.ShapeDtypeStruct((s, LANES), keys.dtype),
                       jax.ShapeDtypeStruct((l_lanes, s, LANES),
                                            payload.dtype)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((s, LANES), keys.dtype),
                pltpu.VMEM((l_lanes, s, LANES), payload.dtype),
                pltpu.VMEM((s, LANES), keys.dtype),
                pltpu.VMEM((l_lanes, s, LANES), payload.dtype),
            ],
            interpret=interpret,
        )(k2, p2)

    ks = k2.T.reshape(n)[:r]
    ps = jnp.transpose(p2, (0, 2, 1)).reshape(l_lanes, n)[:, :r]
    return ks, ps
