#!/usr/bin/env python3
"""Same-session A/B of the round-3c detector changes, isolating them
from tunnel-rtt drift: (a) the per-row moment scan at 7 channels (old:
y-moments scanned per pixel) vs 4 channels (new: y-moments derived per
record), (b) the group stage's 5 separate doubling scans vs the fused
3 (paired copy_first / min+max stacked on a (2, R) operand).

Both variants run in ONE process on the same inputs, so the delta is
pure device time (each timed program still carries its own dispatch
rtt — identical for both sides).
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    batch = int(os.environ.get("PROF_BATCH", "16"))
    iters = int(os.environ.get("PROF_ITERS", "8"))
    size = 640

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    import jax
    import jax.numpy as jnp
    from vanishing_points_2017_tpu.ops import lines_device as ld

    print("backend:", jax.default_backend(), flush=True)
    h = w = size - 1
    rng = np.random.default_rng(1)
    w2 = jnp.asarray((rng.random((batch, h, w)) > 0.85)
                     * rng.random((batch, h, w)), jnp.float32)
    xn2 = jnp.asarray(np.broadcast_to(
        np.linspace(-1, 1, w, dtype=np.float32), (h, w)))
    yn2 = xn2.T
    conn = jnp.asarray(rng.random((batch, h, w)) > 0.5).at[:, :, 0].set(False)
    log_w = max(1, math.ceil(math.log2(w)))

    def scan7(w2b, cb):
        q = jnp.stack([w2b, w2b * xn2, w2b * yn2, w2b * xn2 * xn2,
                       w2b * xn2 * yn2, w2b * yn2 * yn2,
                       (w2b > 0).astype(jnp.float32)], axis=0)
        return ld._segmented_sum_scan(q, cb[None], log_w)

    def scan4(w2b, cb):
        q = jnp.stack([w2b, w2b * xn2, w2b * xn2 * xn2,
                       (w2b > 0).astype(jnp.float32)], axis=0)
        return ld._segmented_sum_scan(q, cb[None], log_w)

    def bench(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"{name:>28}: {dt * 1000 / batch:7.3f} ms/img "
              f"({dt * 1000:8.2f} ms/batch, compile {compile_s:.1f}s)",
              flush=True)

    bench("row scan 7ch (old)", jax.jit(jax.vmap(scan7)), w2, conn)
    bench("row scan 4ch (new)", jax.jit(jax.vmap(scan4)), w2, conn)

    # group stage: R records, 5 separate scans vs fused 3
    R = 40896
    log_r = max(1, math.ceil(math.log2(R)))
    rs = jnp.asarray(np.sort(rng.integers(0, 5000, (batch, R))), jnp.int32)
    vals = jnp.asarray(rng.random((batch, 7, R)), jnp.float32)
    t0v = jnp.asarray(rng.random((batch, R)), jnp.float32)
    t1v = jnp.asarray(rng.random((batch, R)), jnp.float32)
    dd = jnp.asarray(rng.random((batch, 2, R)), jnp.float32)

    def group_old(rsb, vb, t0b, t1b, ddb):
        gconn = jnp.concatenate(
            [jnp.zeros((1,), bool), rsb[1:] == rsb[:-1]])
        same_next = jnp.concatenate(
            [rsb[:-1] == rsb[1:], jnp.zeros((1,), bool)])
        fc = same_next[::-1]
        gsum = ld._segmented_sum_scan(vb, gconn[None], log_r)
        ddx_b = ld._segmented_copy_first(ddb[0][::-1], fc, log_r)[::-1]
        ddy_b = ld._segmented_copy_first(ddb[1][::-1], fc, log_r)[::-1]
        gmin = ld._segmented_min_scan_rows(
            jnp.minimum(t0b, t1b), gconn, log_r)
        gmax = -ld._segmented_min_scan_rows(
            -jnp.maximum(t0b, t1b), gconn, log_r)
        return gsum, ddx_b, ddy_b, gmin, gmax

    def group_new(rsb, vb, t0b, t1b, ddb):
        gconn = jnp.concatenate(
            [jnp.zeros((1,), bool), rsb[1:] == rsb[:-1]])
        same_next = jnp.concatenate(
            [rsb[:-1] == rsb[1:], jnp.zeros((1,), bool)])
        fc = same_next[::-1]
        gsum = ld._segmented_sum_scan(vb, gconn[None], log_r)
        dd_b = ld._segmented_copy_first(
            ddb[:, ::-1], fc[None], log_r)[:, ::-1]
        gmm = ld._segmented_min_scan_rows(
            jnp.stack([jnp.minimum(t0b, t1b), -jnp.maximum(t0b, t1b)]),
            gconn[None], log_r)
        return gsum, dd_b[0], dd_b[1], gmm[0], -gmm[1]

    bench("group 5 scans (old)", jax.jit(jax.vmap(group_old)),
          rs, vals, t0v, t1v, dd)
    bench("group fused 3 (new)", jax.jit(jax.vmap(group_new)),
          rs, vals, t0v, t1v, dd)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
