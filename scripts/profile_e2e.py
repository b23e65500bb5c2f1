#!/usr/bin/env python3
"""Close the e2e perf accounting (VERDICT r2 item 3).

Round 2 left a hole: device stages summed to ~10 ms/img while measured
e2e was ~24-28 ms/img at batch 16 — ~14 ms/img of dispatch/H2D/readback
unaccounted. This script measures every term on the REAL device so the
stage table in BASELINE.md sums to >= 90% of e2e:

  - rtt:        one python->device->python round trip (tiny scalar program)
  - h2d:        jnp.asarray of the uint8 image batch + forcing readback
  - det:        detector program on device-resident images (+1 rtt)
  - post:       render+CNN+EM+horizon program on device-resident lines (+1 rtt)
  - e2e_serial: the bench loop (H2D + det + post + readback every iter)
  - e2e_pipe:   issue all iterations back-to-back, read back at the end
                (throughput semantics: overlaps RTT/H2D with compute)
  - EM iteration stats per batch (median / max — the lockstep cost driver)
  - optional: a post variant with num_iter=K to price one EM iteration

Writes one JSON line to stdout; progress to stderr.

Env: PROF_BATCHES="16,32", PROF_ITERS=8, PROF_SIZE=640,
PROF_EM_VARIANT_ITERS (0 = skip the extra program), PROF_PLATFORM.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    sys.stderr.write(f"profile_e2e[{time.strftime('%H:%M:%S')}]: {msg}\n")
    sys.stderr.flush()


def main():
    if os.environ.get("PROF_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["PROF_PLATFORM"])
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    from vanishing_points_2017_tpu.models import synth
    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    from vanishing_points_2017_tpu.pipeline import (PipelineConfig,
                                                    device_pipeline_batch,
                                                    pad_lines)
    from vanishing_points_2017_tpu.ops.lines_device import (
        detect_segments_device)
    from vanishing_points_2017_tpu.ops import lines as lineops
    from vanishing_points_2017_tpu import weights as wload

    batches = [int(b) for b in
               os.environ.get("PROF_BATCHES", "16,32").split(",")]
    iters = int(os.environ.get("PROF_ITERS", "8"))
    size = int(os.environ.get("PROF_SIZE", "640"))
    em_variant_iters = int(os.environ.get("PROF_EM_VARIANT_ITERS", "5"))

    cfg = PipelineConfig()
    params, mean = wload.load_params_and_mean(warn=False)
    wparams = jax.tree.map(jnp.asarray, params)
    wmean = jnp.asarray(mean, jnp.float32)

    log(f"device={jax.devices()[0].device_kind} batches={batches} "
        f"iters={iters} size={size}")

    # --- tiny programs (shared across batch sizes where shapes allow) ---
    tiny_scalar = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    float(tiny_scalar(z))  # compile + server setup
    t0 = time.time()
    n_rtt = 20
    for _ in range(n_rtt):
        float(tiny_scalar(z))
    rtt = (time.time() - t0) / n_rtt
    log(f"rtt = {rtt * 1000:.1f} ms")

    tiny_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def force(x):
        return float(tiny_sum(x))

    def detect_stage(ims):
        def one(img):
            lp_d, lm_d = detect_segments_device(img, max_segments=cfg.n_pad)
            l_d = jnp.where(lm_d[:, None],
                            lineops.segments_to_homogeneous(lp_d), 0.0)
            return l_d, lp_d, lm_d
        return jax.vmap(one)(ims)

    results = {"rtt_ms": round(rtt * 1000, 2), "iters": iters, "size": size,
               "device": jax.devices()[0].device_kind, "batches": {}}

    import dataclasses
    for batch in batches:
        rng = np.random.default_rng(0)
        imgs_np = []
        for _ in range(batch):
            scene = synth.make_scene(rng,
                                     lines_per_vp=int(rng.integers(30, 60)),
                                     outliers=int(rng.integers(10, 30)))
            imgs_np.append(render_scene_image(scene, size=size, rng=rng))
        imgs_host = np.stack(imgs_np).astype(np.uint8)

        log(f"[b{batch}] compiling det...")
        t0 = time.time()
        imgs_dev = jnp.asarray(imgs_host)
        det_prog = jax.jit(detect_stage).lower(imgs_dev).compile()
        a0, b0, c0 = det_prog(imgs_dev)
        force(c0)  # first exec incl. server setup
        det_setup = time.time() - t0
        log(f"[b{batch}] det ready in {det_setup:.1f}s; compiling post...")

        t0 = time.time()
        post_prog = jax.jit(
            lambda a, b, c, pp, mm: device_pipeline_batch(a, b, c, pp, mm,
                                                          cfg)) \
            .lower(a0, b0, c0, wparams, wmean).compile()
        out0 = post_prog(a0, b0, c0, wparams, wmean)
        force(out0["hp1"])
        post_setup = time.time() - t0
        log(f"[b{batch}] post ready in {post_setup:.1f}s; measuring...")

        # EM iteration stats (lockstep driver): batch max vs median
        iters_arr = np.asarray(out0["iterations"])
        em_stats = {"median": float(np.median(iters_arr)),
                    "max": int(iters_arr.max()),
                    "mean": round(float(iters_arr.mean()), 1)}

        # --- stage timings (averaged over `iters` reps each) ---
        def timeit(fn, reps=iters):
            t0 = time.time()
            for _ in range(reps):
                fn()
            return (time.time() - t0) / reps

        t_h2d = timeit(lambda: force(jnp.asarray(imgs_host)))
        t_det = timeit(lambda: force(det_prog(imgs_dev)[2]))
        t_post = timeit(
            lambda: force(post_prog(a0, b0, c0, wparams, wmean)["hp1"]))

        def serial_iter():
            ims = jnp.asarray(imgs_host)
            aa, bb, cc = det_prog(ims)
            out = post_prog(aa, bb, cc, wparams, wmean)
            force(out["hp1"])
        t_serial = timeit(serial_iter)

        def pipelined():
            outs = []
            for _ in range(iters):
                ims = jnp.asarray(imgs_host)
                aa, bb, cc = det_prog(ims)
                outs.append(post_prog(aa, bb, cc, wparams, wmean))
            for o in outs:
                force(o["hp1"])
        t0 = time.time()
        pipelined()
        t_pipe = (time.time() - t0) / iters

        rec = {
            "det_setup_s": round(det_setup, 1),
            "post_setup_s": round(post_setup, 1),
            "h2d_ms": round((t_h2d - rtt) * 1000, 2),
            "det_ms": round((t_det - rtt) * 1000, 2),
            "post_ms": round((t_post - rtt) * 1000, 2),
            "serial_ms_per_batch": round(t_serial * 1000, 2),
            "pipelined_ms_per_batch": round(t_pipe * 1000, 2),
            "serial_img_per_s": round(batch / t_serial, 2),
            "pipelined_img_per_s": round(batch / t_pipe, 2),
            "em_iterations": em_stats,
        }
        # closure check: h2d + det + post + 1 rtt vs serial
        acct = (t_h2d - rtt) + (t_det - rtt) + (t_post - rtt) + rtt
        rec["accounted_ms"] = round(acct * 1000, 2)
        rec["accounted_frac_of_serial"] = round(acct / t_serial, 3)
        results["batches"][str(batch)] = rec
        log(f"[b{batch}] {json.dumps(rec)}")

        # --- optional EM-iteration pricing: same post program but with a
        # hard iteration cap; the time delta prices the lockstep tail ---
        if em_variant_iters and batch == batches[0]:
            cfg_k = dataclasses.replace(
                cfg, em=dataclasses.replace(cfg.em,
                                            num_iter=em_variant_iters))
            log(f"[b{batch}] compiling post variant "
                f"num_iter={em_variant_iters}...")
            t0 = time.time()
            post_k = jax.jit(
                lambda a, b, c, pp, mm: device_pipeline_batch(
                    a, b, c, pp, mm, cfg_k)) \
                .lower(a0, b0, c0, wparams, wmean).compile()
            outk = post_k(a0, b0, c0, wparams, wmean)
            force(outk["hp1"])
            setup_k = time.time() - t0
            t_post_k = timeit(
                lambda: force(post_k(a0, b0, c0, wparams, wmean)["hp1"]))
            full_iters = int(np.asarray(out0["iterations"]).max())
            capped_iters = int(np.asarray(outk["iterations"]).max())
            d_it = max(full_iters - capped_iters, 1)
            per_iter_ms = (t_post - t_post_k) * 1000 / d_it
            results["em_variant"] = {
                "num_iter": em_variant_iters,
                "setup_s": round(setup_k, 1),
                "post_ms": round((t_post_k - rtt) * 1000, 2),
                "batch_max_iters_full": full_iters,
                "batch_max_iters_capped": capped_iters,
                "per_em_iter_ms_per_batch": round(per_iter_ms, 3),
            }
            log(f"[b{batch}] em_variant {json.dumps(results['em_variant'])}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
