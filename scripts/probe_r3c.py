#!/usr/bin/env python3
"""Focused chip probe for the y-moment-derivation + fused-group-scan
detector change (round 3c): stats-stage and whole-detector timings at
the production combo, plus the real-photo device-path horizon errors
(the ihme knife-edge gate) — all on the real TPU.
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
    from vanishing_points_2017_tpu.models import synth
    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    from vanishing_points_2017_tpu.ops import lines_device as ld

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    imgs = [render_scene_image(
        synth.make_scene(rng, lines_per_vp=int(rng.integers(30, 60)),
                         outliers=int(rng.integers(10, 30))),
        size=size, rng=rng) for _ in range(batch)]
    images = jnp.asarray(np.stack(imgs).astype(np.float32))

    n_pad = 512
    tol = math.radians(ld.TOL_DEG)
    cos_tol = math.cos(tol)

    def front(img):
        im = ld._gaussian_blur(img, 1.0)
        com1 = im[1:, 1:] - im[:-1, :-1]
        com2 = im[:-1, 1:] - im[1:, :-1]
        gx = 0.5 * (com1 + com2)
        gy = 0.5 * (com1 - com2)
        mag = jnp.sqrt(gx * gx + gy * gy)
        active = mag > ld.QUANT / math.sin(tol)
        inv = jnp.where(mag > 0, 1.0 / jnp.maximum(mag, 1e-12), 0.0)
        return active, gx * inv, -gy * inv, mag

    def stats(img, root, mag, active):
        h, w = img.shape
        hi, wi = h - 1, w - 1
        s = max(h, w) / 2.0
        ys_i, xs_i = jnp.meshgrid(jnp.arange(hi, dtype=jnp.float32),
                                  jnp.arange(wi, dtype=jnp.float32),
                                  indexing="ij")
        xn2 = ((xs_i + 0.5) - w / 2.0) / s
        yn2 = -((ys_i + 0.5) - h / 2.0) / s
        wgt = jnp.where(active, mag / 255.0, 0.0)
        return ld._component_stats(root, wgt.reshape(-1), xn2, yn2, n_pad,
                                   (hi, wi))

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
        print(f"{name:>40}: {dt * 1000 / batch:7.3f} ms/img "
              f"({dt * 1000:8.2f} ms/batch, compile {compile_s:.1f}s)",
              flush=True)
        return out

    if not os.environ.get("PROBE_SKIP_TIMING"):
        active, ux, uy, mag = jax.jit(jax.vmap(front))(images)
        root = ld._ccl_dispatch_factory(cos_tol, 8, "pallas")
        roots = jax.jit(jax.vmap(lambda a, x, y: root(a, x, y)))(
            active, ux, uy)
        bench("stats (4ch scan + fused group)",
              jax.jit(jax.vmap(stats)), images, roots, mag, active)
        det = jax.jit(jax.vmap(
            lambda im: ld.detect_segments_device(
                im, max_segments=n_pad, ccl_impl="pallas", sort_impl="xla")))
        bench("whole detector ccl=pallas sort=xla", det, images)

    # ---- real-photo device-path gate on the chip
    ref = "/root/reference/assets/examples"
    if os.path.isdir(ref) and not os.environ.get("PROBE_SKIP_PHOTOS"):
        import dataclasses
        from vanishing_points_2017_tpu.pipeline import (
            Pipeline, PipelineConfig)
        from vanishing_points_2017_tpu import weights as wload
        params, mean = wload.load_params_and_mean(warn=False)
        pipe = Pipeline(params=params, mean=mean,
                        cfg=dataclasses.replace(PipelineConfig()))
        refs = [("ihme_zentrum.jpg", 0.7701, 0.7743),
                ("uni_hannover.jpg", 0.7458, 0.7336),
                ("uni_hannover_lichthof.jpg", 0.3889, 0.3877)]
        worst = 0.0
        for name, rl, rr in refs:
            host = pipe.ingest_image(os.path.join(ref, name),
                                     target_size=640)
            out = pipe.process_images([host["gray"]])
            h, w = host["image_shape"]
            s = max(h, w) / 2.0
            hp1 = np.asarray(out["hp1"])[0]
            hp2 = np.asarray(out["hp2"])[0]
            fl = (h / 2.0 - float(hp1[1]) * s) / h
            fr = (h / 2.0 - float(hp2[1]) * s) / h
            err = max(abs(fl - rl), abs(fr - rr))
            worst = max(worst, err)
            print(f"real-photo {name:>28}: err {err:.4f} "
                  f"(valid={bool(np.asarray(out['em_valid'])[0])})",
                  flush=True)
        print(f"real-photo worst err: {worst:.4f} (gate 0.10)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
