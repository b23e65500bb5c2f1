#!/usr/bin/env python3
"""Sub-stage timings inside the device line detector.

Times front (blur+gradient+edge activation), CCL, run-record selection
+ moments, and the whole detector — plus tuning variants (ccl_passes,
runs_per_row) — each as its own jitted program with a readback forcing
completion. Feeds the detector optimization work (TODO item 3 /
VERDICT r2 item 4).

Env: PROF_BATCH=16, PROF_ITERS=8, PROF_IMAGE_SIZE=640, PROF_PLATFORM.
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    if os.environ.get("PROF_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["PROF_PLATFORM"])
    batch = int(os.environ.get("PROF_BATCH", "16"))
    iters = int(os.environ.get("PROF_ITERS", "8"))
    size = int(os.environ.get("PROF_IMAGE_SIZE", "640"))

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from vanishing_points_2017_tpu.models import synth
    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    from vanishing_points_2017_tpu.ops import lines_device as ld

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

    def ccl(active, ux, uy, passes):
        return ld._connected_components(active, ux, uy, cos_tol, passes)

    def stats(img, root, mag, active, runs_per_row, selection="row",
              max_records=32768, topk_impl="exact", stop_after=None):
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
                                   (hi, wi), runs_per_row=runs_per_row,
                                   selection=selection,
                                   max_records=max_records,
                                   topk_impl=topk_impl,
                                   coord_affine=(float(w), float(h), s),
                                   _stop_after=stop_after)

    def bench(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"{name:>34}: {dt * 1000 / batch:7.3f} ms/img "
              f"({dt * 1000:8.2f} ms/batch, compile {compile_s:.1f}s)",
              flush=True)
        return out

    front_j = jax.jit(jax.vmap(front))
    active, ux, uy, mag = bench("front (blur+grad)", front_j, images)

    # PROF_SWEEPS=0 skips the ccl-impl/pass and runs_per_row tuning rows
    # (each is its own axon compile + server setup) when only the bisect
    # or the whole-detector rows are wanted.
    sweeps = os.environ.get("PROF_SWEEPS", "1") == "1"
    if sweeps:
        for passes in (8, 4, 2):
            bench(f"ccl passes={passes}",
                  jax.jit(jax.vmap(
                      lambda a, x, y, p=passes: ccl(a, x, y, p))),
                  active, ux, uy)
        if jax.default_backend() != "cpu":
            from vanishing_points_2017_tpu.ops.ccl_pallas import (
                connected_components_pallas_batch)
            for passes in (8, 4):
                for rpb in (8, 16):
                    bench(f"ccl pallas p={passes} rpb={rpb}",
                          jax.jit(lambda a, x, y, p=passes, r=rpb:
                                  connected_components_pallas_batch(
                                      a, x, y, cos_tol, passes=p,
                                      rows_per_block=r)),
                          active, ux, uy)
    root = jax.vmap(lambda a, x, y: ccl(a, x, y, 8))(active, ux, uy)

    if sweeps:
        for rpr in (64, 32):
            bench(f"stats runs_per_row={rpr}",
                  jax.jit(jax.vmap(lambda im, r, m, a, k=rpr: stats(
                      im, r, m, a, k))),
                  images, root, mag, active)

    # PROF_BISECT=1: time cumulative prefixes of the PRODUCTION
    # _component_stats (via its _stop_after debug knob) at the production
    # config (global selection, full 32k budget). Each prefix is its own
    # program; the delta between consecutive rows is that stage's
    # standalone cost. NB deltas can exceed what the stage costs inside
    # the fused whole-detector program (XLA overlaps independent stages —
    # the round-3c scan find), so optimize on deltas but judge on the
    # whole-detector rows below.
    if os.environ.get("PROF_BISECT", "0") == "1":
        # PROF_BISECT_TOPK defaults to the round-5 production default
        # (PipelineConfig.det_topk == "approx"); "exact" reproduces the
        # round-4 bisect rows.
        btopk = os.environ.get("PROF_BISECT_TOPK", "approx")
        prefixes = ("scans", "select", "sort", "gsum", "broadcast",
                    "minmax", None)
        for stop in prefixes:
            bench(f"stats[global 32768 {btopk}] ..{stop or 'full'}",
                  jax.jit(jax.vmap(lambda im, r, m, a, st=stop: stats(
                      im, r, m, a, 64, selection="global",
                      max_records=32768, topk_impl=btopk,
                      stop_after=st))),
                  images, root, mag, active)

    # whole detector per CCL impl and selection mode — EXPLICIT args
    # (static jit keys), not env flips: detect_segments_device is itself
    # a jit, so an env read at trace time is never repeated on a cache hit.
    # PROF_BUDGETS sweeps the global-selection record budget (the
    # detector cost axis; each budget is its own static shape/compile).
    budgets = tuple(int(b) for b in os.environ.get(
        "PROF_BUDGETS", "16384").split(","))
    ccls = ["pallas", "xla"] if jax.default_backend() != "cpu" else ["xla"]
    for ccl_impl in ccls:
        variants = [("row", 32768, "exact")]
        variants += [("global", b, t) for b in budgets
                     for t in ("exact", "approx")]
        for selection, budget, topk in variants:
            det = jax.jit(jax.vmap(
                lambda im, c=ccl_impl, s=selection, b=budget, t=topk:
                ld.detect_segments_device(
                    im, max_segments=n_pad, ccl_impl=c, selection=s,
                    max_records=b, topk_impl=t)))
            tag = (f" budget={budget} topk={topk}"
                   if selection == "global" else "")
            bench(f"whole detector ccl={ccl_impl} selection={selection}{tag}",
                  det, images)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
