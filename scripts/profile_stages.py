#!/usr/bin/env python3
"""Per-stage device timings for the fused pipeline.

Times each stage of ``device_pipeline_full`` as its own jitted program
(detector / render / CNN / EM / horizon) plus the fused whole, with a
device->host readback forcing completion (``jax.block_until_ready`` does
not block on the axon platform). Numbers feed BASELINE.md and guide kernel
work; stage programs hit the persistent compile cache on re-runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    batch = int(os.environ.get("PROF_BATCH", "16"))
    iters = int(os.environ.get("PROF_ITERS", "8"))
    size = int(os.environ.get("PROF_IMAGE_SIZE", "640"))

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from vanishing_points_2017_tpu.models import synth, cnn as cnn_mod
    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    from vanishing_points_2017_tpu.pipeline import (PipelineConfig, pad_lines,
                                                    device_pipeline_full)
    from vanishing_points_2017_tpu.ops import sphere as sphere_mod
    from vanishing_points_2017_tpu.ops.lines_device import detect_segments_device
    from vanishing_points_2017_tpu.ops import lines as lineops
    from vanishing_points_2017_tpu.em import expectation_maximisation
    from vanishing_points_2017_tpu.em.horizon import calculate_horizon_and_ortho_vp
    from vanishing_points_2017_tpu import weights as wload

    cfg = PipelineConfig()
    params, mean = wload.load_params_and_mean(warn=False)
    if params is None:
        params = cnn_mod.init_params(jax.random.PRNGKey(0))
    if mean is None:
        mean = np.zeros((cfg.sphere_size, cfg.sphere_size), np.float32)
    mean = jnp.asarray(mean, jnp.float32)

    rng = np.random.default_rng(0)
    imgs, ls, lps, masks = [], [], [], []
    for _ in range(batch):
        scene = synth.make_scene(rng, lines_per_vp=int(rng.integers(30, 60)),
                                 outliers=int(rng.integers(10, 30)))
        imgs.append(render_scene_image(scene, size=size, rng=rng))
        l, lp, m = pad_lines(scene.segments, cfg.n_pad)
        ls.append(l), lps.append(lp), masks.append(m)
    images = jnp.asarray(np.stack(imgs).astype(np.float32))
    l = jnp.asarray(np.stack(ls))
    lp = jnp.asarray(np.stack(lps))
    lm = jnp.asarray(np.stack(masks))

    # PROF_STAGES=fused (comma list of name prefixes) restricts to the
    # named programs — unselected stage programs are neither compiled nor
    # run (each costs a full axon compile), except as data dependencies
    # of a selected one.
    only = {s.strip() for s in os.environ.get("PROF_STAGES", "").split(",")
            if s.strip()}

    def want(name):
        return not only or any(name.startswith(s) for s in only)

    def bench(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jnp.sum(leaf.astype(jnp.float32)))  # force readback
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"{name:>28}: {dt * 1000 / batch:7.3f} ms/img "
              f"({dt * 1000:8.2f} ms/batch, compile {compile_s:.1f}s)",
              flush=True)
        return out

    # stage programs
    detect = jax.jit(jax.vmap(
        lambda im: detect_segments_device(im, max_segments=cfg.n_pad)))
    render = jax.jit(jax.vmap(
        lambda a, b: sphere_mod.sphere_image_uint8(a, b,
                                                   size=cfg.sphere_size)))
    cdtype = jnp.dtype(cfg.cnn_dtype).type

    @jax.jit
    def cnn_fwd(img_u8):
        x = cnn_mod.preprocess(img_u8, mean)
        return cnn_mod.forward(params, x, compute_dtype=cdtype)

    em_fn = jax.jit(jax.vmap(
        lambda a, b, c, d, e: expectation_maximisation(a, b, c, d, e, cfg.em)))
    hor = jax.jit(jax.vmap(
        lambda v, c, al: calculate_horizon_and_ortho_vp(
            v, c, al, maxbest=cfg.maxbest, theta_vmin=cfg.theta_vmin)))
    full = jax.jit(
        lambda im: device_pipeline_full(im, params, mean, cfg))

    if want("detector"):
        seg, segmask = bench("detector", detect, images)
        lseg = jax.vmap(lambda s, m: jnp.where(
            m[:, None], lineops.segments_to_homogeneous(s), 0.0))(seg, segmask)
    need_em = want("em") or want("horizon")
    need_pred = want("cnn forward") or need_em
    if want("sphere render") or need_pred:
        img_u8 = bench("sphere render", render, l, lm) if want(
            "sphere render") else render(l, lm)
    if need_pred:
        pred = bench("cnn forward", cnn_fwd, img_u8) if want(
            "cnn forward") else cnn_fwd(img_u8)
    if need_em:
        em = bench("em", em_fn, l, lp, pred,
                   img_u8.astype(jnp.float32), lm) if want("em") \
            else em_fn(l, lp, pred, img_u8.astype(jnp.float32), lm)
    if want("horizon"):
        bench("horizon", hor, em.vp, em.counts, em.alive)
    if want("fused"):
        bench("fused full (detector path)", full, images)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
