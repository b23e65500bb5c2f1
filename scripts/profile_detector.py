#!/usr/bin/env python3
"""Split the device detector's cost: gradient+CCL vs selection vs moments.

Times truncated variants of ``detect_segments_device`` as separate jitted
programs (each pays the axon per-program setup once) so the differences
give the per-stage device cost. Use PROF_* env vars to size the run.
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
    size = int(os.environ.get("PROF_IMAGE_SIZE", "640"))

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from vanishing_points_2017_tpu.models import synth
    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    from vanishing_points_2017_tpu.ops import lines_device as ld

    rng = np.random.default_rng(0)
    imgs = np.stack([
        render_scene_image(synth.make_scene(
            rng, lines_per_vp=int(rng.integers(30, 60)),
            outliers=int(rng.integers(10, 30))), size=size, rng=rng)
        for _ in range(batch)]).astype(np.float32)
    images = jnp.asarray(imgs)

    tol = math.radians(ld.TOL_DEG)
    cos_tol = math.cos(tol)

    def front(image):
        """gradient + activation + directions (shared prologue)."""
        img = ld._gaussian_blur(image.astype(jnp.float32), 1.0)
        com1 = img[1:, 1:] - img[:-1, :-1]
        com2 = img[:-1, 1:] - img[1:, :-1]
        gx, gy = 0.5 * (com1 + com2), 0.5 * (com1 - com2)
        mag = jnp.sqrt(gx * gx + gy * gy)
        active = mag > ld.QUANT / math.sin(tol)
        inv = jnp.where(mag > 0, 1.0 / jnp.maximum(mag, 1e-12), 0.0)
        return active, gx * inv, -gy * inv, mag

    def upto_ccl(image, passes=8):
        active, ux, uy, mag = front(image)
        root = ld._connected_components(active, ux, uy, cos_tol, passes)
        return jnp.sum(root)

    def upto_select(image):
        active, ux, uy, mag = front(image)
        hh, ww = active.shape
        root = ld._connected_components(active, ux, uy, cos_tol, 8)
        wgt = jnp.where(active, mag / 255.0, 0.0)
        sc = max(image.shape) / 2.0
        ys_i, xs_i = jnp.meshgrid(jnp.arange(hh, dtype=jnp.float32),
                                  jnp.arange(ww, dtype=jnp.float32),
                                  indexing="ij")
        xn2 = ((xs_i + 0.5) - image.shape[1] / 2.0) / sc
        yn2 = -((ys_i + 0.5) - image.shape[0] / 2.0) / sc
        st = ld._component_stats(root, wgt.reshape(-1), xn2, yn2, 512,
                                 (hh, ww))
        return st["mass"].sum() + st["tmax"].sum()

    def bench(name, fn, *args):
        f = jax.jit(jax.vmap(fn))
        t0 = time.time()
        out = f(*args)
        np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        setup_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
            np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"{name:>22}: {dt * 1000 / batch:8.3f} ms/img "
              f"({dt * 1000:9.2f} ms/batch, setup {setup_s:.1f}s)",
              flush=True)

    bench("gradient front", lambda im: front(im)[3], images)
    bench("+ccl(2 passes)", lambda im: upto_ccl(im, 2), images)
    bench("+ccl(8 passes)", upto_ccl, images)
    bench("+selection", upto_select, images)
    bench("full detector", lambda im: ld.detect_segments_device(
        im, max_segments=512)[0], images)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
