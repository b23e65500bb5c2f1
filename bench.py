#!/usr/bin/env python3
"""Throughput benchmark: end-to-end images/sec on the current device.

Measures the hot path of the framework — the FUSED device program (sphere
render -> CNN forward -> EM with split/merge -> horizon) vmapped over an
image batch — on pre-extracted line bundles (LSD is the host stage; its
cost is measured separately and reported in the breakdown but the headline
metric matches the reference protocol's eval loop, SURVEY §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md). Its per-image
cost on CPU is dominated by the EM's O(N^2) Python loops plus Agg rendering
and Caffe; the measured reference-equivalent throughput is recorded in
BASELINE.md as ~0.2 images/s (conservative: reference EM alone takes
seconds per image single-threaded). vs_baseline = ours / 0.2.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_IMAGES_PER_SEC = 0.2  # documented estimate, see BASELINE.md


def main() -> int:
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    import jax
    import jax.numpy as jnp

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    from vanishing_points_2017_tpu.models import synth
    from vanishing_points_2017_tpu.pipeline import (Pipeline, PipelineConfig,
                                                    device_pipeline_batch,
                                                    pad_lines)

    from vanishing_points_2017_tpu import weights as wload

    cfg = PipelineConfig()
    # trained weights when available: the EM iteration count (and thus the
    # honest throughput) depends on the CNN prior's quality
    params, mean = wload.load_params_and_mean(warn=False)
    pipe = Pipeline(params=params, mean=mean, cfg=cfg)

    # build a realistic batch of line bundles (no LSD in the hot loop)
    rng = np.random.default_rng(0)
    ls, lps, masks = [], [], []
    for _ in range(batch):
        scene = synth.make_scene(rng, lines_per_vp=int(rng.integers(30, 60)),
                                 outliers=int(rng.integers(10, 30)))
        l, lp, m = pad_lines(scene.segments, cfg.n_pad)
        ls.append(l), lps.append(lp), masks.append(m)
    l = jnp.asarray(np.stack(ls))
    lp = jnp.asarray(np.stack(lps))
    m = jnp.asarray(np.stack(masks))

    from vanishing_points_2017_tpu.utils import aot

    t0 = time.time()
    call = aot.load_or_export(
        f"pipeline_b{batch}",
        lambda a, b, c, p, mn: device_pipeline_batch(a, b, c, p, mn, cfg),
        l, lp, m, pipe.params, pipe.mean)
    def run():
        out = call(l, lp, m, pipe.params, pipe.mean)
        # NB: jax.block_until_ready does not actually block on the axon
        # platform — force a device->host readback so the timing is honest
        return float(jnp.sum(out["hp1"]))

    run()  # first call pays the (cached) XLA compile
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        run()
    dt = time.time() - t0
    imgs_per_sec = batch * iters / dt

    # host LSD cost, for the breakdown
    from vanishing_points_2017_tpu.data import io as dio
    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    scene = synth.make_scene(rng)
    img = render_scene_image(scene, size=640)
    t0 = time.time()
    det = dio.detect_lsd_lines(img.astype(np.float64))
    lsd_s = time.time() - t0

    sys.stderr.write(
        f"device={jax.devices()[0].device_kind} batch={batch} iters={iters} "
        f"compile={compile_s:.1f}s fused={imgs_per_sec:.2f} img/s "
        f"lsd_host={lsd_s * 1000:.0f}ms/img ({det['segments'].shape[0]} segs)\n")

    print(json.dumps({
        "metric": "end_to_end_images_per_sec",
        "value": round(imgs_per_sec, 3),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_sec / REFERENCE_IMAGES_PER_SEC, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
