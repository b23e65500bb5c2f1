#!/usr/bin/env python3
"""Arbitrate the device-detector noise gates (TODO item 5b).

Sweeps (det_min_count, det_min_len_px, det_min_density) over two
protocols at once:

  * the reference's 3 bundled real photographs with an in-frame horizon
    (expected fractional rows extracted from its published result
    figures — same data as tests/test_real_photos.py), scoring the max
    horizon-row error per photo;
  * K rendered synthetic scenes with exact GT horizons, scoring
    AUC@0.25 (same protocol as scripts/eval_device_detector.py).

Goal: ONE default gate set whose worst real-photo error <= 0.05 and
whose synthetic AUC stays within 0.01 of the host-LSD path.

Usage: python scripts/sweep_detector_gates.py [--device cpu]
       [--count 20] [--size 640]
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_EXAMPLES = "/root/reference/assets/examples"
REFERENCE_HORIZONS = [
    ("ihme_zentrum.jpg", 0.7701, 0.7743),
    ("uni_hannover.jpg", 0.7458, 0.7336),
    ("uni_hannover_lichthof.jpg", 0.3889, 0.3877),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    ap.add_argument("--count", type=int, default=20)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=10)
    args = ap.parse_args()
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    import jax.numpy as jnp
    from vanishing_points_2017_tpu.data import datasets as dsets
    from vanishing_points_2017_tpu.metrics import calc_auc
    from vanishing_points_2017_tpu.models import synth
    from vanishing_points_2017_tpu.pipeline import (
        Pipeline, PipelineConfig, device_pipeline_full)
    from vanishing_points_2017_tpu import weights as wload

    params, mean = wload.load_params_and_mean(warn=False)

    # ---- real photos (host grayscale once)
    pipe0 = Pipeline(params=params, mean=mean, cfg=PipelineConfig())
    photos = []
    if os.path.isdir(REF_EXAMPLES):
        for name, rl, rr in REFERENCE_HORIZONS:
            host = pipe0.ingest_image(os.path.join(REF_EXAMPLES, name),
                                      target_size=args.size)
            photos.append((name, rl, rr, host["gray"], host["image_shape"]))

    # ---- synthetic scenes (render once; same protocol as
    # eval_device_detector.py)
    rng = np.random.default_rng(7)
    scenes, grays = [], []
    for _ in range(args.count):
        sc = synth.make_scene(rng, lines_per_vp=int(rng.integers(25, 60)),
                              outliers=int(rng.integers(5, 25)))
        img = dsets.render_scene_image(sc, size=args.size, rng=rng)
        g8 = np.clip(np.round(np.asarray(img)), 0, 255).astype(np.uint8)
        scenes.append(sc)
        grays.append(g8)

    def frac_rows(hp1, hp2, shape):
        h, w = shape
        s = max(h, w) / 2.0
        return ((h / 2.0 - float(hp1[1]) * s) / h,
                (h / 2.0 - float(hp2[1]) * s) / h)

    grid = [
        (15, 10.0, 0.0),   # current synthetic-tuned defaults
        (20, 20.0, 0.0),   # current real-photo recipe (over-prunes atrium)
        (15, 10.0, 0.5),
        (15, 10.0, 0.7),
        (15, 10.0, 0.8),
        (10, 10.0, 0.7),
        (20, 10.0, 0.7),
        (15, 15.0, 0.7),
        (20, 15.0, 0.7),
    ]
    print(f"{'cnt':>4} {'len':>5} {'dens':>5} | per-photo err -> worst | "
          "synthAUC")
    for cnt, ln, dens in grid:
        cfg = dataclasses.replace(PipelineConfig(), det_min_count=cnt,
                                  det_min_len_px=ln, det_min_density=dens)
        pipe = Pipeline(params=params, mean=mean, cfg=cfg)
        errs = []
        for name, rl, rr, g8, shape in photos:
            out = pipe.process_images([g8])
            ok = bool(np.asarray(out["em_valid"])[0])
            if not ok:
                errs.append(float("nan"))
                continue
            fl, fr = frac_rows(np.asarray(out["hp1"])[0],
                               np.asarray(out["hp2"])[0], shape)
            errs.append(max(abs(fl - rl), abs(fr - rr)))
        # synthetic AUC in batches
        serrs = []
        for i in range(0, len(grays), args.batch):
            chunk = grays[i:i + args.batch]
            while len(chunk) < args.batch:
                chunk = chunk + [chunk[-1]]
            imgs = jnp.asarray(np.stack(chunk))
            out = device_pipeline_full(imgs, params,
                                       jnp.asarray(mean), cfg)
            hp1 = np.asarray(out["hp1"])
            hp2 = np.asarray(out["hp2"])
            n = min(args.batch, len(grays) - i)
            for j in range(n):
                est = np.cross(hp1[j], hp2[j])
                serrs.append(dsets.normalized_horizon_error(
                    est, scenes[i + j].horizon.astype(np.float64),
                    width=args.size, height=args.size))
        auc, _ = calc_auc(np.asarray(serrs), 0.25)
        estr = " ".join(f"{e:5.3f}" for e in errs)
        worst = max(errs) if errs else float("nan")
        print(f"{cnt:>4} {ln:>5.1f} {dens:>5.2f} | {estr} -> {worst:5.3f} | "
              f"{auc:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
