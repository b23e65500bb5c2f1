#!/usr/bin/env python3
"""Example driver — run the full pipeline on the bundled example images.

Mirrors ``example.py`` of fkluger/vanishing_points_2017 (which processes 4
bundled photos and visualizes with ``--show``). The reference's photos are
its author's assets, so this repo bundles procedurally generated Manhattan
scenes instead (created on first run under ``assets/examples/``, with exact
ground-truth horizons saved alongside); ``--images <dir|files>`` runs the
driver on arbitrary photographs instead (e.g. the reference checkout's
``assets/examples``, whose published result figures these horizons land
on — BASELINE.md real-photo table). ``--show`` writes the 3-panel
visualizations to ``assets/results/``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.join(HERE, "assets", "examples")
RESULTS = os.path.join(HERE, "assets", "results")


def ensure_examples() -> list[str]:
    """Generate the bundled example images if absent (4 scenes, like the
    reference's 4 photos)."""
    os.makedirs(EXAMPLES, exist_ok=True)
    paths = sorted(p for p in os.listdir(EXAMPLES) if p.endswith(".png"))
    if len(paths) >= 4:
        return [os.path.join(EXAMPLES, p) for p in paths]

    from PIL import Image

    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    from vanishing_points_2017_tpu.models import synth

    rng = np.random.default_rng(2017)
    out = []
    for i in range(4):
        scene = synth.make_scene(rng, lines_per_vp=int(rng.integers(30, 55)),
                                 outliers=int(rng.integers(8, 20)))
        img = render_scene_image(scene, size=640, rng=rng)
        path = os.path.join(EXAMPLES, f"scene_{i}.png")
        Image.fromarray(img).save(path)
        np.save(os.path.join(EXAMPLES, f"scene_{i}.horizon.npy"),
                scene.horizon)
        out.append(path)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--device", default=None, help="JAX platform, e.g. cpu")
    ap.add_argument("--show", action="store_true",
                    help="write visualizations to assets/results/")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--mean", default=None)
    ap.add_argument("--images", nargs="*", default=None, metavar="PATH",
                    help="run on these image files (or all jpg/png in a "
                         "directory) instead of the bundled generated "
                         "scenes — e.g. the reference checkout's "
                         "assets/examples photos")
    ap.add_argument("--consensus", type=int, default=0, metavar="K",
                    help="K-member dropout-ensemble horizon (medoid pick); "
                         "0 = single EM, reference parity (em/consensus.py; "
                         "BASELINE.md round-5 consensus table)")
    args = ap.parse_args()

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    from vanishing_points_2017_tpu.data import io as dio
    from vanishing_points_2017_tpu.pipeline import Pipeline, PipelineConfig
    from vanishing_points_2017_tpu import weights as wload

    params, mean = wload.load_params_and_mean(args.weights, args.mean)
    pipe = Pipeline(params=params, mean=mean,
                    cfg=PipelineConfig(horizon_consensus=args.consensus))

    if args.images is not None:
        paths = []
        for p in args.images:
            if os.path.isdir(p):
                paths += sorted(
                    os.path.join(p, f) for f in os.listdir(p)
                    if f.lower().endswith((".jpg", ".jpeg", ".png")))
            else:
                paths.append(p)
        if not paths:
            ap.error("--images resolved to no jpg/jpeg/png files "
                     f"(got: {args.images!r})")
    else:
        paths = ensure_examples()

    os.makedirs(RESULTS, exist_ok=True)
    for path in paths:
        print("image file: ", path)
        image = dio.load_image(path)
        res = pipe.process(image, target_size=640)

        hp1, hp2 = res["hp1"].copy(), res["hp2"].copy()
        width, height = image.shape[1], image.shape[0]
        scale = 640.0 / max(width, height)
        width, height = width * scale, height * scale
        for hp in (hp1, hp2):
            hp[0] = hp[0] * 640 / 2.0 + width / 2.0
            hp[1] = -hp[1] * 640 / 2.0 + height / 2.0
        print(hp1)
        print(hp2)

        gt = os.path.splitext(path)[0] + ".horizon.npy"
        if os.path.isfile(gt):
            from vanishing_points_2017_tpu.data.datasets import (
                normalized_horizon_error)
            err = normalized_horizon_error(
                np.cross(res["hp1"], res["hp2"]), np.load(gt),
                int(width), int(height))
            print(f"horizon error vs ground truth: {err:.4f}")

        if args.show:
            from vanishing_points_2017_tpu import viz
            small = dio.resize_max(image, 640)
            out_png = os.path.join(
                RESULTS,
                os.path.splitext(os.path.basename(path))[0] + ".result.png")
            viz.show_em_result(res, small, out_png, maxbest=3,
                               horizon=(hp1, hp2))
            print("wrote", out_png)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
