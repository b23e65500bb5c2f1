#!/usr/bin/env python3
"""Train the VP-grid CNN on synthetic Manhattan scenes.

Replaces the reference's Caffe training (``train/train_val.prototxt`` +
``train/solver.prototxt`` of fkluger/vanishing_points_2017; its LMDB
generation code is not public — SURVEY §2.3). Data is generated on the fly
by ``models/synth.py`` and rendered on device; the solver reproduces Caffe's
SGD schedule (base_lr 1e-4, x0.1 @200k, momentum 0.9, wd 5e-4, batch 5).

Checkpoints are written as ``.npz`` every ``--snapshot`` steps (Caffe
snapshots every 10k) to ``--out`` and can be passed to benchmark.py /
example.py via ``--weights``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400_000)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--base_lr", type=float, default=None,
                    help="override the solver base_lr (default 1e-4)")
    ap.add_argument("--lr_stepsize", type=int, default=None,
                    help="override the x0.1 decay step (default 200k)")
    ap.add_argument("--snapshot", type=int, default=10_000)
    ap.add_argument("--display", type=int, default=100)
    ap.add_argument("--out", default="assets/weights.npz")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--device", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mean_out", default="assets/mean.npy")
    ap.add_argument("--mean_samples", type=int, default=64)
    args = ap.parse_args()

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    import jax

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    from vanishing_points_2017_tpu import weights as wload
    from vanishing_points_2017_tpu.models import train

    if args.base_lr is not None:
        train.BASE_LR = args.base_lr
    if args.lr_stepsize is not None:
        train.LR_STEPSIZE = args.lr_stepsize

    rng_np = np.random.default_rng(args.seed)

    # estimate the training mean image (the reference subtracts a mean blob)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if os.path.isfile(args.mean_out):
        mean = np.load(args.mean_out)
    else:
        print("estimating mean image ...")
        imgs, _ = train.make_batch(rng_np, batch=args.mean_samples)
        mean = np.asarray(imgs[..., 0]).mean(axis=0).astype(np.float32)
        np.save(args.mean_out, mean)
    mean_j = None
    import jax.numpy as jnp
    mean_j = jnp.asarray(mean)

    state = train.init_state(jax.random.PRNGKey(args.seed))
    if args.resume:
        params, step0 = wload.params_from_npz(args.resume, with_step=True)
        state = train.TrainState(params=params,
                                 momentum=jax.tree.map(jnp.zeros_like, params),
                                 step=jnp.asarray(step0, jnp.int32))

    rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    running = []
    for step in range(int(state.step), args.steps):
        imgs, labels = train.make_batch(rng_np, batch=args.batch, mean=mean_j)
        state, loss = train.train_step(state, imgs, labels,
                                       jax.random.fold_in(rng, step))
        running.append(float(loss))
        if (step + 1) % args.display == 0:
            rate = args.display * args.batch / (time.time() - t0)
            print(f"step {step + 1}  loss {np.mean(running):.4f}  "
                  f"{rate:.1f} img/s  lr {float(train.learning_rate(state.step)):.2e}",
                  flush=True)
            running, t0 = [], time.time()
        if (step + 1) % args.snapshot == 0 or step + 1 == args.steps:
            wload.params_to_npz(state.params, args.out, step=step + 1)
            print(f"snapshot -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
