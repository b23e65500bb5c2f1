"""CNN training: sigmoid cross-entropy + Caffe-parity SGD, mesh-shardable.

Replaces the reference's Caffe solver (``train/solver.prototxt`` of
fkluger/vanishing_points_2017): plain SGD, base_lr 1e-4, step decay x0.1
every 200k iters, momentum 0.9, weight decay 5e-4, and Caffe's per-blob
multipliers (biases: 2x learning rate, no weight decay — ``lr_mult: 2 /
decay_mult: 0`` on every bias blob in ``train_val.prototxt``).

Caffe SGD update (reproduced exactly):

    V <- momentum * V - local_lr * (grad + local_wd * theta)
    theta <- theta + V

The train step is a single jitted function; under a ``jax.sharding.Mesh``
the batch is sharded over the ``dp`` axis and the wide fc6/fc7 weights over
the ``tp`` axis (see ``parallel/mesh.py``) — gradients synchronise through
the collectives XLA inserts for the sharded matmuls, no manual psum needed.

Training data: the reference's 489,600-example LMDB corpus is not in its
repo; ``models/synth.py`` + ``ops/sphere.py`` regenerate equivalent
(sphere image, 20x20 grid) pairs on the fly.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from . import cnn

BASE_LR = 1e-4
LR_GAMMA = 0.1
LR_STEPSIZE = 200_000
MOMENTUM = 0.9
WEIGHT_DECAY = 5e-4


class TrainState(NamedTuple):
    params: Any
    momentum: Any
    step: jnp.ndarray


def init_state(rng: jax.Array, input_size: int = cnn.INPUT_SIZE) -> TrainState:
    params = cnn.init_params(rng, input_size=input_size)
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(params=params, momentum=zeros,
                      step=jnp.zeros((), jnp.int32))


def learning_rate(step: jnp.ndarray) -> jnp.ndarray:
    """Caffe "step" policy: base_lr * gamma^floor(step / stepsize)."""
    return BASE_LR * LR_GAMMA ** jnp.floor(step / LR_STEPSIZE)


def sigmoid_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Caffe SigmoidCrossEntropyLoss: summed over the grid, averaged over
    the batch (``train_val.prototxt:411-417``)."""
    per = jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(per) / logits.shape[0]


def _is_bias(path) -> bool:
    return any(getattr(p, "key", None) == "b" for p in path)


@functools.partial(jax.jit, donate_argnums=(0,))
def train_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray,
               rng: jax.Array) -> tuple[TrainState, jnp.ndarray]:
    """One Caffe-SGD step. images: (B, 500, 500, 1) mean-subtracted;
    labels: (B, 20, 20) in [0, 1]."""

    def loss_fn(params):
        logits = cnn.forward(params, images, train=True, rng=rng,
                             compute_dtype=jnp.bfloat16, logits=True)
        return sigmoid_xent(logits, labels)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    lr = learning_rate(state.step)

    def update(path, p, g, v):
        if _is_bias(path):
            local_lr, local_wd = 2.0 * lr, 0.0
        else:
            local_lr, local_wd = lr, WEIGHT_DECAY
        v_new = MOMENTUM * v - local_lr * (g + local_wd * p)
        return p + v_new, v_new

    flat = jax.tree_util.tree_map_with_path(
        update, state.params, grads, state.momentum)
    params = jax.tree.map(lambda t: t[0], flat,
                          is_leaf=lambda t: isinstance(t, tuple))
    momentum = jax.tree.map(lambda t: t[1], flat,
                            is_leaf=lambda t: isinstance(t, tuple))
    return TrainState(params=params, momentum=momentum,
                      step=state.step + 1), loss


def make_batch(rng_np, batch: int, mean: jnp.ndarray | None = None,
               n_pad: int = 512, size: int = cnn.INPUT_SIZE):
    """Host-side synthetic batch: (images (B,S,S,1), labels (B,20,20)).

    Renders the sphere images on device via the batched renderer.
    """
    import numpy as np

    from . import synth
    from ..ops import sphere as sph

    ls, masks, labels = [], [], []
    for _ in range(batch):
        scene = synth.make_training_scene(rng_np)
        n = min(scene.lines.shape[0], n_pad)
        l = np.zeros((n_pad, 3), np.float32)
        l[:n] = scene.lines[:n]
        ls.append(l)
        masks.append(np.arange(n_pad) < n)
        labels.append(synth.vp_grid_label(scene.vps))
    l = jnp.asarray(np.stack(ls))
    m = jnp.asarray(np.stack(masks))
    render = jax.vmap(lambda a, b: sph.sphere_render(a, b, size=size))
    imgs = jnp.floor(render(l, m) * 255.0)
    if mean is not None:
        imgs = imgs - mean[None]
    return imgs[..., None], jnp.asarray(np.stack(labels))
