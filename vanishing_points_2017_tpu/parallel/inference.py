"""Mesh-sharded inference: the serving-scale path for the fused pipeline.

The reference scales evaluation by running more CPU processes over the
pickle bus (``evaluation.py:295-307`` of fkluger/vanishing_points_2017
supports [start:end) range slicing so several invocations can split a
dataset). The TPU-native equivalent is SPMD: the zero-host-round-trip
program (``pipeline.device_pipeline_full``) is already a ``vmap`` over
independent images, so sharding its batch axis over the mesh's ``dp``
axis partitions the whole program with NO collectives on the forward
path — XLA places each image's detect/render/CNN/EM/horizon on one
device and only the (tiny) result gather rides ICI. The CNN's fc6/fc7
weights can additionally be sharded over ``tp`` (see ``mesh.param_spec``),
which inserts one reduce-scatter/all-gather pair per image group.

Numerics are unchanged by dp sharding (each image's program is the same
single-device program), asserted by ``tests/test_sharding.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import PipelineConfig, device_pipeline_full
from .mesh import params_shardings, shard_params


def sharded_pipeline_full(mesh: Mesh, images: jnp.ndarray, params: Any,
                          mean: jnp.ndarray, cfg: PipelineConfig) -> dict:
    """Run the zero-host-round-trip pipeline dp-sharded over ``mesh``.

    images: (B, H, W) grayscale batch, B divisible by the dp axis size.
    params may be tp-sharded already (``mesh.shard_params``) or
    replicated host arrays — either way the jit is given explicit input
    shardings so XLA partitions rather than replicates the batch.
    Returns the same dict as ``device_pipeline_full``; leaves keep their
    dp sharding (readback gathers over ICI).
    """
    if images.shape[0] % mesh.shape["dp"]:
        raise ValueError(
            f"batch {images.shape[0]} not divisible by dp={mesh.shape['dp']}")
    img_s = NamedSharding(mesh, P("dp", None, None))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda im, p, mn: device_pipeline_full(im, p, mn, cfg=cfg),
        in_shardings=(img_s, params_shardings(params, mesh), repl),
    )
    # The detector's Pallas kernels (ccl_pallas, sort/group_stats) carry
    # no SPMD partitioning rules, so the GSPMD partitioner cannot split
    # them over dp — force the (identically-valued, fully partitionable)
    # XLA implementations for THIS trace only. Env is read at trace time
    # by the dispatch shims; cached executions never re-read it.
    import os
    saved = {k: os.environ.get(k) for k in ("VP_CCL_IMPL", "VP_SORT_IMPL")}
    os.environ["VP_CCL_IMPL"] = "xla"
    os.environ["VP_SORT_IMPL"] = "xla"
    try:
        return fn(jax.device_put(images, img_s), shard_params(params, mesh),
                  jax.device_put(jnp.asarray(mean), repl))
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
