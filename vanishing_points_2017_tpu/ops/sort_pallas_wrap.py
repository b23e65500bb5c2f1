"""Batch plumbing for the Pallas bitonic sort (``sort_pallas``).

Platform fact (TPU v5e via axon, jax 0.9.0, measured): this lowering
path stages ALL pallas_call operands in VMEM wholesale — blocked
in_specs with a grid, ``memory_space=pltpu.ANY`` and manual in-kernel
DMA all produced the same 51 MB scoped-vmem OOM for a 16-image batch.
The operands of one call must therefore fit VMEM themselves. One
image's records (11 lanes x 64k = 2.9 MB) fit comfortably, so batching
is done OUTSIDE the kernel with ``jax.lax.map`` — a compiled sequential
loop over per-image pallas calls (the TPU has one core; grid programs
would serialize anyway).

``sort_records`` keeps the natural per-image signature and routes
``jax.vmap`` onto the lax.map loop through
``jax.custom_batching.custom_vmap``, so it composes with the
detector's per-image vmap pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .sort_pallas import sort_records_pallas


@functools.partial(jax.custom_batching.custom_vmap)
def sort_records(keys: jnp.ndarray, payload: jnp.ndarray):
    """Per-image API: keys (R,) i32 ascending, payload (L, R) carried.

    Composes with jax.vmap. TPU-compiled only — CPU/interpret callers
    should use the XLA fallback in the caller
    (``lines_device._component_stats``).
    """
    return sort_records_pallas(keys, payload)


@sort_records.def_vmap
def _sort_records_vmap(axis_size, in_batched, keys, payload):
    kb, pb = in_batched
    if not kb:
        keys = jnp.broadcast_to(keys, (axis_size,) + keys.shape)
    if not pb:
        payload = jnp.broadcast_to(payload, (axis_size,) + payload.shape)
    # barrier: without it XLA may fuse/rematerialize the (expensive)
    # record-producing prefix into every iteration of the map loop
    keys, payload = jax.lax.optimization_barrier((keys, payload))
    ks, ps = jax.lax.map(lambda args: sort_records_pallas(*args),
                         (keys, payload))
    return (ks, ps), (True, True)
