"""AOT export/reload of the fused pipeline (warm-start acceleration).

Tracing + compiling the vmapped fused pipeline costs ~65 s per process on
this platform even with the persistent compilation cache (the jit path's
cache key is not stable across processes for this program). A serialized
``jax.export`` artifact pins the StableHLO, making the compile cache hit:
measured warm start drops to ~20 s (deserialize ~0 s + cached compile).

Artifacts are keyed by (jax version, batch, pipeline config) and fall back
to the plain jit path on any mismatch.
"""

from __future__ import annotations

import os

import jax

from .compile_cache import DEFAULT_DIR


def _path(tag: str) -> str:
    d = os.environ.get("VP_TPU_COMPILE_CACHE", DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"aot_{tag}_{jax.__version__}.export")


def load_or_export(tag: str, fn, *example_args):
    """Return a callable for ``fn``: deserialized AOT artifact when present
    and compatible, else freshly exported (and persisted)."""
    from jax import export as jexport

    path = _path(tag)
    if os.path.isfile(path):
        try:
            exp = jexport.deserialize(open(path, "rb").read())
            exp.call(*example_args)  # shape/compat check + compile
            return exp.call
        except Exception:
            pass  # stale artifact: fall through and re-export
    exp = jexport.export(jax.jit(fn))(*example_args)
    try:
        with open(path, "wb") as fh:
            fh.write(exp.serialize())
    except Exception:
        pass  # persistence is best-effort
    return exp.call
