"""Tracing, stage timing and structured logging.

The reference has no observability beyond two coarse ``time.time()`` spans
and scattered prints (SURVEY §5 of the fkluger/vanishing_points_2017
analysis). This subsystem provides:

* :class:`StageTimer` — named wall-clock spans with device synchronisation
  (a span around async-dispatched JAX work is meaningless without
  ``block_until_ready``), aggregated into a report.
* :func:`trace` — context manager wrapping ``jax.profiler.trace`` so a run
  can emit a TensorBoard/Perfetto trace directory when asked.
* :func:`get_logger` — stdlib logging with a consistent format; the drivers
  keep their reference-parity ``print`` lines and use this for diagnostics.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict


def get_logger(name: str = "vp_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class StageTimer:
    """Accumulating named wall-clock spans.

    >>> timer = StageTimer()
    >>> with timer.span("lsd"):
    ...     detect(...)
    >>> timer.report()
    {'lsd': {'total_s': ..., 'count': ..., 'mean_s': ...}}
    """

    def __init__(self, sync: bool = True):
        self._acc: dict[str, float] = defaultdict(float)
        self._cnt: dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def span(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None and self.sync:
                import jax
                jax.block_until_ready(block_on)
            self._acc[name] += time.perf_counter() - t0
            self._cnt[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self._acc[name] += seconds
        self._cnt[name] += 1

    def report(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self._cnt[k],
                    "mean_s": round(v / self._cnt[k], 4)}
                for k, v in sorted(self._acc.items())}

    def pretty(self) -> str:
        rows = [f"  {k:<24} {d['total_s']:>9.3f}s  x{d['count']:<5} "
                f"({d['mean_s'] * 1000:.1f} ms avg)"
                for k, d in self.report().items()]
        return "stage timings:\n" + "\n".join(rows) if rows else "no spans"


@contextlib.contextmanager
def trace(log_dir: str | None):
    """``jax.profiler`` trace when a directory is given, no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
