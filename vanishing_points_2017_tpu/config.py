"""Global configuration: paths + default pipeline/EM settings.

The reference's ``config.py`` is six hard-coded path constants
(fkluger/vanishing_points_2017 ``config.py:1-9``). Here paths come from a
typed dataclass with environment-variable overrides, and the algorithmic
configuration is the frozen ``PipelineConfig``/``EMConfig`` (which also
define cache identity, preserving the reference's config-keyed caching).
"""

from __future__ import annotations

import dataclasses
import os

from .em import EMConfig  # noqa: F401  (re-export)
from .pipeline import PipelineConfig  # noqa: F401


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclasses.dataclass
class Paths:
    """Dataset + artifact locations (override via VP_TPU_* env vars)."""

    yud: str = dataclasses.field(
        default_factory=lambda: _env("VP_TPU_YUD", "/data/YUD"))
    ecd: str = dataclasses.field(
        default_factory=lambda: _env("VP_TPU_ECD", "/data/ECD"))
    hlw: str = dataclasses.field(
        default_factory=lambda: _env("VP_TPU_HLW", "/data/HLW"))
    result_dir: str = dataclasses.field(
        default_factory=lambda: _env("VP_TPU_RESULTS", "/tmp/vp_tpu"))
    weights: str = dataclasses.field(
        default_factory=lambda: _env(
            "VP_TPU_WEIGHTS",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "assets", "weights.npz")))
    mean: str = dataclasses.field(
        default_factory=lambda: _env(
            "VP_TPU_MEAN",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "assets", "mean.npy")))
