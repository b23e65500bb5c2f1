"""Per-stage result cache with skip-if-present semantics.

The reference's de-facto checkpoint/resume subsystem is pickle files merged
in place per stage (``evaluation.py:121-186, 254-329`` of
fkluger/vanishing_points_2017; SURVEY §5). Here each image gets one ``.npz``
per stage under a config-keyed directory (the reference encodes the EM
config into its output folder names — cache identity must depend on config,
``evaluation.py:60-67``). Stages are recomputed only when absent or when
``update=True``, so a crashed run resumes where it stopped.
"""

from __future__ import annotations

import os

import numpy as np


class StageCache:
    def __init__(self, root: str, config_key: str):
        self.dir = os.path.join(root, config_key)
        os.makedirs(self.dir, exist_ok=True)

    def path(self, image_name: str, stage: str) -> str:
        base = os.path.splitext(os.path.basename(image_name))[0]
        return os.path.join(self.dir, f"{base}.{stage}.npz")

    def has(self, image_name: str, stage: str) -> bool:
        return os.path.isfile(self.path(image_name, stage))

    def load(self, image_name: str, stage: str) -> dict:
        with np.load(self.path(image_name, stage), allow_pickle=False) as z:
            return dict(z)

    def save(self, image_name: str, stage: str, **arrays) -> None:
        tmp = self.path(image_name, stage) + ".tmp.npz"  # savez appends .npz
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, self.path(image_name, stage))
