"""Smoke test for the result-plotting port (matplotlib Agg, file output)."""

import os

import numpy as np
import pytest

from vanishing_points_2017_tpu.models import synth
from vanishing_points_2017_tpu.pipeline import Pipeline, PipelineConfig
from vanishing_points_2017_tpu.data.datasets import render_scene_image


@pytest.mark.slow
def test_show_em_result_writes_figure(tmp_path):
    pytest.importorskip("matplotlib")
    from vanishing_points_2017_tpu import viz

    rng = np.random.default_rng(0)
    scene = synth.make_scene(rng, lines_per_vp=20, outliers=4)
    img = render_scene_image(scene, size=320)
    pipe = Pipeline(cfg=PipelineConfig(sphere_size=240, n_pad=128))
    res = pipe.process(img)

    out = tmp_path / "result.png"
    viz.show_em_result(res, img, str(out), maxbest=3,
                       horizon=((0, 100), (320, 110)))
    assert out.is_file() and os.path.getsize(out) > 10_000
