"""Render fidelity vs the reference's actual rasterizer.

SURVEY hard-part 2: the reference rasterizes sphere images with matplotlib
Agg; this framework renders analytically. This test rasterizes the same
lines the reference way (10000-sample polylines, alpha 0.1, 100 dpi,
white-on-black, channel-mean) with the real Agg backend and checks the
analytic render agrees at the distribution level (the parity target is
downstream AUC, not pixels)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vanishing_points_2017_tpu.models import synth
from vanishing_points_2017_tpu.ops import sphere


def agg_render(lines, size=500, alpha=0.1):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    a = np.linspace(-np.pi / 2, np.pi / 2, 10000)
    fig = plt.figure(figsize=(size / 100.0, size / 100.0), dpi=100)
    ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
    ax.axis([-np.pi / 2, np.pi / 2, -np.pi / 2, np.pi / 2])
    fig.add_axes(ax)
    ax.set_facecolor((0, 0, 0))
    ax.set_xticks([])
    ax.set_yticks([])
    for i in range(lines.shape[0]):
        b = np.arctan((-lines[i, 0] * np.sin(a) - lines[i, 2] * np.cos(a))
                      / lines[i, 1])
        # lw=1.0 pt: matplotlib 1.5 (the reference's pin) default; modern
        # matplotlib defaults to 1.5 pt
        ax.plot(a, b, "-", c=(1, 1, 1, alpha), lw=1.0)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
    plt.close(fig)
    return buf.mean(axis=2)


def test_analytic_render_matches_agg():
    rng = np.random.default_rng(0)
    scene = synth.make_scene(rng, lines_per_vp=25, outliers=8)
    l = scene.lines.astype(np.float32)
    n = l.shape[0]

    agg = agg_render(l, 500)
    ours = np.asarray(sphere.sphere_render(
        jnp.asarray(l), jnp.ones(n, bool), size=500)) * 255.0

    corr = np.corrcoef(ours.ravel(), agg.ravel())[0, 1]
    assert corr > 0.98, corr
    assert np.abs(ours - agg).mean() < 1.0
    # brightness scale: the VP hot spots reach the same intensity
    assert abs(float(ours.max()) - float(agg.max())) < 10
