"""Pallas renderer vs the XLA reference renderer (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.models import synth
from vanishing_points_2017_tpu.ops import sphere
from vanishing_points_2017_tpu.ops.sphere_pallas import sphere_render_pallas


def test_pallas_matches_xla_renderer():
    rng = np.random.default_rng(0)
    scene = synth.make_scene(rng, lines_per_vp=12, outliers=4)
    n_pad = 48
    l = np.zeros((n_pad, 3), np.float32)
    n = min(scene.lines.shape[0], n_pad)
    l[:n] = scene.lines[:n]
    mask = np.arange(n_pad) < n

    size = 120
    ref = np.asarray(sphere.sphere_render(jnp.asarray(l), jnp.asarray(mask),
                                          size=size))
    got = np.asarray(sphere_render_pallas(jnp.asarray(l), jnp.asarray(mask),
                                          size=size, tile_r=40,
                                          interpret=True))
    assert got.shape == ref.shape
    # the kernel's polynomial atan (Mosaic has no atan primitive) shifts
    # curve rows by <= ~0.002 px; intensity differs by up to ~1e-3
    np.testing.assert_allclose(got, ref, atol=3e-3)
    assert np.mean(np.abs(got - ref)) < 1e-4


def test_pallas_empty_mask_black():
    l = jnp.zeros((16, 3), jnp.float32)
    mask = jnp.zeros(16, bool)
    img = np.asarray(sphere_render_pallas(l, mask, size=80, tile_r=40,
                                          interpret=True))
    assert np.all(img == 0)
