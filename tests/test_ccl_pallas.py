"""Batched Pallas raster CCL (ops/ccl_pallas.py) vs the XLA scan
(lines_device._connected_components), interpret mode — must be
bit-exact: both implement the same min-label lattice pass."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vanishing_points_2017_tpu.models import synth
from vanishing_points_2017_tpu.data.datasets import render_scene_image
from vanishing_points_2017_tpu.ops import lines_device as ld
from vanishing_points_2017_tpu.ops.ccl_pallas import (
    connected_components_pallas_batch)


def _front(img):
    im = ld._gaussian_blur(img, 1.0)
    com1 = im[1:, 1:] - im[:-1, :-1]
    com2 = im[:-1, 1:] - im[1:, :-1]
    gx, gy = 0.5 * (com1 + com2), 0.5 * (com1 - com2)
    mag = jnp.sqrt(gx * gx + gy * gy)
    tol = math.radians(ld.TOL_DEG)
    active = mag > ld.QUANT / math.sin(tol)
    inv = jnp.where(mag > 0, 1.0 / jnp.maximum(mag, 1e-12), 0.0)
    return active, gx * inv, -gy * inv


@pytest.mark.slow
@pytest.mark.parametrize("size,passes", [(256, 8), (192, 4)])
def test_ccl_pallas_matches_xla(size, passes):
    cos_tol = math.cos(math.radians(ld.TOL_DEG))
    rng = np.random.default_rng(size + passes)
    acts, uxs, uys, refs = [], [], [], []
    for _ in range(3):
        scene = synth.make_scene(rng, lines_per_vp=12, outliers=4)
        img = jnp.asarray(render_scene_image(scene, size=size, rng=rng)
                          .astype(np.float32))
        active, ux, uy = _front(img)
        refs.append(np.asarray(
            ld._connected_components(active, ux, uy, cos_tol, passes)))
        acts.append(np.asarray(active))
        uxs.append(np.asarray(ux))
        uys.append(np.asarray(uy))

    got = np.asarray(connected_components_pallas_batch(
        jnp.asarray(np.stack(acts)), jnp.asarray(np.stack(uxs)),
        jnp.asarray(np.stack(uys)), cos_tol, passes=passes, interpret=True))
    for s in range(3):
        assert np.array_equal(got[s], refs[s]), \
            f"scene {s}: {(got[s] != refs[s]).sum()} labels diverge"


def test_ccl_dispatch_vmap_cpu_path():
    """The dispatch wrapper under jax.vmap on CPU must equal per-image
    XLA results (the TPU branch is covered by the interpret test)."""
    cos_tol = math.cos(math.radians(ld.TOL_DEG))
    rng = np.random.default_rng(0)
    scene = synth.make_scene(rng, lines_per_vp=10, outliers=3)
    imgs = np.stack([
        render_scene_image(scene, size=128, rng=rng).astype(np.float32)
        for _ in range(2)])
    fronts = [_front(jnp.asarray(im)) for im in imgs]
    a = jnp.stack([f[0] for f in fronts])
    x = jnp.stack([f[1] for f in fronts])
    y = jnp.stack([f[2] for f in fronts])
    got = jax.vmap(lambda aa, xx, yy: ld._ccl_dispatch(
        aa, xx, yy, cos_tol, 4))(a, x, y)
    for i in range(2):
        ref = ld._connected_components(a[i], x[i], y[i], cos_tol, 4)
        assert np.array_equal(np.asarray(got[i]), np.asarray(ref))
