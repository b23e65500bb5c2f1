"""End-to-end EM integration on synthetic Manhattan scenes."""

import pytest
import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.em import (EMConfig, expectation_maximisation,
                                          calculate_horizon_and_ortho_vp)
from vanishing_points_2017_tpu.models import synth
from vanishing_points_2017_tpu.ops import sphere


def build_inputs(seed=0, n_pad=256, lines_per_vp=35, outliers=10):
    rng = np.random.default_rng(seed)
    scene = synth.make_scene(rng, lines_per_vp=lines_per_vp,
                             outliers=outliers, noise=0.002)
    n = scene.segments.shape[0]
    assert n <= n_pad
    lp = np.zeros((n_pad, 4), np.float32)
    l = np.zeros((n_pad, 3), np.float32)
    lp[:n] = scene.segments
    l[:n] = scene.lines
    lmask = np.arange(n_pad) < n

    cnn = synth.vp_grid_label(scene.vps)  # idealized CNN output
    img = sphere.sphere_image_uint8(jnp.asarray(l), jnp.asarray(lmask),
                                    size=500).astype(jnp.float32)
    return scene, (jnp.asarray(l), jnp.asarray(lp), jnp.asarray(cnn), img,
                   jnp.asarray(lmask))


def angle_between(a, b):
    return np.arccos(min(abs(float(np.dot(a, b))), 1.0))


@pytest.mark.slow
def test_em_recovers_manhattan_vps():
    scene, (l, lp, cnn, img, lmask) = build_inputs(seed=1)
    cfg = EMConfig()
    res = expectation_maximisation(l, lp, cnn, img, lmask, cfg)
    assert bool(res.valid)
    alive = np.asarray(res.alive)
    vps = np.asarray(res.vp)[alive]
    counts = np.asarray(res.counts)[alive]
    assert vps.shape[0] >= 2

    # every true VP should be matched by some recovered VP within ~1.5 deg
    matched = 0
    for k in range(3):
        best = min(angle_between(scene.vps[k], v) for v in vps)
        if best < 0.03:
            matched += 1
    assert matched >= 2, (matched, vps, scene.vps)

    # counts are plausible: the best VPs dominate
    assert counts.max() >= 15


@pytest.mark.slow
def test_em_then_horizon_error_small():
    scene, (l, lp, cnn, img, lmask) = build_inputs(seed=2)
    res = expectation_maximisation(l, lp, cnn, img, lmask, EMConfig())
    assert bool(res.valid)
    hp1, hp2, *_ = calculate_horizon_and_ortho_vp(res.vp, res.counts, res.alive)
    th = scene.horizon
    tp1 = np.cross(th, [1, 0, 1]); tp1 = tp1 / tp1[2]
    tp2 = np.cross(th, [-1, 0, 1]); tp2 = tp2 / tp2[2]
    err = max(abs(float(hp1[1]) - tp1[1]), abs(float(hp2[1]) - tp2[1])) / 2
    assert err < 0.08, err


@pytest.mark.slow
def test_em_no_weights_mode():
    scene, (l, lp, cnn, img, lmask) = build_inputs(seed=3)
    res = expectation_maximisation(l, lp, cnn, img, lmask,
                                   EMConfig(use_weights=False))
    assert bool(res.valid)
    assert np.asarray(res.alive).sum() >= 1


@pytest.mark.slow
def test_em_no_split_no_merge():
    scene, (l, lp, cnn, img, lmask) = build_inputs(seed=4)
    res = expectation_maximisation(l, lp, cnn, img, lmask,
                                   EMConfig(do_split=False, do_merge=False))
    assert bool(res.valid)


@pytest.mark.slow
def test_em_empty_input():
    n_pad = 64
    l = jnp.zeros((n_pad, 3), jnp.float32)
    lp = jnp.zeros((n_pad, 4), jnp.float32)
    lmask = jnp.zeros(n_pad, bool)
    cnn = jnp.asarray(np.random.default_rng(0).uniform(
        size=(20, 20)).astype(np.float32))
    img = jnp.zeros((500, 500), jnp.float32)
    res = expectation_maximisation(l, lp, cnn, img, lmask, EMConfig())
    assert not bool(res.valid)


def test_em_area_measure_rejected():
    import pytest
    with pytest.raises(ValueError):
        EMConfig(distance_measure="area")


