"""Reference-contract compatibility layer + parity helpers."""

import pytest
import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.em import compat, horizon
from vanishing_points_2017_tpu.models import synth
from vanishing_points_2017_tpu.ops import probability as prob, sphere


def test_num_combo3_matches_binomial():
    import math
    for n in range(0, 25):
        want = math.comb(n, 3)
        assert horizon.num_combo3(n) == want, n


def test_vp_in_image():
    assert horizon.vp_in_image(np.array([0.5, 0.5, 1.0]))
    assert not horizon.vp_in_image(np.array([3.0, 0.0, 1.0]))
    assert horizon.vp_in_image(np.array([2.0, 2.0, 2.0]))  # dehomogenized


def test_vp_is_within_image_loose_bound():
    # probability_functions' variant uses +-2, not +-1
    v = jnp.asarray(np.array([1.5, 0.0, 1.0]))
    assert bool(prob.vp_is_within_image(v))
    assert not bool(prob.vp_is_within_image(jnp.asarray(
        np.array([2.5, 0.0, 1.0]))))


def test_pdf_grid_shapes():
    rng = np.random.default_rng(0)
    resp = rng.uniform(size=(20, 20)).astype(np.float32)
    out = prob.pdf_grid(jnp.asarray(resp), n=10)
    assert out["p"].shape == (10, 10)
    assert np.all(np.asarray(out["p"]) >= 0)


def test_calc_vp_line_triangles():
    vp = jnp.asarray(np.array([2.0, 0.0, 1.0], np.float32))
    lp = jnp.asarray(np.array([[0.0, 0.0, 1.0, 0.0],     # points at the VP
                               [0.0, 0.5, 0.0, -0.5]], np.float32))
    out = np.asarray(prob.calc_vp_line_triangles(vp, lp))
    assert out.shape == (2,)
    # first segment: a1 = dot((2,0),(1,0)) = 2 > 0 -> min(a1, a2) with
    # a2 = dot((1,0),(-1,0)) = -1 -> -1 (VP beyond the far endpoint)
    np.testing.assert_allclose(out[0], -1.0, atol=1e-6)


@pytest.mark.slow
def test_run_em_single_compact_contract():
    rng = np.random.default_rng(1)
    scene = synth.make_scene(rng, lines_per_vp=30, outliers=8)
    cnn = synth.vp_grid_label(scene.vps)
    n = scene.lines.shape[0]
    lpad = np.zeros((256, 3), np.float32)
    lpad[:n] = scene.lines
    img = np.asarray(sphere.sphere_image_uint8(
        jnp.asarray(lpad), jnp.asarray(np.arange(256) < n), size=500))

    out = compat.run_em_single(scene.lines, scene.segments, cnn, img)
    assert out["vp"] is not None
    m = out["vp"].shape[0]
    assert out["counts"].shape == (m,)
    assert out["counts_weighted"].shape == (m,)
    assert out["sigma"].shape == (m,)
    assert out["decision_metric"].shape[0] == m
    assert out["vp_assoc"].shape == (n,)
    # assoc indices are compact (in [-1, m))
    assert out["vp_assoc"].min() >= -1 and out["vp_assoc"].max() < m
    # counts ordering consistent: every assoc index has >= 1 count
    for k in range(m):
        assert (out["vp_assoc"] == k).sum() == out["counts"][k]


@pytest.mark.slow
def test_run_em_single_empty_contract():
    out = compat.run_em_single(np.zeros((0, 3)), np.zeros((0, 4)),
                               np.zeros((20, 20), np.float32),
                               np.zeros((500, 500), np.float32))
    assert out["vp"] is None and out["iterations"] == 0


def test_get_data_list_manifest(tmp_path):
    from vanishing_points_2017_tpu.data import datasets as dsets
    src = tmp_path / "src"
    src.mkdir()
    (src / "b.jpg").write_bytes(b"x")
    (src / "a.png").write_bytes(b"x")
    dest = tmp_path / "dst"
    dest.mkdir()
    d = dsets.get_data_list(str(src), str(dest), "default_net", update=True)
    assert d["name"] == "default_net_angle_weights_split_merge"
    assert [os.path.basename(f) for f in d["image_files"]] == ["a.png", "b.jpg"]
    # cached manifest reused
    d2 = dsets.get_data_list(str(src), str(dest), "default_net")
    assert d2 == d


import os  # noqa: E402


def test_segments_image():
    lp = jnp.asarray(np.array([[-0.5, 0.0, 0.5, 0.0]], np.float32))
    img = np.asarray(sphere.segments_image(lp, jnp.ones(1, bool), size=100))
    assert img.dtype == np.uint8
    # the horizontal segment lights the two middle rows (y=0 sits on the
    # row boundary, so each gets half coverage = 127)
    assert img[49:51, 30:70].max() >= 120
    assert img[10, :].max() == 0


@pytest.mark.slow
def test_run_em_single_distribution_key():
    """The reference returns 'distribution' = the final E-step PDF bundle
    (vp_localisation.py:442); verify shape/consistency of the compat port."""
    rng = np.random.default_rng(3)
    scene = synth.make_scene(rng, lines_per_vp=25, outliers=5)
    cnn = synth.vp_grid_label(scene.vps)
    n = scene.lines.shape[0]
    lpad = np.zeros((256, 3), np.float32)
    lpad[:n] = scene.lines
    img = np.asarray(sphere.sphere_image_uint8(
        jnp.asarray(lpad), jnp.asarray(np.arange(256) < n), size=500))
    out = compat.run_em_single(scene.lines, scene.segments, cnn, img)
    p = out["distribution"]
    assert p is not None
    m = out["vp"].shape[0]
    assert p.v.shape == (m,)
    assert p.lv.shape == (n, m)
    assert p.vl.shape == (m, n)
    assert p.l.shape == (n,)
    assert p.lvsq.shape == (n, m)
    assert p.angles.shape == (m, 2)
    assert np.all(p.l >= 1e-12 - 1e-18)  # evidence floor
    assert np.all((p.vl >= 0) & (p.vl <= 1 + 1e-6))
    # posterior columns over alive VPs sum to ~1 for well-explained lines
    col = p.vl.sum(axis=0)
    assert np.isfinite(col).all()


def test_run_em_single_empty_distribution_is_none():
    out = compat.run_em_single(np.zeros((0, 3)), np.zeros((0, 4)),
                               np.zeros((20, 20), np.float32),
                               np.zeros((500, 500), np.float32))
    assert out["distribution"] is None


def test_create_data_dict_single_shape():
    rng = np.random.default_rng(4)
    scene = synth.make_scene(rng, lines_per_vp=20, outliers=4)
    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    img = render_scene_image(scene, size=320)
    rgb = np.stack([img] * 3, axis=-1).astype(np.uint8)
    out = compat.create_data_dict_single(rgb, cnn_input_size=250)
    assert out["sphere_image"].shape == (250, 250)
    assert out["sphere_image"].dtype == np.uint8
    datum = out["lines"]
    assert datum["lines"].shape[1] == 3
    assert datum["line_segments"].shape[1] == 4
    assert datum["image_shape"] == (320, 320)
    # homogeneous lines pass through both endpoints
    seg = datum["line_segments"]
    l = datum["lines"]
    p1 = np.concatenate([seg[:, 0:2], np.ones((seg.shape[0], 1))], axis=1)
    np.testing.assert_allclose(np.abs(np.sum(l * p1, axis=1)), 0, atol=1e-9)


def test_save_cnn_result_roundtrip(tmp_path):
    import jax
    from vanishing_points_2017_tpu.models import cnn as cnn_mod
    rng = np.random.default_rng(5)
    scene = synth.make_scene(rng, lines_per_vp=15, outliers=2)
    datum = {"line_segments": scene.segments}
    params = cnn_mod.init_params(jax.random.PRNGKey(0), input_size=250)
    mean = np.zeros((250, 250), np.float32)
    path = compat.save_cnn_result(params, mean, datum,
                                  str(tmp_path / "img.jpg"),
                                  sphere_size=250, n_pad=128)
    assert path.endswith("img.cnn_result.npz")
    assert datum["prediction"].shape == (20, 20)
    back = np.load(path)
    np.testing.assert_array_equal(back["prediction"], datum["prediction"])

def test_renew_cnn_result():
    """renew_cnn_result (evaluation.py:357-361 of the reference) returns a
    fresh (sphere_image, prediction) pair from a raw line set."""
    import jax
    from vanishing_points_2017_tpu.models import cnn as cnn_mod

    rng = np.random.default_rng(6)
    scene = synth.make_scene(rng, lines_per_vp=15, outliers=2)
    seg = scene.segments
    p1 = np.concatenate([seg[:, 0:2], np.ones((seg.shape[0], 1))], axis=1)
    p2 = np.concatenate([seg[:, 2:4], np.ones((seg.shape[0], 1))], axis=1)
    lines = np.cross(p1, p2)
    params = cnn_mod.init_params(jax.random.PRNGKey(0), input_size=250)
    mean = np.zeros((250, 250), np.float32)
    img, pred = compat.renew_cnn_result(params, mean, lines, image_size=250)
    assert img.shape == (250, 250) and img.dtype == np.uint8
    assert pred.shape == (20, 20)
    assert np.isfinite(pred).all()
