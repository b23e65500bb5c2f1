"""Directed tests of the EM's split and merge moves."""

import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.em import em as emod
from vanishing_points_2017_tpu.em import weights as wmod
from vanishing_points_2017_tpu.models import synth
from vanishing_points_2017_tpu.ops import lines as lineops
from vanishing_points_2017_tpu.ops import probability as prob


def segments_towards(rng, vp, count, anchor_box):
    """Segments through vp anchored inside a small box, so the family has a
    tight orientation spread (the split's angle clustering can separate it)."""
    lo, hi = anchor_box
    anchors = rng.uniform(lo, hi, size=(count, 2))
    target = vp[0:2] / vp[2]
    d = target[None, :] - anchors
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    half = rng.uniform(0.04, 0.12, size=(count, 1))
    return np.concatenate([anchors + half * d, anchors - half * d], axis=1)


def make_two_vp_lines(n_per=20, seed=0):
    """Two distinct VPs with orientation-separable line families."""
    rng = np.random.default_rng(seed)
    # chosen so the midpoint VP dehomogenizes inside (-1, 1) (the split's
    # in-image gate) while the two line families differ by ~70 deg
    vp_a = np.array([1.2, -0.1, 1.0]); vp_a /= np.linalg.norm(vp_a)   # right
    vp_b = np.array([-0.1, 1.2, 1.0]); vp_b /= np.linalg.norm(vp_b)   # up
    box = (np.array([-0.4, -0.4]), np.array([0.1, 0.1]))
    seg = np.concatenate([
        segments_towards(rng, vp_a, n_per, box),
        segments_towards(rng, vp_b, n_per, box)])
    return seg.astype(np.float32), vp_a, vp_b


def angle(u, v):
    return np.arccos(min(abs(float(np.dot(u, v))), 1.0))


def test_split_separates_two_vps():
    n_pad = 64
    seg, vp_a, vp_b = make_two_vp_lines()
    n = seg.shape[0]
    lp = np.zeros((n_pad, 4), np.float32); lp[:n] = seg
    l = np.zeros((n_pad, 3), np.float32)
    l[:n] = np.asarray(lineops.segments_to_homogeneous(jnp.asarray(seg)))
    l = np.asarray(lineops.normalize_rows(jnp.asarray(l)))
    lmask = np.arange(n_pad) < n
    lweight = lmask.astype(np.float32)
    langles = np.asarray(lineops.lines_angles(jnp.asarray(lp)))

    ms = 8
    # one alive VP midway between the two true VPs (inside the image)
    mid = (vp_a + vp_b) / 2; mid /= np.linalg.norm(mid)
    v_cur = np.zeros((ms, 3), np.float32); v_cur[0] = mid
    alive = np.zeros(ms, bool); alive[0] = True
    log_s = np.full(ms, np.log(1e-7), np.float32)
    # weight matrix: every valid line assigned to slot 0
    w = np.zeros((ms, n_pad), np.float32)
    w[0, :n] = 1.0

    cfg = emod.EMConfig(m_slots=ms)
    v2, ls2, alive2 = emod._split_best_vp(
        jnp.asarray(v_cur), jnp.asarray(log_s), jnp.asarray(alive),
        jnp.asarray(w), jnp.asarray(l), jnp.asarray(lp), jnp.asarray(lmask),
        jnp.asarray(lweight), jnp.asarray(langles),
        jnp.asarray(True), cfg)
    v2, ls2, alive2 = map(np.asarray, (v2, ls2, alive2))

    assert alive2.sum() == 2  # one VP became two
    got = v2[alive2]
    # each recovered VP matches one true VP within ~1 degree
    pairs = sorted([min(angle(g, vp_a), angle(g, vp_b)) for g in got])
    assert pairs[1] < 0.02, pairs
    # the split halves the variance (log s - log 2)
    new_ls = ls2[alive2]
    np.testing.assert_allclose(new_ls, np.log(1e-7) - np.log(2), atol=1e-5)


def test_merge_collapses_near_duplicates():
    n_pad = 64
    rng = np.random.default_rng(1)
    vp = np.array([0.4, 0.2, 1.0]); vp /= np.linalg.norm(vp)
    seg = synth.segments_for_vp(rng, vp, 30, noise=0.001).astype(np.float32)
    n = seg.shape[0]
    lp = np.zeros((n_pad, 4), np.float32); lp[:n] = seg
    l = np.zeros((n_pad, 3), np.float32)
    l[:n] = np.asarray(lineops.segments_to_homogeneous(jnp.asarray(seg)))
    l = np.asarray(lineops.normalize_rows(jnp.asarray(l)))
    lmask = np.arange(n_pad) < n
    lweight = lmask.astype(np.float32)
    lsim = np.zeros((n_pad, n_pad), np.float32)

    resp = synth.vp_grid_label(vp[None, :])
    pdfpar = prob.pdf_params(jnp.asarray(resp))

    ms = 8
    # two alive slots: the same VP slightly perturbed (angle ~ 2e-4 < thresh)
    v = np.zeros((ms, 3), np.float32)
    v[0] = vp
    v[1] = vp + np.array([2e-4, 0, 0]); v[1] /= np.linalg.norm(v[1])
    alive = np.zeros(ms, bool); alive[:2] = True
    log_s = np.full(ms, np.log(1e-8), np.float32)

    cfg = emod.EMConfig(m_slots=ms)
    v2, ls2, alive2 = emod._merge_vps(
        jnp.asarray(v), jnp.asarray(log_s), jnp.asarray(alive),
        1e-3, jnp.asarray(True), pdfpar, jnp.asarray(l), jnp.asarray(lp),
        jnp.asarray(lmask), jnp.asarray(lweight), jnp.asarray(lsim), cfg)
    v2, alive2 = np.asarray(v2), np.asarray(alive2)

    assert alive2.sum() == 1
    # the reference keeps slot k (the larger index of the pair)
    assert alive2[1] and not alive2[0]
    assert angle(v2[1], vp) < 0.01


def test_merge_respects_threshold():
    """Two clearly separated VPs must NOT merge."""
    n_pad = 32
    rng = np.random.default_rng(2)
    seg, vp_a, vp_b = make_two_vp_lines(n_per=10, seed=3)
    n = seg.shape[0]
    lp = np.zeros((n_pad, 4), np.float32); lp[:n] = seg
    l = np.zeros((n_pad, 3), np.float32)
    l[:n] = np.asarray(lineops.segments_to_homogeneous(jnp.asarray(seg)))
    l = np.asarray(lineops.normalize_rows(jnp.asarray(l)))
    lmask = np.arange(n_pad) < n
    lweight = lmask.astype(np.float32)
    lsim = np.zeros((n_pad, n_pad), np.float32)
    resp = synth.vp_grid_label(np.stack([vp_a, vp_b]))
    pdfpar = prob.pdf_params(jnp.asarray(resp))

    ms = 4
    v = np.zeros((ms, 3), np.float32)
    v[0], v[1] = vp_a, vp_b
    alive = np.zeros(ms, bool); alive[:2] = True
    log_s = np.full(ms, np.log(1e-8), np.float32)
    cfg = emod.EMConfig(m_slots=ms)
    _, _, alive2 = emod._merge_vps(
        jnp.asarray(v), jnp.asarray(log_s), jnp.asarray(alive),
        1e-3, jnp.asarray(True), pdfpar, jnp.asarray(l), jnp.asarray(lp),
        jnp.asarray(lmask), jnp.asarray(lweight), jnp.asarray(lsim), cfg)
    assert np.asarray(alive2).sum() == 2
