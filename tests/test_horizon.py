import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.em import calculate_horizon_and_ortho_vp
from vanishing_points_2017_tpu.models import synth


def pad_slots(vps, counts, m_slots=40):
    ms = m_slots
    v = np.zeros((ms, 3), np.float32)
    c = np.zeros(ms, np.float32)
    a = np.zeros(ms, bool)
    v[:vps.shape[0]] = vps
    c[:vps.shape[0]] = counts
    a[:vps.shape[0]] = True
    return jnp.asarray(v), jnp.asarray(c), jnp.asarray(a)


def test_manhattan_triplet_recovers_horizon():
    rng = np.random.default_rng(0)
    scene = synth.make_scene(rng, lines_per_vp=30, outliers=0)
    counts = np.array([30.0, 28.0, 25.0])
    v, c, a = pad_slots(scene.vps, counts)
    hp1, hp2, z_vp, h1, h2, combo = calculate_horizon_and_ortho_vp(v, c, a)
    hp1, hp2 = np.asarray(hp1), np.asarray(hp2)

    # ground-truth horizon sampled at x = +-1
    th = scene.horizon
    tp1 = np.cross(th, [1, 0, 1]); tp1 = tp1 / tp1[2]
    tp2 = np.cross(th, [-1, 0, 1]); tp2 = tp2 / tp2[2]
    err = max(abs(hp1[1] - tp1[1]), abs(hp2[1] - tp2[1])) / 2
    assert err < 0.05, err

    # zenith must be the max-|y| VP
    zi = np.argmax(np.abs(scene.vps[:, 1]))
    np.testing.assert_allclose(np.asarray(z_vp), scene.vps[zi], atol=1e-5)


def test_two_vp_fallback():
    vps = np.array([[0.5, 0.1, 1.0], [-0.7, 0.12, 1.0]], np.float32)
    vps /= np.linalg.norm(vps, axis=1, keepdims=True)
    v, c, a = pad_slots(vps, np.array([10.0, 8.0]))
    hp1, hp2, z_vp, h1, h2, combo = calculate_horizon_and_ortho_vp(v, c, a)
    # horizon through the two raw VPs
    want = np.cross(vps[0], vps[1])
    got1 = np.asarray(hp1)
    assert abs(np.dot(want, got1)) < 1e-4  # hp1 lies on cross(vp0, vp1)
    np.testing.assert_allclose(np.asarray(z_vp), [0, 1, 0], atol=1e-6)


def test_one_vp_fallback_default_horizon():
    vps = np.array([[0.5, 0.1, 1.0]], np.float32)
    vps /= np.linalg.norm(vps, axis=1, keepdims=True)
    v, c, a = pad_slots(vps, np.array([10.0]))
    hp1, hp2, *_ = calculate_horizon_and_ortho_vp(v, c, a)
    # default horizon y = 0
    assert abs(np.asarray(hp1)[1]) < 1e-6
    assert abs(np.asarray(hp2)[1]) < 1e-6


def test_zero_vp_fallback():
    v = jnp.zeros((40, 3), jnp.float32)
    c = jnp.zeros(40, jnp.float32)
    a = jnp.zeros(40, bool)
    hp1, hp2, z_vp, h1, h2, combo = calculate_horizon_and_ortho_vp(v, c, a)
    assert abs(np.asarray(hp1)[1]) < 1e-6
    np.testing.assert_allclose(np.asarray(h1), [-1, 0, 0], atol=1e-6)


def test_gates_all_fail_uses_first_triplet():
    # three VPs that violate the zenith gate (no zenith candidate):
    # score stays 0 everywhere -> first triplet's horizon returned
    vps = np.array([[0.9, 0.1, 0.3], [-0.8, 0.05, 0.5], [0.1, 0.2, 0.95]],
                   np.float32)
    vps /= np.linalg.norm(vps, axis=1, keepdims=True)
    assert np.all(np.abs(vps[:, 1]) < np.sin(np.pi / 4))  # no zenith cand.
    v, c, a = pad_slots(vps, np.array([30.0, 20.0, 10.0]))
    hp1, hp2, z_vp, h1, h2, combo = calculate_horizon_and_ortho_vp(v, c, a)
    # the returned horizon is finite and derived from triplet (0, 1, 2)
    assert np.all(np.isfinite(np.asarray(hp1)))
    assert set(np.asarray(combo).tolist()) == {0, 1, 2}


def _near_ideal_zenith_vps():
    """4 VPs staging the ihme failure mode (BASELINE.md round 4):

    * Z — the STRONG zenith, nearly at infinity (|y/z| = 10 half-frames:
      near-parallel verticals on a telephoto facade) with high counts;
      its horizon VPs v1/v2 sit ABOVE the image centre, so the
      reference's ``zenithPos*horPos==1`` side gate (calc_horizon.py:
      174-183) rejects the {Z, v1, v2} triplet.
    * zj — a junk zenith candidate (|y/z| = 1.6, well-conditioned side
      information) with tiny counts whose triplet {zj, v1, v2} passes
      every gate.
    """
    vps = np.array([
        [0.05, 0.99, 0.099],   # Z: strong near-ideal zenith (y/z = 10)
        [3.0, 0.2, 1.0],       # v1: horizon VP, above centre, off-image
        [-2.5, 0.18, 1.0],     # v2: horizon VP, above centre, off-image
        [0.3, -0.8, 0.5],      # zj: junk zenith, side gate satisfied
    ], np.float32)
    vps /= np.linalg.norm(vps, axis=1, keepdims=True)
    counts = np.array([60.0, 50.0, 40.0, 5.0])
    return vps, counts


def test_pos_gate_reference_behavior_rejects_strong_zenith():
    """tol=inf (exact reference gating): the side gate kills every
    triplet containing the strong near-ideal zenith, so the junk
    triplet's tiny counts win — the failure mode measured on the
    reference's bundled ihme photo (horizon err 0.45)."""
    vps, counts = _near_ideal_zenith_vps()
    v, c, a = pad_slots(vps, counts)
    *_, z_vp, h1, h2, combo = calculate_horizon_and_ortho_vp(v, c, a)
    np.testing.assert_allclose(np.asarray(z_vp), vps[3], atol=1e-5)
    assert 3 in np.asarray(combo).tolist()


def test_pos_gate_ideal_tol_waives_side_check():
    """tol=8 (production default): |y| > 8|z| waives the side check for
    the strong zenith only — its triplet outscores the junk one on
    counts, and the horizon lands at the strong zenith's perpendicular."""
    vps, counts = _near_ideal_zenith_vps()
    v, c, a = pad_slots(vps, counts)
    hp1, hp2, z_vp, h_vp1, h_vp2, combo = calculate_horizon_and_ortho_vp(
        v, c, a, pos_gate_ideal_tol=8.0)
    np.testing.assert_allclose(np.asarray(z_vp), vps[0], atol=1e-5)
    assert set(np.asarray(combo).tolist()) == {0, 1, 2}
    # the waiver is zenith-conditioned, not a global gate removal: the
    # junk zenith (y/z = 1.6 < 8) still had its side gate applied and
    # passed it — only relative scores changed the winner
    hp1, hp2 = np.asarray(hp1), np.asarray(hp2)
    # horizon ~ at the horizon VPs' height (y ~ +0.19), perpendicular to Z
    assert 0.1 < (hp1[1] + hp2[1]) / 2 < 0.3


def test_pos_gate_tol_exact_vertical_zenith():
    """A zenith exactly at infinity (z == 0) must be waived at any
    finite tol (|y| > tol*0) and must NOT be waived at tol=inf
    (inf*0 = NaN compares False — the reference's always-apply gate)."""
    vps, counts = _near_ideal_zenith_vps()
    vps[0] = [0.0, 1.0, 0.0]
    v, c, a = pad_slots(vps, counts)
    *_, z_inf, _h1, _h2, combo_inf = calculate_horizon_and_ortho_vp(v, c, a)
    np.testing.assert_allclose(np.asarray(z_inf), vps[3], atol=1e-5)
    *_, z_tol, _h1, _h2, combo_tol = calculate_horizon_and_ortho_vp(
        v, c, a, pos_gate_ideal_tol=8.0)
    np.testing.assert_allclose(np.asarray(z_tol), vps[0], atol=1e-5)


def test_two_vp_fallback_with_dead_leading_slots():
    # alive VPs in slots 3 and 7 (leading slots dead): the fallback must use
    # the first ALIVE slots, not raw rows 0/1 (which are zero vectors)
    ms = 10
    v = np.zeros((ms, 3), np.float32)
    c = np.zeros(ms, np.float32)
    a = np.zeros(ms, bool)
    vps = np.array([[0.5, 0.1, 1.0], [-0.7, 0.12, 1.0]], np.float32)
    vps /= np.linalg.norm(vps, axis=1, keepdims=True)
    v[3], v[7] = vps[0], vps[1]
    c[3], c[7] = 10.0, 8.0
    a[3] = a[7] = True
    hp1, hp2, z_vp, h1, h2, combo = calculate_horizon_and_ortho_vp(
        jnp.asarray(v), jnp.asarray(c), jnp.asarray(a))
    assert np.isfinite(np.asarray(hp1)).all()
    assert np.isfinite(np.asarray(hp2)).all()
    want = np.cross(vps[0], vps[1])
    assert abs(np.dot(want, np.asarray(hp1))) < 1e-4


def test_triplet_score_margin_probe():
    """triplet_score_margin must agree with the estimator on s1's winner
    family and report sane sensitivity numbers: a dominant orthogonal
    triplet has rel_margin near 1 against a weak contender; adding an
    equal-score duplicate of the winner collapses the margin to ~0 with
    ~0 disagreement (a benign near-duplicate, not a knife edge)."""
    from vanishing_points_2017_tpu.em.horizon import triplet_score_margin

    vps = np.array([[1.0, -0.05, 0.001], [0.0, 1.0, 0.001],
                    [-0.02, -0.05, 0.9]], np.float32)
    vps /= np.linalg.norm(vps, axis=1, keepdims=True)
    counts = np.array([50.0, 60.0, 40.0], np.float32)
    v, c, a = pad_slots(vps, counts)
    s1, s2, rel, dis = triplet_score_margin(v, c, a)
    assert float(s1) > 0
    assert float(s2) == -2.0  # only one valid triplet exists
    assert float(rel) == 1.0  # (s1 - max(s2,0)) / s1
    assert float(dis) == 0.0  # runner-up invalid -> no disagreement

    # duplicate the third VP with equal counts: two triplets tie to f32
    vps2 = np.vstack([vps, vps[2] + np.array([1e-4, 0, 0], np.float32)])
    counts2 = np.array([50.0, 60.0, 40.0, 40.0], np.float32)
    v, c, a = pad_slots(vps2, counts2)
    s1, s2, rel, dis = triplet_score_margin(v, c, a)
    assert float(s2) > 0
    assert float(rel) < 0.01       # near-tie in score ...
    assert float(dis) < 0.01       # ... but the horizons agree: benign
