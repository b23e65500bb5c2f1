import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.em import init_vps, weights as wmod, cluster


def test_find_maxima_edge_quirk():
    # interior strict maxima detected; reference's a-1 > 0 quirk means a cell
    # at column 1 compares its left neighbour as 0, not grid[., 0]
    r = np.zeros((6, 6), np.float32)
    r[3, 3] = 1.0           # interior max
    r[0, 1] = 0.5           # column-1 cell; left neighbour treated as 0
    r[0, 0] = 0.9           # actually larger, but invisible to (0, 1)
    got = np.asarray(init_vps.find_maxima(jnp.asarray(r)))
    assert got[3, 3]
    assert got[0, 1]  # quirk: wins despite the larger (0, 0) neighbour


def test_find_maxima_against_naive():
    rng = np.random.default_rng(0)
    r = rng.uniform(size=(20, 20)).astype(np.float32)
    got = np.asarray(init_vps.find_maxima(jnp.asarray(r)))
    B, A = r.shape
    for b in range(B):
        for a in range(A):
            vm = r[b, a]
            vu = r[b, a + 1] if a + 1 < A else 0
            vd = r[b, a - 1] if a - 1 > 0 else 0
            vl = r[b - 1, a] if b - 1 > 0 else 0
            vr = r[b + 1, a] if b + 1 < B else 0
            want = vm > vu and vm > vd and vm > vl and vm > vr
            assert got[b, a] == want, (b, a)


def test_find_initial_vps_recovers_peak():
    # CNN grid with one maximum; sphere image with a bright pixel inside the
    # matching 25x25 patch -> VP at that pixel's angle
    cnn = np.zeros((20, 20), np.float32)
    cnn[12, 7] = 1.0
    sphere_flipped = np.zeros((500, 500), np.float32)
    # flipped sphere row = beta index; cell (12, 7) covers rows 300..324,
    # cols 175..199; put the peak at (310, 180)
    sphere_flipped[310, 180] = 200.0
    sphere = sphere_flipped[::-1, :].copy()  # module flips it back internally
    v0, alive = init_vps.find_initial_vps(
        jnp.asarray(sphere), jnp.asarray(cnn), num_max=25, m_slots=8)
    v0, alive = np.asarray(v0), np.asarray(alive)
    assert alive.sum() == 1
    from vanishing_points_2017_tpu.ops import coords
    want_angle = np.asarray(coords.index_to_angle(
        jnp.asarray([180.0, 310.0]), (500, 500)))
    want = np.asarray(coords.angle_to_point(jnp.asarray(want_angle)))
    np.testing.assert_allclose(v0[0], want, atol=1e-5)


def test_weight_matrix_against_naive():
    rng = np.random.default_rng(1)
    m, n = 4, 12
    p_vl = rng.uniform(size=(m, n)).astype(np.float32)
    lweight = rng.uniform(size=n).astype(np.float32)
    lsim = rng.uniform(size=(n, n)).astype(np.float32)
    lsim = (lsim + lsim.T) / 2
    np.fill_diagonal(lsim, 0)
    bias = 1.0
    got = np.asarray(wmod.weight_matrix(jnp.asarray(p_vl),
                                        jnp.asarray(lweight),
                                        jnp.asarray(lsim), bias=bias))
    for mi in range(m):
        w_ = p_vl[mi] * lweight
        for k in range(n):
            want = (w_[k] + bias * lweight[k] * np.dot(w_, lsim[:, k])) / \
                (1 + bias * lweight[k] * np.sum(lsim[:, k]))
            np.testing.assert_allclose(got[mi, k], want, rtol=2e-4)


def test_calc_new_vanishing_point_orthogonal_to_lines():
    # lines through a common VP -> recovered VP is (anti)parallel to truth
    rng = np.random.default_rng(2)
    vp_true = np.array([0.4, 0.3, 1.0])
    vp_true /= np.linalg.norm(vp_true)
    from vanishing_points_2017_tpu.models import synth
    seg = synth.segments_for_vp(rng, vp_true, 30, noise=0.0)
    l = synth.segments_to_lines(seg)
    l /= np.linalg.norm(l, axis=1, keepdims=True)
    w = rng.uniform(0.5, 1.0, size=30).astype(np.float32)
    vp, ok = wmod.calc_new_vanishing_point(jnp.asarray(l.astype(np.float32)),
                                           jnp.asarray(w))
    assert bool(ok)
    assert abs(np.dot(np.asarray(vp), vp_true)) > 0.9999


def test_calc_new_vanishing_point_zero_weights_invalid():
    l = jnp.asarray(np.eye(3, dtype=np.float32))
    _, ok = wmod.calc_new_vanishing_point(l, jnp.zeros(3))
    assert not bool(ok)


def test_calc_vp_line_counts_outlier_rejection():
    rng = np.random.default_rng(3)
    from vanishing_points_2017_tpu.models import synth
    vp_true = np.array([0.2, -0.1, 1.0])
    vp_true /= np.linalg.norm(vp_true)
    seg_in = synth.segments_for_vp(rng, vp_true, 20, noise=0.0)
    seg_out = synth.random_outliers(rng, 5)
    seg = np.concatenate([seg_in, seg_out]).astype(np.float32)
    l = synth.segments_to_lines(seg)
    l /= np.linalg.norm(l, axis=1, keepdims=True)
    ms = 4
    vp = np.zeros((ms, 3), np.float32)
    vp[0] = vp_true
    alive = np.array([True, False, False, False])
    lmask = np.ones(25, bool)
    log_s = np.full(ms, np.log(1e-8), np.float32)
    dm = np.zeros((ms, 25), np.float32)
    dm[0, :] = 1.0  # everything associated to slot 0
    lweight = np.ones(25, np.float32)
    counts, cw, assoc = wmod.calc_vp_line_counts(
        jnp.asarray(vp), jnp.asarray(alive), jnp.asarray(l.astype(np.float32)),
        jnp.asarray(seg), jnp.asarray(lmask), jnp.asarray(log_s),
        jnp.asarray(dm), jnp.asarray(lweight), "angle", thresh=1.96 ** 2)
    counts, assoc = np.asarray(counts), np.asarray(assoc)
    # the 20 exact inliers stay, most random outliers are rejected
    assert counts[0] >= 20
    assert np.all(assoc[:20] == 0)
    assert counts[0] <= 23


def test_agglomerative_two_separates_blobs():
    # distances from two tight groups -> clean 2-clustering
    n = 12
    pos = np.concatenate([np.zeros(6), np.ones(6) * 10.0])
    d = np.abs(pos[:, None] - pos[None, :]).astype(np.float32)
    d += np.random.default_rng(4).uniform(0, 0.01, size=(n, n))
    d = (d + d.T) / 2
    np.fill_diagonal(d, 0)
    active = np.ones(n, bool)
    in_a = np.asarray(cluster.agglomerative_two(jnp.asarray(d),
                                                jnp.asarray(active)))
    assert in_a[:6].all() and not in_a[6:].any()


def test_agglomerative_two_respects_mask():
    n = 8
    d = np.ones((n, n), np.float32)
    np.fill_diagonal(d, 0)
    active = np.array([True, True, True, False, False, False, False, False])
    in_a = np.asarray(cluster.agglomerative_two(jnp.asarray(d),
                                                jnp.asarray(active)))
    assert not in_a[3:].any()
    assert in_a.sum() in (1, 2)  # 3 actives -> clusters of 1 and 2


def test_smallest_eigvec_3x3_matches_eigh():
    rng = np.random.default_rng(7)
    mats = []
    for _ in range(200):
        b = rng.normal(size=(5, 3))
        mats.append(b.T @ b)  # generic PSD
    # near-rank-deficient grams (the common M-step case: concurrent lines)
    for _ in range(50):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        u = rng.normal(size=(2, 3))
        u -= np.outer(u @ d, d)
        mats.append(u.T @ u + 1e-7 * np.outer(d, d))
    a = jnp.asarray(np.stack(mats), jnp.float32)
    v = np.asarray(wmod.smallest_eigvec_3x3(a))
    vals, vecs = np.linalg.eigh(np.stack(mats))
    ref = vecs[:, :, 0]
    dots = np.abs(np.sum(v * ref, axis=-1))
    # direction match where the eigengap is resolvable in f32; for
    # near-degenerate gaps the direction is arbitrary (the TLS objective is
    # flat) and only the Rayleigh-quotient quality is meaningful
    gap = (vals[:, 1] - vals[:, 0]) / np.maximum(vals[:, 2], 1e-30)
    sep = gap > 1e-3
    np.testing.assert_array_less(0.9999, dots[sep] + 1e-12)
    rayleigh = np.einsum("ki,kij,kj->k", v, np.stack(mats), v)
    np.testing.assert_array_less(
        rayleigh, vals[:, 0] + 2e-3 * np.maximum(vals[:, 2], 1e-30) + 1e-12)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, rtol=1e-5)


def test_smallest_eigvec_3x3_degenerate():
    # multiplicity-2 smallest eigenvalue: any unit vector in the null plane
    d = np.array([1.0, 2.0, 3.0])
    d /= np.linalg.norm(d)
    a = jnp.asarray(5.0 * np.outer(d, d), jnp.float32)  # eigvals {0, 0, 5}
    v = np.asarray(wmod.smallest_eigvec_3x3(a))
    assert abs(v @ d) < 1e-5
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)
    # fully isotropic: any unit vector is valid
    v2 = np.asarray(wmod.smallest_eigvec_3x3(jnp.eye(3) * 2.0))
    np.testing.assert_allclose(np.linalg.norm(v2), 1.0, rtol=1e-5)
    # all-zero gram (the vp_ok = False path): must still be finite
    v3 = np.asarray(wmod.smallest_eigvec_3x3(jnp.zeros((3, 3))))
    assert np.all(np.isfinite(v3))
