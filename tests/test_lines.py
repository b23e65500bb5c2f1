import pytest
import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.ops import lines as lo


def rand_segments(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(n, 4)).astype(np.float32)


# ---- naive oracles (independent re-derivations of the math) ----

def naive_seg_point_dist(lp, p):
    a, b = lp[0:2], lp[2:4]
    t = np.dot(p - a, b - a) / np.dot(b - a, b - a)
    t = min(max(t, 0.0), 1.0)
    return np.linalg.norm(a + t * (b - a) - p)


def naive_closest(lp1, lp2):
    return min(naive_seg_point_dist(lp1, lp2[0:2]),
               naive_seg_point_dist(lp1, lp2[2:4]),
               naive_seg_point_dist(lp2, lp1[0:2]),
               naive_seg_point_dist(lp2, lp1[2:4]))


def naive_cosangle(lp1, lp2, f):
    lp1 = np.asarray(lp1, np.float64)  # float64 oracle: f=9 amplifies the
    lp2 = np.asarray(lp2, np.float64)  # f32 arccos error near dphi = 0
    v1 = lp1[0:2] - lp1[2:4]
    v2 = lp2[0:2] - lp2[2:4]
    c = abs(np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    dphi = abs(np.arccos(np.clip(c, -1, 1)))
    return np.cos(np.clip(f * dphi, -np.pi / 2, np.pi / 2))


def naive_prox(lp1, lp2, sigma):
    s = sigma * min(np.linalg.norm(lp1[0:2] - lp1[2:4]),
                    np.linalg.norm(lp2[0:2] - lp2[2:4]))
    d = naive_closest(lp1, lp2)
    return np.exp(-d * d / (2 * s * s))


def test_pairwise_closest_distance():
    lp = rand_segments(12)
    got = np.asarray(lo.pairwise_closest_distance(jnp.asarray(lp)))
    for i in range(12):
        assert got[i, i] == lo.SELF_DIST
        for j in range(12):
            if i != j:
                np.testing.assert_allclose(
                    got[i, j], naive_closest(lp[i], lp[j]), atol=1e-5)


def test_pairwise_cosangle():
    lp = rand_segments(10, seed=1)
    for f in (1.0, 2.0, 9.0):
        got = np.asarray(lo.pairwise_cosangle(jnp.asarray(lp), f=f))
        for i in range(10):
            for j in range(10):
                np.testing.assert_allclose(
                    got[i, j], naive_cosangle(lp[i], lp[j], f), atol=2e-5)


@pytest.mark.slow
def test_calc_lsim_masked():
    lp = rand_segments(8, seed=2)
    mask = np.array([True] * 6 + [False] * 2)
    got = np.asarray(lo.calc_lsim(jnp.asarray(lp), jnp.asarray(mask), sigma=1.0))
    # symmetric, zero diagonal, zero on invalid rows/cols
    np.testing.assert_allclose(got, got.T, atol=1e-6)
    assert np.all(np.diag(got) == 0)
    assert np.all(got[6:, :] == 0) and np.all(got[:, 6:] == 0)
    for i in range(6):
        for j in range(6):
            if i != j:
                want = naive_cosangle(lp[i], lp[j], 9) * naive_prox(lp[i], lp[j], 1.0)
                np.testing.assert_allclose(got[i, j], want, atol=2e-5)


@pytest.mark.slow
def test_line_rating_knn_against_naive():
    n = 15
    lp = rand_segments(n, seed=3)
    mask = np.ones(n, bool)
    k1, k2 = 10, 4
    got = np.asarray(lo.line_rating_knn(jnp.asarray(lp), jnp.asarray(mask),
                                        k1=k1, k2=k2, sigma=1.0))

    # naive version following the reference's algorithm description
    dist = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            dist[i, j] = 4.0 if i == j else naive_closest(lp[i], lp[j])
    for i in range(n):
        nbr = np.argsort(dist[i])[:k1]
        cosphi = np.array([naive_cosangle(lp[i], lp[j], 9) for j in nbr])
        best = np.argsort(cosphi)[::-1][:k2]
        tot = sum(naive_prox(lp[i], lp[nbr[b]], 1.0) * cosphi[b] for b in best)
        np.testing.assert_allclose(got[i], tot / k2, atol=1e-4)


@pytest.mark.slow
def test_knn_masked_lines_scored_zero():
    lp = rand_segments(10, seed=4)
    mask = np.array([True] * 7 + [False] * 3)
    got = np.asarray(lo.line_rating_knn(jnp.asarray(lp), jnp.asarray(mask)))
    assert np.all(got[7:] == 0)
    assert np.all(got[:7] >= -1e-6)  # cos(pi/2) in f32 is ~-4e-8, not 0


def test_segments_to_homogeneous():
    lp = rand_segments(6, seed=5)
    got = np.asarray(lo.segments_to_homogeneous(jnp.asarray(lp)))
    for i in range(6):
        want = np.cross(np.array([lp[i, 0], lp[i, 1], 1.0]),
                        np.array([lp[i, 2], lp[i, 3], 1.0]))
        np.testing.assert_allclose(got[i], want, atol=1e-6)
        # the segment endpoints lie on the line
        assert abs(np.dot(want, [lp[i, 0], lp[i, 1], 1.0])) < 1e-5


def test_lines_angles_folding():
    # horizontal segment -> angle 0; vertical -> pi/2; 45 deg -> pi/4
    lp = np.array([[0, 0, 1, 0], [0, 0, 0, 1], [0, 0, 1, 1],
                   [1, 1, 0, 0]], np.float32)
    got = np.asarray(lo.lines_angles(jnp.asarray(lp)))
    np.testing.assert_allclose(got, [0, np.pi / 2, np.pi / 4, np.pi / 4],
                               atol=1e-6)
