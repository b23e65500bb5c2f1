import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.ops import coords


def np_index_to_angle(index, shape):
    # independent re-derivation of the grid convention
    a, b = index
    m, n = shape
    return np.array([(a - 0.5 * m + 0.5) * np.pi / m,
                     (b - 0.5 * n + 0.5) * np.pi / n])


def test_index_to_angle_matches_formula():
    shape = (20, 20)
    for idx in [(0.0, 0.0), (9.5, 9.5), (19.0, 3.0), (7.0, 12.0)]:
        got = np.asarray(coords.index_to_angle(jnp.array(idx), shape))
        want = np_index_to_angle(idx, shape)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_index_angle_roundtrip():
    shape = (500, 500)
    idx = jnp.array([[0.0, 0.0], [249.5, 100.0], [499.0, 499.0]])
    ang = coords.index_to_angle(idx, shape)
    back = coords.angle_to_index(ang, shape)
    np.testing.assert_allclose(np.asarray(back), np.asarray(idx), atol=1e-4)


def test_angle_point_roundtrip():
    rng = np.random.default_rng(0)
    ang = rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, size=(64, 2))
    p = coords.angle_to_point(jnp.asarray(ang))
    p = np.asarray(p)
    # unit norm, z >= 0
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 1.0, atol=1e-6)
    assert np.all(p[:, 2] >= 0)
    back = np.asarray(coords.point_to_angle(jnp.asarray(p)))
    np.testing.assert_allclose(back, ang, atol=5e-5)  # f32 arcsin near +-pi/2


def test_angle_to_point_center():
    # alpha = beta = 0 is the hemisphere pole (0, 0, 1)
    p = np.asarray(coords.angle_to_point(jnp.array([0.0, 0.0])))
    np.testing.assert_allclose(p, [0.0, 0.0, 1.0], atol=1e-7)


def test_angle_to_point_sign_behaviour():
    # alpha outside (-pi/2, pi/2) gives z < 0 before the sign fix; the point
    # must be flipped onto the z >= 0 hemisphere
    p = np.asarray(coords.angle_to_point(jnp.array([3 * np.pi / 4, 0.1])))
    assert p[2] > 0
    np.testing.assert_allclose(np.linalg.norm(p), 1.0, atol=1e-6)
    # exact z == 0 collapses to the zero vector (reference np.sign quirk);
    # exercised via the sign multiply directly since no float32 angle maps
    # to exactly cos(.) == 0
    z = jnp.sign(jnp.array(0.0)) * jnp.array([1.0, 2.0, 0.0])
    np.testing.assert_allclose(np.asarray(z), [0.0, 0.0, 0.0])


def test_grid_cell_centers_20():
    # cell 0 of a 20-grid is at -(19/20) * pi/2; cell 19 at +(19/20) * pi/2
    shape = (20, 20)
    a0 = np.asarray(coords.index_to_angle(jnp.array([0.0, 19.0]), shape))
    np.testing.assert_allclose(a0[0], -(19.0 / 20.0) * np.pi / 2, rtol=1e-6)
    np.testing.assert_allclose(a0[1], (19.0 / 20.0) * np.pi / 2, rtol=1e-6)
