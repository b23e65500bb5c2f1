import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.ops import sphere
from vanishing_points_2017_tpu.models import synth


def test_curve_beta_formula():
    rng = np.random.default_rng(0)
    l = rng.normal(size=(5, 3)).astype(np.float32)
    a = np.linspace(-np.pi / 2, np.pi / 2, 101).astype(np.float32)
    got = np.asarray(sphere.curve_beta(jnp.asarray(l), jnp.asarray(a)))
    want = np.arctan((-l[:, 0:1] * np.sin(a)[None, :]
                      - l[:, 2:3] * np.cos(a)[None, :]) / l[:, 1:2])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_render_single_line_hits_curve():
    # one line; the rendered image must be bright exactly near beta(alpha)
    l = jnp.asarray(np.array([[0.3, 1.0, 0.1]], np.float32))
    mask = jnp.ones(1, bool)
    size = 100
    img = np.asarray(sphere.sphere_render(l, mask, size=size, alpha=0.5))
    assert img.shape == (size, size)
    a = (np.arange(size) - size / 2 + 0.5) * np.pi / size
    b = np.arctan((-0.3 * np.sin(a) - 0.1 * np.cos(a)) / 1.0)
    rows = np.round(size / 2 - 0.5 - b * size / np.pi).astype(int)
    on_curve = img[rows, np.arange(size)]
    assert np.all(on_curve > 0.1)
    # far from the curve: dark
    far_rows = (rows + size // 2) % size
    off_curve = img[far_rows, np.arange(size)]
    assert np.mean(off_curve) < np.mean(on_curve) * 0.2


def test_render_masked_lines_invisible():
    rng = np.random.default_rng(1)
    l = rng.normal(size=(8, 3)).astype(np.float32)
    m_all = jnp.zeros(8, bool)
    img = np.asarray(sphere.sphere_render(jnp.asarray(l), m_all, size=64))
    assert np.all(img == 0)


def test_vp_is_bright_spot():
    # many segments through one VP: the VP's angle position is a hot spot
    rng = np.random.default_rng(2)
    vp = np.array([0.5, 0.2, 1.0])
    vp /= np.linalg.norm(vp)
    seg = synth.segments_for_vp(rng, vp, 80, noise=0.0)
    l = synth.segments_to_lines(seg).astype(np.float32)
    size = 200
    img = np.asarray(sphere.sphere_render(
        jnp.asarray(l), jnp.ones(l.shape[0], bool), size=size))
    alpha = np.arcsin(np.clip(vp[0] / np.cos(np.arcsin(vp[1])), -1, 1))
    beta = np.arcsin(vp[1])
    col = int(round((alpha / np.pi + 0.5) * size - 0.5))
    row = int(round(size / 2 - 0.5 - beta * size / np.pi))
    spot = img[max(row - 2, 0):row + 3, max(col - 2, 0):col + 3]
    assert spot.max() > np.percentile(img, 99.5)


def test_uint8_contract():
    rng = np.random.default_rng(3)
    l = rng.normal(size=(4, 3)).astype(np.float32)
    img = np.asarray(sphere.sphere_image_uint8(
        jnp.asarray(l), jnp.ones(4, bool), size=64))
    assert img.dtype == np.uint8
    assert img.shape == (64, 64)
