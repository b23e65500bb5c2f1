import numpy as np
import jax.numpy as jnp

from vanishing_points_2017_tpu.ops import probability as prob


def test_pdf_params_grid_layout():
    rng = np.random.default_rng(0)
    resp = rng.uniform(size=(20, 20)).astype(np.float32)
    par = prob.pdf_params(jnp.asarray(resp))
    means = np.asarray(par.means)
    # cell (b, a) -> flat index b*20+a with mean (alpha_a, beta_b)
    alphas = np.linspace(-19 / 20 * np.pi / 2, 19 / 20 * np.pi / 2, 20)
    np.testing.assert_allclose(means[5 * 20 + 3], [alphas[3], alphas[5]],
                               rtol=1e-6)
    np.testing.assert_allclose(float(par.sigma), np.pi / (1.282 * 20), rtol=1e-6)


def test_pdf_params_topk_and_normalization():
    rng = np.random.default_rng(1)
    resp = rng.uniform(size=(20, 20)).astype(np.float32)
    par = prob.pdf_params(jnp.asarray(resp))
    w = np.asarray(par.weights)
    sigma = float(par.sigma)
    assert np.sum(w > 0) == 100  # top-100 truncation
    np.testing.assert_allclose(np.sum(w) * 2 * np.pi * sigma * sigma, 1.0,
                               rtol=1e-5)
    # the kept cells are exactly the 100 largest responses
    kept = set(np.flatnonzero(w > 0))
    want = set(np.argsort(resp.reshape(-1))[-100:])
    assert kept == want


def test_calc_pdf_against_naive():
    rng = np.random.default_rng(2)
    resp = rng.uniform(size=(20, 20)).astype(np.float32)
    par = prob.pdf_params(jnp.asarray(resp))
    q = rng.uniform(-np.pi / 2, np.pi / 2, size=(5, 2)).astype(np.float32)
    got = np.asarray(prob.calc_pdf(par, jnp.asarray(q)))

    means = np.asarray(par.means)
    weights = np.asarray(par.weights)
    sigma = float(par.sigma)
    for i in range(5):
        x, y = q[i]
        total = 0.0
        for nidx in range(400):
            if weights[nidx] <= 0:
                continue
            mx, my = means[nidx]
            ds = [
                (x - mx) ** 2 + (y - my) ** 2,
                (x - mx + np.pi) ** 2 + (y + my) ** 2,
                (x - mx - np.pi) ** 2 + (y + my) ** 2,
                (x + mx) ** 2 + (y - my - np.pi) ** 2,
                (x + mx) ** 2 + (y - my - np.pi) ** 2,  # d4 double-counted
            ]
            total += weights[nidx] * sum(
                np.exp(-0.5 * d / sigma ** 2) for d in ds)
        np.testing.assert_allclose(got[i], total, rtol=2e-4)


def test_lvsq_angle_against_naive():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(4, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v *= np.sign(v[:, 2:3])
    lp = rng.uniform(-1, 1, size=(6, 4)).astype(np.float32)
    got = np.asarray(prob.calc_lvsq_angle(jnp.asarray(v), jnp.asarray(lp)))
    for m in range(4):
        v2 = v[m, 0:2] / v[m, 2]
        for n in range(6):
            lm = 0.5 * (lp[n, 0:2] + lp[n, 2:4])
            vec1 = lm - v2
            vec2 = lp[n, 0:2] - lp[n, 2:4]
            c = abs(np.dot(vec1, vec2) /
                    (np.linalg.norm(vec1) * np.linalg.norm(vec2)))
            np.testing.assert_allclose(got[n, m], (1 - c) ** 2, atol=1e-5)


def test_lvsq_dotprod():
    rng = np.random.default_rng(4)
    v = rng.normal(size=(3, 3)).astype(np.float32)
    l = rng.normal(size=(5, 3)).astype(np.float32)
    got = np.asarray(prob.calc_lvsq_dotprod(jnp.asarray(v), jnp.asarray(l)))
    want = (l @ v.T) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lvsq_area_zero_pad_cross_quirk():
    # VP at (2, 0); horizontal segment on y=0 pointing at it -> area 0
    v = np.array([[2.0, 0.0, 1.0]], np.float32)
    v /= np.linalg.norm(v)
    lp = np.array([[0.4, 0.0, 0.6, 0.0]], np.float32)
    got = np.asarray(prob.calc_lvsq_area(jnp.asarray(v), jnp.asarray(lp)))
    np.testing.assert_allclose(got[0, 0], 0.0, atol=1e-8)


def test_calc_probabilities_posterior_properties():
    rng = np.random.default_rng(5)
    resp = rng.uniform(size=(20, 20)).astype(np.float32)
    par = prob.pdf_params(jnp.asarray(resp))

    n, ms = 32, 6
    lp = rng.uniform(-1, 1, size=(n, 4)).astype(np.float32)
    l = np.cross(np.concatenate([lp[:, 0:2], np.ones((n, 1))], 1),
                 np.concatenate([lp[:, 2:4], np.ones((n, 1))], 1))
    l = (l / np.linalg.norm(l, axis=1, keepdims=True)).astype(np.float32)
    lmask = np.array([True] * 28 + [False] * 4)

    v = rng.normal(size=(ms, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v *= np.sign(v[:, 2:3])
    alive = np.array([True, True, True, True, False, False])
    log_s = np.full(ms, np.log(1e-7), np.float32)

    p = prob.calc_probabilities(par, jnp.asarray(v), jnp.asarray(alive),
                                jnp.asarray(l), jnp.asarray(lp),
                                jnp.asarray(log_s), jnp.asarray(lmask),
                                "angle")
    p_vl = np.asarray(p.p_vl)
    assert p_vl.shape == (ms, n)
    assert np.all(np.isfinite(p_vl))
    assert np.all(p_vl >= 0) and np.all(p_vl <= 1 + 1e-5)
    # dead slots and invalid lines contribute nothing
    assert np.all(p_vl[4:, :] == 0)
    assert np.all(p_vl[:, 28:] == 0)
    # posterior columns sum to ~1 for valid lines unless the evidence floor hit
    col = p_vl[:, :28].sum(axis=0)
    assert np.all(col <= 1 + 1e-4)
    # p_v zero on dead slots
    assert np.all(np.asarray(p.p_v)[4:] == 0)


def test_log_space_matches_linear_float64():
    # compare the log-space float32 path against a float64 linear computation
    rng = np.random.default_rng(6)
    resp = rng.uniform(size=(20, 20)).astype(np.float32)
    par = prob.pdf_params(jnp.asarray(resp))
    n, ms = 16, 3
    lp = rng.uniform(-1, 1, size=(n, 4)).astype(np.float32)
    l = np.cross(np.concatenate([lp[:, 0:2], np.ones((n, 1))], 1),
                 np.concatenate([lp[:, 2:4], np.ones((n, 1))], 1))
    l = (l / np.linalg.norm(l, axis=1, keepdims=True)).astype(np.float32)
    v = rng.normal(size=(ms, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v *= np.sign(v[:, 2:3])
    alive = np.ones(ms, bool)
    lmask = np.ones(n, bool)
    s = 1e-5
    log_s = np.full(ms, np.log(s), np.float32)

    p = prob.calc_probabilities(par, jnp.asarray(v), jnp.asarray(alive),
                                jnp.asarray(l), jnp.asarray(lp),
                                jnp.asarray(log_s), jnp.asarray(lmask),
                                "angle")

    # float64 linear reference computation
    lvsq = np.asarray(prob.calc_lvsq_angle(jnp.asarray(v), jnp.asarray(lp)),
                      dtype=np.float64)
    p_v = np.asarray(prob.calc_pdf(par, jnp.asarray(
        prob.calc_angles(jnp.asarray(v)))), dtype=np.float64)
    p_lv = np.exp(-lvsq / (2 * s)) / np.sqrt(2 * np.pi * s)
    p_l = np.maximum(p_lv @ p_v, 1e-12)
    p_vl = (p_lv * p_v[None, :] / p_l[:, None]).T
    np.testing.assert_allclose(np.asarray(p.p_vl), p_vl, atol=2e-3)
