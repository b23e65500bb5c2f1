"""Pallas bitonic sort kernel (ops/sort_pallas.py) vs numpy, interpret
mode — the fused TPU sort that replaces the detector's record-grouping
lax.sort (see BASELINE.md round-3 accounting)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vanishing_points_2017_tpu.ops.sort_pallas import sort_records_pallas


def _check(keys, pay, ks, ps):
    ks, ps = np.asarray(ks), np.asarray(ps)
    assert np.array_equal(ks, np.sort(keys))
    for i in range(pay.shape[0]):
        got = sorted(zip(ks.tolist(), ps[i].tolist()))
        want = sorted(zip(keys.tolist(), pay[i].tolist()))
        assert got == want, f"lane {i} diverged"


@pytest.mark.parametrize(
    "r,l",
    [(300, 3), (256, 1),
     pytest.param(4096, 10, marks=pytest.mark.slow)])  # 87 s in interpret
def test_sort_records_random(r, l):
    rng = np.random.default_rng(r + l)
    keys = rng.integers(-1, 400_000, r).astype(np.int32)
    pay = rng.normal(size=(l, r)).astype(np.float32)
    ks, ps = sort_records_pallas(jnp.asarray(keys), jnp.asarray(pay),
                                 interpret=True)
    _check(keys, pay, ks, ps)


@pytest.mark.slow
def test_sort_records_detector_scale():
    """The real detector shape: 638 rows x 64 records (the shipped
    runs_per_row default -> a 65536-element bitonic network, one
    doubling stage beyond 32768), 10 payload lanes, heavy duplication
    (many records per component root).

    Runs in a FRESH interpreter: compiling an interpret-mode bitonic
    network of this size unrolled for the CPU backend is
    stable in a clean process but segfaults XLA:CPU inside
    backend_compile_and_load when the suite's long-lived process has
    already compiled dozens of programs (observed twice at the end of
    full-suite runs, rc=139; passes standalone). Subprocess
    isolation keeps the full-scale coverage without poisoning the run."""
    import subprocess
    import sys
    body = (
        # the image's sitecustomize pins jax_platforms='axon' through
        # jax.config, overriding the env var — force CPU back on first
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        # the image's sitecustomize also wires the persistent compilation
        # cache; serializing this giant interpret-mode executable is the
        # conftest-documented segfault, so disable it in the child too
        "jax.config.update('jax_enable_compilation_cache', False)\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from vanishing_points_2017_tpu.ops.sort_pallas import "
        "sort_records_pallas\n"
        "r, l = 638 * 64, 10\n"
        "rng = np.random.default_rng(0)\n"
        "keys = rng.choice(rng.integers(0, 400_000, 900), r)"
        ".astype(np.int32)\n"
        "keys[rng.random(r) < 0.3] = -1\n"
        "pay = rng.normal(size=(l, r)).astype(np.float32)\n"
        "ks, ps = sort_records_pallas(jnp.asarray(keys), "
        "jnp.asarray(pay), interpret=True)\n"
        "ks = np.asarray(ks); ps = np.asarray(ps)\n"
        "assert np.array_equal(ks, np.sort(keys))\n"
        "for i in range(l):\n"
        "    got = sorted(zip(ks.tolist(), ps[i].tolist()))\n"
        "    want = sorted(zip(keys.tolist(), pay[i].tolist()))\n"
        "    assert got == want, f'lane {i} diverged'\n"
        "print('DETECTOR_SCALE_SORT_OK')\n")
    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=here + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    out = subprocess.run([sys.executable, "-c", body], env=env,
                         capture_output=True, text=True, timeout=2400)
    assert out.returncode == 0, (out.returncode, out.stdout[-2000:],
                                 out.stderr[-2000:])
    assert "DETECTOR_SCALE_SORT_OK" in out.stdout


def _group_stats_oracle_body():
    """Full fused pallas group-stats chain (sort + segmented reductions,
    interpret mode) vs the XLA _component_stats path on records from a
    real rendered scene: every selected component's stats must agree."""
    import math
    import jax
    from vanishing_points_2017_tpu.models import synth
    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    from vanishing_points_2017_tpu.ops import lines_device as ld
    from vanishing_points_2017_tpu.ops.group_stats_pallas import (
        detector_group_stats)

    rng = np.random.default_rng(3)
    scene = synth.make_scene(rng, lines_per_vp=15, outliers=5)
    img = jnp.asarray(render_scene_image(scene, size=320, rng=rng)
                      .astype(np.float32))
    tol = math.radians(ld.TOL_DEG)
    im = ld._gaussian_blur(img, 1.0)
    com1 = im[1:, 1:] - im[:-1, :-1]
    com2 = im[:-1, 1:] - im[1:, :-1]
    gx, gy = 0.5 * (com1 + com2), 0.5 * (com1 - com2)
    mag = jnp.sqrt(gx * gx + gy * gy)
    active = mag > ld.QUANT / math.sin(tol)
    inv = jnp.where(mag > 0, 1.0 / jnp.maximum(mag, 1e-12), 0.0)
    root = ld._connected_components(active, gx * inv, -gy * inv,
                                    math.cos(tol), 8)
    hi, wi = im.shape[0] - 1, im.shape[1] - 1
    s = max(im.shape) / 2.0
    ys_i, xs_i = np.meshgrid(np.arange(hi, dtype=np.float32),
                             np.arange(wi, dtype=np.float32), indexing="ij")
    xn2 = jnp.asarray(((xs_i + 0.5) - im.shape[1] / 2.0) / s)
    yn2 = jnp.asarray(-((ys_i + 0.5) - im.shape[0] / 2.0) / s)
    wgt = jnp.where(active, mag / 255.0, 0.0)

    # XLA reference path (use_pallas is False on the CPU backend);
    # args through jit, not closure — closed-over constants make XLA
    # constant-fold the record sort at trace time (minutes).
    # runs_per_row passed EXPLICITLY so the reference and the record
    # building below always share one budget regardless of the default.
    rpr = 64
    ref = jax.jit(lambda a, b, c, d: ld._component_stats(
        a, b, c, d, 128, (hi, wi), runs_per_row=rpr))(
            root, wgt.reshape(-1), xn2, yn2)

    # records exactly as _component_stats builds them
    import math as _m
    r2 = root.reshape(hi, wi)
    w2 = wgt
    conn = jnp.concatenate([jnp.zeros((hi, 1), bool),
                            r2[:, 1:] == r2[:, :-1]], axis=1)
    is_end = jnp.concatenate([r2[:, 1:] != r2[:, :-1],
                              jnp.ones((hi, 1), bool)], axis=1)
    log_w = max(1, _m.ceil(_m.log2(wi)))
    q = jnp.stack([w2, w2 * xn2, w2 * yn2, w2 * xn2 * xn2, w2 * xn2 * yn2,
                   w2 * yn2 * yn2, (w2 > 0).astype(jnp.float32)], axis=0)
    qs = ld._segmented_sum_scan(q, conn[None], log_w)
    x_first = ld._segmented_copy_first(xn2, conn, log_w)
    k_row = min(rpr, wi)
    mass_row = jnp.where(is_end, qs[0], -1.0)
    import jax.lax as lax
    top_mass, top_pos = lax.top_k(mass_row, k_row)
    take = lambda a: jnp.take_along_axis(a, top_pos, axis=1)
    rec_ok = top_mass > 0.0
    rec_root = jnp.where(rec_ok, take(r2), -1).reshape(-1)
    rec_q = [jnp.where(rec_ok, take(qs[i]), 0.0).reshape(-1)
             for i in range(7)]
    payload = jnp.stack([*rec_q, take(x_first).reshape(-1),
                         take(xn2).reshape(-1), take(yn2).reshape(-1)],
                        axis=0)

    ch = detector_group_stats(rec_root, payload, interpret=True)
    top, pos = lax.top_k(ch[0], 128)
    sel = lambda a: np.asarray(a[pos])
    got = {
        "valid": np.asarray(top > 0.0),
        "root": sel(ch[1]).astype(np.int64),
        "mass": sel(ch[2]), "cnt": sel(ch[3]), "cx": sel(ch[4]),
        "cy": sel(ch[5]), "ddx": sel(ch[6]), "ddy": sel(ch[7]),
        "lam_min": sel(ch[8]), "tmin": sel(ch[9]), "tmax": sel(ch[10]),
    }
    nv = int(np.asarray(ref["valid"]).sum())
    assert nv > 5
    assert np.array_equal(got["valid"], np.asarray(ref["valid"]))
    v = got["valid"]
    assert np.array_equal(got["root"][v], np.asarray(ref["root"])[v])
    for key, atol in (("mass", 1e-3), ("cnt", 1e-3), ("cx", 1e-4),
                      ("cy", 1e-4), ("lam_min", 1e-5)):
        np.testing.assert_allclose(got[key][v], np.asarray(ref[key])[v],
                                   atol=atol, err_msg=key)
    # Direction: the bitonic sort is NOT stable, so float accumulation
    # order inside a group differs from lax.sort's; on tiny groups the
    # covariance eigenvector is ill-conditioned and its SIGN is free
    # (both +-dd span the eigenspace; downstream only the two segment
    # endpoints swap). Compare angularly, up to sign, and compare
    # (tmin, tmax) in the reference's direction frame.
    dot = (got["ddx"][v] * np.asarray(ref["ddx"])[v]
           + got["ddy"][v] * np.asarray(ref["ddy"])[v])
    ang_err = np.maximum(1.0 - np.abs(dot), 0.0)
    # conditioning-aware: heavy groups must be tight; tiny groups (few
    # records/pixels) have genuinely ill-conditioned eigenvectors where
    # sum-order rounding rotates the direction by up to a few degrees
    cnt = got["cnt"][v]
    tol_ang = np.where(cnt >= 16.0, 2e-4, 4e-3)  # 1.1 deg / 5.1 deg
    bad = ang_err >= tol_ang
    assert not bad.any(), list(zip(ang_err[bad], cnt[bad]))
    flip = np.sign(dot)
    tmin_f = np.where(flip > 0, got["tmin"][v], -got["tmax"][v])
    tmax_f = np.where(flip > 0, got["tmax"][v], -got["tmin"][v])
    tol_t = np.where(cnt >= 16.0, 3e-3, 8e-2)  # extent * sin(tol_ang)
    for name, a, b in (("tmin", tmin_f, np.asarray(ref["tmin"])[v]),
                       ("tmax", tmax_f, np.asarray(ref["tmax"])[v])):
        bad = np.abs(a - b) >= tol_t
        assert not bad.any(), (name, list(zip((a - b)[bad], cnt[bad])))


@pytest.mark.slow
def test_group_stats_matches_xla_component_stats():
    """Runs _group_stats_oracle_body in a FRESH interpreter — the same
    XLA:CPU long-lived-process segfault as the detector-scale sort test
    above (giant interpret-mode compiles crash backend_compile_and_load
    after the suite has compiled dozens of programs; observed rc=139 at
    suite end with this test on the stack; passes clean standalone)."""
    import os
    import subprocess
    import sys
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=here + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                         env=env, capture_output=True, text=True,
                         timeout=1800)
    assert out.returncode == 0, (out.returncode, out.stdout[-2000:],
                                 out.stderr[-2000:])
    assert "GROUP_STATS_ORACLE_OK" in out.stdout


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    # sitecustomize wires the persistent compilation cache; serializing
    # the giant interpret-mode executable segfaults (conftest.py note)
    jax.config.update("jax_enable_compilation_cache", False)
    _group_stats_oracle_body()
    print("GROUP_STATS_ORACLE_OK")
