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


@pytest.mark.parametrize("r,l", [(300, 3), (256, 1), (4096, 10)])
def test_sort_records_random(r, l):
    rng = np.random.default_rng(r + l)
    keys = rng.integers(-1, 400_000, r).astype(np.int32)
    pay = rng.normal(size=(l, r)).astype(np.float32)
    ks, ps = sort_records_pallas(jnp.asarray(keys), jnp.asarray(pay),
                                 interpret=True)
    _check(keys, pay, ks, ps)


@pytest.mark.slow
def test_sort_records_detector_scale():
    """The real detector shape: 638 rows x 64 records, 10 payload lanes,
    heavy duplication (many records per component root)."""
    r, l = 638 * 64, 10
    rng = np.random.default_rng(0)
    keys = rng.choice(rng.integers(0, 400_000, 900), r).astype(np.int32)
    keys[rng.random(r) < 0.3] = -1  # invalid records, like the detector
    pay = rng.normal(size=(l, r)).astype(np.float32)
    ks, ps = sort_records_pallas(jnp.asarray(keys), jnp.asarray(pay),
                                 interpret=True)
    _check(keys, pay, ks, ps)
