import pytest
import numpy as np

from vanishing_points_2017_tpu.utils import StageTimer, get_logger, trace
from vanishing_points_2017_tpu import weights as wload


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
    assert "stage timings" in t.pretty()


def test_trace_noop():
    with trace(None):
        x = 1
    assert x == 1


def test_logger_singleton():
    assert get_logger() is get_logger()


@pytest.mark.slow
def test_params_npz_roundtrip(tmp_path):
    import jax
    from vanishing_points_2017_tpu.models import cnn

    params = cnn.init_params(jax.random.PRNGKey(0), input_size=120)
    path = str(tmp_path / "w.npz")
    wload.params_to_npz(params, path)
    back = wload.params_from_npz(path)
    for layer in params:
        for k in params[layer]:
            np.testing.assert_array_equal(np.asarray(params[layer][k]),
                                          np.asarray(back[layer][k]))


def test_aot_export_roundtrip(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    from vanishing_points_2017_tpu.utils import aot

    monkeypatch.setenv("VP_TPU_COMPILE_CACHE", str(tmp_path))

    def fn(x):
        return x * 2.0 + 1.0

    x = jnp.arange(8.0)
    call = aot.load_or_export("t1", fn, x)
    np.testing.assert_allclose(np.asarray(call(x)), np.arange(8.0) * 2 + 1)
    # artifact persisted; second load deserializes it
    files = list(tmp_path.iterdir())
    assert any(f.name.startswith("aot_t1") for f in files)
    call2 = aot.load_or_export("t1", fn, x)
    np.testing.assert_allclose(np.asarray(call2(x)), np.arange(8.0) * 2 + 1)


def test_aot_stale_artifact_reexports(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    from vanishing_points_2017_tpu.utils import aot

    monkeypatch.setenv("VP_TPU_COMPILE_CACHE", str(tmp_path))
    path = aot._path("t2")
    with open(path, "wb") as fh:
        fh.write(b"garbage not an export artifact")
    call = aot.load_or_export("t2", lambda x: x + 1.0, jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(call(jnp.ones(4))), np.full(4, 2.0))
