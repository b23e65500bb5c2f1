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
