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


def test_artifact_fingerprint_tracks_content(tmp_path):
    p = tmp_path / "w.npz"
    p.write_bytes(b"weights-v1")
    f1 = wload.artifact_fingerprint(str(p))
    assert f1 != "none" and len(f1) == 16
    assert wload.artifact_fingerprint(str(p)) == f1  # cached, stable
    import os
    p.write_bytes(b"weights-v2")
    os.utime(p, ns=(1, 1))  # force distinct mtime even on coarse clocks
    assert wload.artifact_fingerprint(str(p)) != f1
    assert wload.artifact_fingerprint(str(tmp_path / "missing.npz")) == "none"
    assert wload.artifact_fingerprint(None) == "none"


def test_default_weights_path_shadowing(tmp_path, monkeypatch, capsys):
    """A stale gitignored dense artifact must NOT shadow the versioned
    compact weights; a FRESHER dense retrain wins with a notice. The
    arbitration notice goes to STDERR unconditionally — even warn=False
    callers (bench.py) must reveal which artifact won, since it changes
    every AUC/bench number (advisor r4 #1) — and is deduped per process."""
    import os
    assets = tmp_path / "assets"
    assets.mkdir()
    compact = assets / "weights_compact.npz"
    dense = assets / "weights.npz"
    monkeypatch.setattr(wload, "_repo_root", lambda: str(tmp_path))
    wload._arbitration_notified.clear()

    # only compact -> compact
    compact.write_bytes(b"compact")
    assert wload.default_weights_path(warn=False) == str(compact)

    # stale dense (older mtime) -> still compact, with a notice EVEN at
    # warn=False (the silent-shadowing scenario the advisor flagged)
    dense.write_bytes(b"dense-old")
    os.utime(dense, ns=(10, 10))
    os.utime(compact, ns=(20, 20))
    assert wload.default_weights_path(warn=False) == str(compact)
    assert "IGNORING stale dense" in capsys.readouterr().err

    # deduped: the same decision does not spam a second notice
    assert wload.default_weights_path() == str(compact)
    assert "IGNORING" not in capsys.readouterr().err

    # fresher dense retrain -> dense, with a notice
    os.utime(dense, ns=(30, 30))
    assert wload.default_weights_path(warn=False) == str(dense)
    assert "dense retrain" in capsys.readouterr().err

    # only dense -> dense
    compact.unlink()
    assert wload.default_weights_path(warn=False) == str(dense)
    wload._arbitration_notified.clear()


def test_weights_identity_resolves_default(tmp_path, monkeypatch):
    monkeypatch.setattr(wload, "_repo_root", lambda: str(tmp_path))
    assert wload.weights_identity() == "none"  # no assets at all
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "weights_compact.npz").write_bytes(b"compact")
    fp = wload.weights_identity()
    assert fp == wload.artifact_fingerprint(str(assets / "weights_compact.npz"))
