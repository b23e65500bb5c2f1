"""Real-photograph regression against the reference's own published results.

The reference repo bundles 4 real photographs (assets/examples of
fkluger/vanishing_points_2017, the example.py inputs) and the rendered
result figures its README shows for them (assets/figure{1..4}.jpg, each
drawing the estimated horizon as a thick pure-cyan line over the photo).
Those figures are the output of the ORIGINAL stack — Caffe weights, Agg
sphere renderer, real LSD — so matching them on real photos is the
strongest accuracy evidence available without the YUD/ECD/HLW datasets
(every other accuracy gate in this suite is synthetic).

The expected horizon rows below were extracted from the figures by
least-squares-fitting the cyan-line pixels inside the photo panel
(pure-cyan mask g,b>180, r<100; rows within +-30 px of the median;
panel = the non-white bbox of the figure's left half). Values are the
horizon's fractional image row (0 = top) at the left and right image
edges. nord_lb (figure2) is excluded: its view looks steeply upward and
the reference draws no horizon inside the frame.

The photos live in the read-only reference checkout and are NOT copied
into this repo; the tests skip if the checkout is absent.
"""

import os

import numpy as np
import pytest

REF_EXAMPLES = "/root/reference/assets/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EXAMPLES),
    reason="reference example photos not available")

# (photo, frac_left, frac_right) extracted from the reference figures
REFERENCE_HORIZONS = [
    ("ihme_zentrum.jpg", 0.7701, 0.7743),           # figure1
    ("uni_hannover.jpg", 0.7458, 0.7336),           # figure3
    ("uni_hannover_lichthof.jpg", 0.3889, 0.3877),  # figure4
]


def _pipeline(**cfg_overrides):
    from vanishing_points_2017_tpu.pipeline import Pipeline, PipelineConfig
    from vanishing_points_2017_tpu import weights as wload
    import dataclasses

    params, mean = wload.load_params_and_mean(warn=False)
    cfg = dataclasses.replace(PipelineConfig(), **cfg_overrides)
    return Pipeline(params=params, mean=mean, cfg=cfg)


def _fracs(out_hp1, out_hp2, image_shape):
    """Horizon endpoints (normalized frame) -> fractional image rows."""
    h, w = image_shape
    s = max(h, w) / 2.0
    fl = (h / 2.0 - float(out_hp1[1]) * s) / h
    fr = (h / 2.0 - float(out_hp2[1]) * s) / h
    return fl, fr


@pytest.mark.slow
def test_host_lsd_path_matches_reference_figures():
    """Host C++ LSD + full pipeline on the real photos: horizon within
    0.035 fractional image height of the reference's published result
    (measured: 0.002-0.017 — inside the reference's own run-to-run
    variability from its nondeterministic EM ordering)."""
    pipe = _pipeline()
    for name, rl, rr in REFERENCE_HORIZONS:
        out = pipe.process(os.path.join(REF_EXAMPLES, name), target_size=640)
        assert bool(out["em_valid"]), name
        fl, fr = _fracs(out["hp1"], out["hp2"], out["image_shape"])
        err = max(abs(fl - rl), abs(fr - rr))
        assert err < 0.035, (name, fl, fr, rl, rr)


@pytest.mark.slow
def test_device_detector_path_on_real_photos():
    """Zero-host path on real photos at the DEFAULT detector gates.

    The gates were arbitrated jointly over these photos and rendered
    synthetic scenes (PipelineConfig comment; sweep history in
    scripts/sweep_detector_gates.py): fixed count/length gates alone
    cannot cover both the outdoor facades and the glass-roof atrium,
    but LSD's region-to-rectangle density test (det_min_density=0.7)
    rejects the meandering micro-texture chains on all three. Measured
    err at the round-4 defaults (global selection, 32k record budget,
    zenith side-gate waiver): 0.041 / 0.008 / 0.008 (vs the reference's
    published figures; the host-LSD path gets 0.002-0.017). The record
    budget is load-bearing: at 16384 the atrium degrades to 0.188
    (texture-dense photos carry 30-50k runs). The 0.10 bound leaves
    margin for the EM's sensitivity to small segment-population shifts
    — texture-heavy photos sit near a triplet-choice boundary, so a
    blown bound here is a real robustness regression, not noise."""
    pipe = _pipeline()
    for name, rl, rr in REFERENCE_HORIZONS:
        host = pipe.ingest_image(os.path.join(REF_EXAMPLES, name),
                                 target_size=640)
        out = pipe.process_images([host["gray"]])
        assert bool(np.asarray(out["em_valid"])[0]), name
        alive = np.asarray(out["alive"])[0]
        assert int(alive.sum()) >= 3, name
        fl, fr = _fracs(np.asarray(out["hp1"])[0],
                        np.asarray(out["hp2"])[0],
                        host["image_shape"])
        err = max(abs(fl - rl), abs(fr - rr))
        assert err < 0.10, (name, fl, fr, rl, rr)


@pytest.mark.slow
def test_example_driver_on_reference_photos(tmp_path, monkeypatch):
    """`example.py --images <photo> --show` (the reference example.py's
    role on its own bundled photographs): must process a real photo end
    to end and write the 3-panel result figure."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import example as example_mod

    monkeypatch.setattr(example_mod, "RESULTS", str(tmp_path))
    photo = os.path.join(REF_EXAMPLES, "uni_hannover.jpg")
    monkeypatch.setattr(sys, "argv",
                        ["example.py", "--device", "cpu", "--show",
                         "--images", photo])
    assert example_mod.main() == 0
    out = tmp_path / "uni_hannover.result.png"
    assert out.is_file() and out.stat().st_size > 10_000


@pytest.mark.slow
def test_upward_view_photo_still_valid():
    """nord_lb looks steeply up (no in-frame horizon in the reference
    figure); the pipeline must still produce a valid EM result with a
    dominant zenith-ish structure, not crash or go empty."""
    pipe = _pipeline()
    out = pipe.process(os.path.join(REF_EXAMPLES, "nord_lb.jpg"),
                       target_size=640)
    assert bool(out["em_valid"])
    alive = np.asarray(out["alive"])
    assert int(alive.sum()) >= 3
    counts = np.asarray(out["counts"])[alive]
    assert counts.max() >= 50  # strong dominant VP structure
