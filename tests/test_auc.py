import numpy as np

from vanishing_points_2017_tpu.metrics import calc_auc


def test_all_below_cutoff_perfect_zero_errors():
    # all-zero errors: CDF hits 1 at x=0, appended (0.25, 1) -> area = cutoff
    errors = np.zeros(10)
    auc, pts = calc_auc(errors, cutoff=0.25)
    assert abs(auc - 1.0) < 1e-9


def test_uniform_errors_auc():
    # errors uniform on [0, 0.25]: CDF ~ x/0.25, AUC ~ 0.5
    errors = np.linspace(0.0125, 0.25, 10) - 0.0125 / 2
    auc, _ = calc_auc(errors, cutoff=0.25)
    assert 0.4 < auc < 0.6


def test_midfraction_quirk():
    # hand-computed: errors [0.1, 0.4], cutoff 0.25.
    # points: (0.1, 0.5), (0.4, 1.0); crossing at i=1:
    # midfraction = (0.1*0.5 + 0.4*1.0) / (0.4 + 0.1) = 0.45/0.5 = 0.9
    # appended (0.25, 0.9); points <= cutoff: (0.1, 0.5), (0.25, 0.9)
    # trapezoid = (0.25-0.1) * (0.5+0.9)/2 = 0.105 ; / 0.25 = 0.42
    auc, pts = calc_auc(np.array([0.1, 0.4]), cutoff=0.25)
    np.testing.assert_allclose(auc, 0.42, rtol=1e-9)


def test_all_above_cutoff():
    auc, _ = calc_auc(np.array([0.5, 0.9]), cutoff=0.25)
    assert auc == 0.0


def test_plot_points_sorted_and_augmented():
    errors = np.array([0.3, 0.05, 0.2])
    auc, pts = calc_auc(errors, cutoff=0.25)
    assert pts.shape == (4, 2)
    assert np.all(np.diff(pts[:, 0]) >= 0)
    assert 0.0 <= auc <= 1.0


def test_calc_auc_single_error():
    # a single-image eval set must not crash (squeeze() used to make the
    # array 0-d); below-cutoff single error -> AUC 1-ish regime
    auc, pts = calc_auc(np.array([0.01]), cutoff=0.25)
    assert 0.0 <= auc <= 1.0
    assert pts.shape[1] == 2
