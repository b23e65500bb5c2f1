"""Horizon-error AUC metric.

Behavioural re-derivation of ``auc.py:5-37`` of
fkluger/vanishing_points_2017, including its quirky cutoff interpolation:
the fraction at the cutoff crossing is a *value-weighted* average

    midfraction = (e_prev * f_prev + e_next * f_next) / (e_next + e_prev)

(not linear interpolation). The empirical CDF points are (error_i, (i+1)/n)
over the sorted errors; a point at x = cutoff is appended (y = 1 if every
error is below the cutoff, else y = midfraction); the AUC is the trapezoid
integral over points with x <= cutoff, normalized by the cutoff.

Host-side NumPy: this is a per-dataset scalar, not a hot kernel.
"""

from __future__ import annotations

import numpy as np


# np.trapezoid is NumPy >= 2.0; fall back to np.trapz on 1.x installs.
_np_trapezoid = getattr(np, "trapezoid", None) or np.trapz


def _trapezoid(x: np.ndarray, y: np.ndarray) -> float:
    """Trapezoid rule (sklearn.metrics.auc equivalent, without the dep)."""
    if x.shape[0] < 2:
        return 0.0
    return float(_np_trapezoid(y, x))


def calc_auc(error_array: np.ndarray, cutoff: float = 0.25):
    """Returns (auc, plot_points) exactly like the reference.

    plot_points is an (n+1, 2) array of (error, fraction) CDF points including
    the appended cutoff point, sorted by error.
    """
    # atleast_1d: squeeze of a single-error array yields 0-d, which
    # np.sort rejects (the reference crashes identically on 1 image)
    errors = np.sort(np.atleast_1d(np.asarray(error_array).squeeze()))
    n = errors.shape[0]

    plot_points = np.zeros((n, 2))
    midfraction = 1.0

    for i in range(n):
        fraction = (i + 1) / n
        value = errors[i]
        plot_points[i, 0] = value
        plot_points[i, 1] = fraction
        if i > 0:
            lastvalue = errors[i - 1]
            if lastvalue < cutoff < value:
                midfraction = (lastvalue * plot_points[i - 1, 1]
                               + value * fraction) / (value + lastvalue)

    if n == 0:
        return 0.0, np.array([[cutoff, 0.0]])

    if plot_points[-1, 0] < cutoff:
        plot_points = np.vstack([plot_points, np.array([cutoff, 1.0])])
    else:
        plot_points = np.vstack([plot_points, np.array([cutoff, midfraction])])

    plot_points = plot_points[np.argsort(plot_points[:, 0])]

    below = plot_points[:, 0] <= cutoff
    auc = _trapezoid(plot_points[below, 0], plot_points[below, 1]) / cutoff

    return auc, plot_points
