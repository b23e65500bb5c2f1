"""Result visualization — port of the reference's ``result_plotting.py``.

Three-panel figure (fkluger/vanishing_points_2017 ``result_plotting.py:11-110``):
original image with the best VPs' line segments colored per VP and the
estimated horizon; the sphere image and the CNN output grid, both with VP
markers sized by inlier share. Host-side matplotlib Agg, saved to file
(the reference shows interactively).
"""

from __future__ import annotations

import numpy as np

from .ops import coords


def _angle_to_index(angles: np.ndarray, img_size: int) -> np.ndarray:
    import jax.numpy as jnp
    return np.asarray(coords.angle_to_index(jnp.asarray(angles),
                                            (img_size, img_size)))


def show_em_result(result: dict, image: np.ndarray, out_path: str,
                   maxbest: int = 4, horizon=None) -> None:
    """result: a Pipeline.process() dict; image: the (resized) input."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.cm as cmx
    import matplotlib.colors as colors
    import matplotlib.pyplot as plt

    height, width = image.shape[0], image.shape[1]
    scale = max(width, height)

    sphere_image = result["sphere_image"]
    prediction = result["cnn_prediction"][::-1, :]
    alive = result["alive"].astype(bool)
    vps = result["vp"]
    counts = result["counts"]
    vp_assoc = result["vp_assoc"]
    segments = result["segments"]

    fig = plt.figure(figsize=(12, 6))
    ax1 = plt.subplot2grid((2, 3), (0, 0), rowspan=2, colspan=2)
    ax2 = plt.subplot2grid((2, 3), (0, 2))
    ax2.set_title("CNN input w/ VP detections")
    ax3 = plt.subplot2grid((2, 3), (1, 2))
    ax3.set_title("CNN output w/ VP detections")

    ax1.imshow(image, cmap="gray" if image.ndim == 2 else None)
    ax1.autoscale(enable=False)
    ax2.imshow(sphere_image, cmap="Greys_r")
    ax2.autoscale(enable=False)
    ax3.imshow(prediction, cmap="Greys_r", interpolation="none")
    ax3.autoscale(enable=False)

    # to pixel coords (centre origin, y down)
    lsc = segments.copy()
    lsc[:, 0] = lsc[:, 0] * scale / 2.0 + width / 2.0
    lsc[:, 2] = lsc[:, 2] * scale / 2.0 + width / 2.0
    lsc[:, 1] = -lsc[:, 1] * scale / 2.0 + height / 2.0
    lsc[:, 3] = -lsc[:, 3] * scale / 2.0 + height / 2.0

    order = np.argsort(-np.where(alive, counts, -1))
    best = order[:min(maxbest, int(alive.sum()))]

    jet = plt.get_cmap("jet")
    cmap = cmx.ScalarMappable(
        norm=colors.Normalize(vmin=0, vmax=max(len(best) - 1, 1)), cmap=jet)

    for li in range(min(segments.shape[0], vp_assoc.shape[0])):
        a = vp_assoc[li]
        if a in best:
            color = cmap.to_rgba(int(np.where(best == a)[0][0]))
            ax1.plot([lsc[li, 0], lsc[li, 2]], [lsc[li, 1], lsc[li, 3]],
                     c=color, lw=2)

    pg = counts / max(counts.sum(), 1)
    beta = np.arcsin(np.clip(vps[:, 1], -1, 1))
    alpha = np.arcsin(np.clip(vps[:, 0] / np.cos(beta), -1, 1))
    angles = np.stack([alpha, beta], axis=-1)
    for panel, size in ((ax2, sphere_image.shape[0]), (ax3, prediction.shape[0])):
        for j in np.flatnonzero(alive):
            pos = _angle_to_index(angles[j], size)
            mark = "go" if j in best else "yo"
            ms = min(max(pg[j] * 100, 6), 20)
            panel.plot(pos[0], size - 1 - pos[1], mark, markersize=ms,
                       alpha=0.6)

    if horizon is not None:
        ax1.plot([horizon[0][0], horizon[1][0]],
                 [horizon[0][1], horizon[1][1]], c="c", lw=4)

    plt.subplots_adjust(left=0.05, right=0.95, top=0.95, bottom=0.05)
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
