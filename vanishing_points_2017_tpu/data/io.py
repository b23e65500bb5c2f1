"""Host-side image ingest.

Replaces the reference's L1 externals (SURVEY §2.9): ImageMagick ``convert``
subprocess resizes (``evaluation.py:140-145`` of
fkluger/vanishing_points_2017) become PIL Lanczos resizes; skimage's
``rgb2gray`` (``evaluation.py:150``) becomes the same ITU-R 601 luma dot
product. Resampling-filter differences vs ImageMagick are an accepted
(small) behavioral delta — parity is judged at the AUC level.
"""

from __future__ import annotations

import numpy as np

# skimage.color.rgb2gray coefficients (ITU-R 601-2 luma, skimage order)
_LUMA = np.array([0.2125, 0.7154, 0.0721], np.float64)


def load_image(path: str) -> np.ndarray:
    """Image file -> RGB (or grayscale) uint8 array."""
    from PIL import Image

    with Image.open(path) as im:
        if im.mode not in ("RGB", "L"):
            im = im.convert("RGB")
        return np.asarray(im)


def resize_max(image: np.ndarray, target: int) -> np.ndarray:
    """Resize so the image fits in a target x target box, preserving aspect
    ratio — ImageMagick's ``convert -resize NxN`` semantics."""
    from PIL import Image

    h, w = image.shape[0], image.shape[1]
    scale = target / max(w, h)
    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
    if (nw, nh) == (w, h):
        return image
    im = Image.fromarray(image)
    return np.asarray(im.resize((nw, nh), Image.LANCZOS))


def rgb2gray(image: np.ndarray) -> np.ndarray:
    """uint8/float RGB -> float64 grayscale in [0, 1] (skimage-compatible)."""
    if image.ndim == 2:
        g = image.astype(np.float64)
        return g / 255.0 if g.max() > 1.0 else g
    rgb = image[..., :3].astype(np.float64) / 255.0
    return rgb @ _LUMA


def normalize_segments(segments_px: np.ndarray, width: int,
                       height: int) -> np.ndarray:
    """Pixel endpoints -> the pipeline's normalized frame.

    Centre-origin, +y up, long axis scaled to [-1, 1] — THE coordinate
    system of the whole pipeline (``detect_lsd_lines``,
    ``evaluation.py:240-249``).
    """
    s = max(width, height) / 2.0
    out = segments_px[:, :4].astype(np.float64).copy()
    out[:, 0] = (out[:, 0] - width / 2.0) / s
    out[:, 2] = (out[:, 2] - width / 2.0) / s
    out[:, 1] = -(out[:, 1] - height / 2.0) / s
    out[:, 3] = -(out[:, 3] - height / 2.0) / s
    return out


def detect_lsd_lines(image_gray: np.ndarray) -> dict:
    """LSD on a [0,1]-or-[0,255] grayscale image, normalized output.

    Returns {'segments': (N, 4) normalized endpoints, 'nfa': (N,)} like the
    reference's ``detect_lsd_lines`` (``evaluation.py:227-251``).
    """
    from .. import lsd

    img = image_gray.astype(np.float64)
    if img.size and np.max(img) <= 1.0:
        img = img * 255.0
    raw = lsd.detect_line_segments(img)
    segments = normalize_segments(raw, img.shape[1], img.shape[0])
    return {"segments": segments, "nfa": raw[:, 6] if raw.size else raw}
