"""Dataset adapters: YUD, ECD, HLW ground truth + a synthetic benchmark.

Re-derivation of the reference benchmark's dataset handling
(``benchmark.py:39-99, 142-220`` of fkluger/vanishing_points_2017):

* **YUD** (York Urban): images ``P*/P*.jpg``; camera intrinsics from
  ``cameraParameters.mat`` with the reference's HARD-CODED principal point
  (13, -11) and scale 2/640 (``benchmark.py:88-89`` — a quirk to keep);
  per-image ``*GroundTruthVP_CamParams.mat`` gives 3 orthogonal VPs, the
  horizon is VP1 x VP3. First 25 images are train/val and skipped.
* **ECD** (Eurasian Cities): images ``*.jpg``; ``*hor.mat`` / ``*VP.mat``
  ground truth in pixel coords, converted to the normalized centre-origin
  y-up frame. First 25 skipped; images resized to fit 800x800.
* **HLW** (Horizon Lines in the Wild): test list ``split/test.txt``;
  ``metadata.csv`` rows matched by basename give two horizon points scaled
  by the ORIGINAL image size. Resized to 800.
* **synthetic**: rendered Manhattan scenes with exact GT horizons — the
  datasets above are external downloads, so this adapter makes the
  benchmark runnable (and CI-testable) without them.

Each adapter yields records: {name, image_path | image, target_size,
true_horizon(normalized) or None}.
"""

from __future__ import annotations

import dataclasses
import glob
import os

import numpy as np

from . import io as dio


@dataclasses.dataclass
class Record:
    name: str
    image_path: str | None = None
    image: np.ndarray | None = None  # inline image (synthetic)
    true_horizon: np.ndarray | None = None  # normalized homogeneous line
    # GT may need the image dims; adapters that can, fill it eagerly.


def horizon_from_points(p1: np.ndarray, p2: np.ndarray) -> np.ndarray:
    return np.cross(p1, p2)


def normalized_horizon_error(est_horizon: np.ndarray,
                             true_horizon: np.ndarray,
                             width: int, height: int) -> float:
    """Max horizon deviation at x = +-1, normalized by image height
    (``benchmark.py:245-257``)."""
    def at(h, x):
        p = np.cross(h, np.array([1.0 * x, 0.0, 1.0]))
        return p / p[2]

    scale = max(width, height)
    e1 = abs(at(est_horizon, 1)[1] - at(true_horizon, 1)[1])
    e2 = abs(at(est_horizon, -1)[1] - at(true_horizon, -1)[1])
    return max(e1, e2) / 2.0 * scale / height


# ---------------------------------------------------------------- YUD

def yud_records(root: str) -> tuple[list[Record], int]:
    """Returns (records, start_skip)."""
    import scipy.io as sio

    cam = sio.loadmat(os.path.join(root, "cameraParameters.mat"))
    f = cam["focal"][0, 0]
    ps = cam["pixelSize"][0, 0]
    # the reference ignores cam['pp'] and hard-codes (13, -11)
    k_mat = np.array([[f / ps, 0, 13], [0, f / ps, -11], [0, 0, 1]])
    s_mat = np.array([[2.0 / 640, 0, 0], [0, 2.0 / 640, 0], [0, 0, 1]])

    records = []
    for img_path in sorted(glob.glob(os.path.join(root, "P*", "P*.jpg"))):
        image_id = os.path.splitext(os.path.basename(img_path))[0]
        gt_path = os.path.join(os.path.dirname(img_path),
                               f"{image_id}GroundTruthVP_CamParams.mat")
        true_h = None
        if os.path.isfile(gt_path):
            vp = np.asarray(sio.loadmat(gt_path)["vp"], np.float64)
            tv = k_mat @ vp
            tv = tv / tv[2:3, :]
            tv = s_mat @ tv
            t1 = tv[:, 0] / tv[2, 0]
            t3 = tv[:, 2] / tv[2, 2]
            true_h = np.cross(t1, t3)
        records.append(Record(name=image_id, image_path=img_path,
                              true_horizon=true_h))
    return records, 25


# ---------------------------------------------------------------- ECD

def ecd_records(root: str) -> tuple[list[Record], int]:
    import scipy.io as sio

    records = []
    for img_path in sorted(glob.glob(os.path.join(root, "*.jpg"))):
        base = os.path.splitext(img_path)[0]
        true_h = None
        hor_path, vp_path = f"{base}hor.mat", f"{base}VP.mat"
        if os.path.isfile(hor_path):
            img = dio.load_image(img_path)
            h, w = img.shape[0], img.shape[1]
            scale = max(w, h)
            hor = np.squeeze(sio.loadmat(hor_path)["horizon"]).astype(np.float64)
            # intersect with pixel verticals x = w and x = 0, then normalize
            p1 = np.cross(hor, np.array([-1.0, 0.0, float(w)]))
            p2 = np.cross(hor, np.array([-1.0, 0.0, 0.0]))
            p1, p2 = p1 / p1[2], p2 / p2[2]
            for p in (p1, p2):
                p[0] = (p[0] - w / 2.0) / (scale / 2.0)
                p[1] = -(p[1] - h / 2.0) / (scale / 2.0)
            true_h = np.cross(p1, p2)
        records.append(Record(name=os.path.basename(base),
                              image_path=img_path, true_horizon=true_h))
    return records, 25


# ---------------------------------------------------------------- HLW

def hlw_records(root: str) -> tuple[list[Record], int]:
    import csv

    meta = {}
    with open(os.path.join(root, "metadata.csv")) as fh:
        for row in csv.reader(fh):
            key = os.path.splitext(os.path.basename(row[0]))[0]
            meta[key] = row

    records = []
    with open(os.path.join(root, "split", "test.txt")) as fh:
        names = [ln.strip() for ln in fh if ln.strip()]
    for name in names:
        img_path = os.path.join(root, "images", name)
        key = os.path.splitext(os.path.basename(name))[0]
        true_h = None
        if key in meta:
            row = meta[key]
            h_orig, w_orig = float(row[1]), float(row[2])
            scale_orig = max(w_orig, h_orig)
            p1 = np.array([float(row[3]), float(row[4]), 1.0])
            p2 = np.array([float(row[5]), float(row[6]), 1.0])
            p1[0:2] /= scale_orig / 2.0
            p2[0:2] /= scale_orig / 2.0
            true_h = np.cross(p1, p2)
        records.append(Record(name=key, image_path=img_path,
                              true_horizon=true_h))
    return records, 0


# ---------------------------------------------------------- synthetic

def render_scene_image(scene, size: int = 640, line_width: int = 2,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Draw the scene's segments as dark lines on a light background so the
    real LSD detector can re-extract them."""
    from PIL import Image, ImageDraw

    im = Image.new("L", (size, size), color=220)
    draw = ImageDraw.Draw(im)
    s = size / 2.0
    for seg in scene.segments:
        x1 = seg[0] * s + s
        y1 = -seg[1] * s + s
        x2 = seg[2] * s + s
        y2 = -seg[3] * s + s
        draw.line([(x1, y1), (x2, y2)], fill=40, width=line_width)
    arr = np.asarray(im, np.float64)
    if rng is not None:  # mild sensor noise
        arr = np.clip(arr + rng.normal(0, 3.0, arr.shape), 0, 255)
    return arr.astype(np.uint8)


def synthetic_records(count: int = 25, seed: int = 7,
                      size: int = 640) -> tuple[list[Record], int]:
    from ..models import synth

    rng = np.random.default_rng(seed)
    records = []
    for i in range(count):
        scene = synth.make_scene(rng, lines_per_vp=int(rng.integers(25, 60)),
                                 outliers=int(rng.integers(5, 25)))
        img = render_scene_image(scene, size=size, rng=rng)
        records.append(Record(name=f"synthetic_{i:04d}", image=img,
                              true_horizon=scene.horizon.astype(np.float64)))
    return records, 0


DATASETS = {
    "york": (yud_records, None),       # native resolution
    "eurasian": (ecd_records, 800),    # resize to fit 800x800
    "horizon": (hlw_records, 800),
    "synthetic": (synthetic_records, None),
}


def get_data_list(source_folder: str, destination_folder: str, name: str,
                  dataset_name: str | None = None,
                  distance_measure: str = "angle", use_weights: bool = True,
                  do_split: bool = True, do_merge: bool = True,
                  update: bool = False) -> dict:
    """Manifest builder mirroring the reference's ``get_data_list``
    (``evaluation.py:55-118``): encodes the EM config into the dataset name
    (config => cache identity), globs the image list per dataset convention,
    and persists the manifest (JSON here, pickle there) for reuse unless
    ``update``.
    """
    import json

    fullname = (f"{name}_{distance_measure}_"
                f"{'' if use_weights else 'no'}weights_"
                f"{'' if do_split else 'no'}split_"
                f"{'' if do_merge else 'no'}merge")
    manifest_path = os.path.join(destination_folder, f"{fullname}.json")

    if os.path.isfile(manifest_path) and not update:
        with open(manifest_path) as fh:
            return json.load(fh)

    if dataset_name == "york":
        image_files = glob.glob(os.path.join(source_folder, "P*", "P*.jpg"))
    elif dataset_name == "eurasian":
        image_files = glob.glob(os.path.join(source_folder, "*.jpg"))
    elif dataset_name == "horizon":
        with open(os.path.join(source_folder, "split", "test.txt")) as fh:
            image_files = [os.path.join(source_folder, "images", ln.strip())
                           for ln in fh if ln.strip()]
    else:
        image_files = []
        for ext in ("*.jpg", "*.png", "*.pgm"):
            image_files += glob.glob(os.path.join(source_folder, ext))
    image_files.sort()

    dest = os.path.join(destination_folder, fullname)
    dataset = {
        "source_folder": source_folder,
        "destination_folder": dest,
        "name": fullname,
        "distance_measure": distance_measure,
        "use_weights": use_weights,
        "do_split": do_split,
        "do_merge": do_merge,
        "image_files": image_files,
        "cache_files": [os.path.join(
            dest, os.path.splitext(os.path.basename(f))[0] + ".result.npz")
            for f in image_files],
    }
    os.makedirs(dest, exist_ok=True)
    with open(manifest_path, "w") as fh:
        json.dump(dataset, fh, indent=1)
    return dataset
