"""Dataset-adapter ground-truth math against synthetic fixtures.

The real YUD/ECD/HLW downloads are absent, so these tests fabricate each
dataset's GT files (scipy .mat / csv) with known horizons and check the
adapters reproduce the reference's conversions (benchmark.py:82-220)."""

import csv
import os

import numpy as np
import pytest

scipy_io = pytest.importorskip("scipy.io")

from vanishing_points_2017_tpu.data import datasets as dsets


def write_png(path, h, w):
    from PIL import Image
    Image.fromarray(np.zeros((h, w), np.uint8)).save(path)


def test_ecd_adapter_horizontal_horizon(tmp_path):
    # pixel-space horizon: horizontal line y = y0 (line [0, 1, -y0])
    h, w, y0 = 480, 640, 200.0
    write_png(tmp_path / "img1.jpg", h, w)
    scipy_io.savemat(tmp_path / "img1hor.mat",
                     {"horizon": np.array([0.0, 1.0, -y0])})
    scipy_io.savemat(tmp_path / "img1VP.mat",
                     {"zenith": np.array([[320.0, 10.0]]),
                      "hor_points": np.array([[100.0, y0], [500.0, y0]])})
    records, start = dsets.ecd_records(str(tmp_path))
    assert start == 25 and len(records) == 1
    th = records[0].true_horizon
    # normalized: y_norm = -(y0 - h/2) / (max(w,h)/2) at every x
    want_y = -(y0 - h / 2.0) / (max(w, h) / 2.0)
    p1 = np.cross(th, [1, 0, 1]); p1 = p1 / p1[2]
    p2 = np.cross(th, [-1, 0, 1]); p2 = p2 / p2[2]
    np.testing.assert_allclose([p1[1], p2[1]], [want_y, want_y], atol=1e-9)


def test_hlw_adapter(tmp_path):
    # original image 1000x800 (w x h), horizon through two points at
    # y = 100 (already centre-origin y-up coords per HLW's convention)
    os.makedirs(tmp_path / "split", exist_ok=True)
    os.makedirs(tmp_path / "images", exist_ok=True)
    with open(tmp_path / "split" / "test.txt", "w") as fh:
        fh.write("photo_001.jpg\n")
    with open(tmp_path / "metadata.csv", "w", newline="") as fh:
        wtr = csv.writer(fh)
        # row: path, height, width, x1, y1, x2, y2
        wtr.writerow(["images/photo_001.jpg", "800", "1000",
                      "-400", "100", "400", "120"])
    records, start = dsets.hlw_records(str(tmp_path))
    assert start == 0 and len(records) == 1
    th = records[0].true_horizon
    # scale_orig/2 = 500; points (-0.8, 0.2), (0.8, 0.24)
    # cross(th, [1, 0, 1]) intersects the vertical x = -1 (x + z = 0)
    p1 = np.cross(th, [1, 0, 1]); p1 = p1 / p1[2]
    want_at_m1 = 0.2 + (-1.0 - (-0.8)) * (0.24 - 0.2) / (0.8 - (-0.8))
    np.testing.assert_allclose(p1[0], -1.0, atol=1e-9)
    np.testing.assert_allclose(p1[1], want_at_m1, atol=1e-9)


def test_yud_adapter(tmp_path):
    # camera: f/ps = 800; reference hard-codes pp (13, -11), S = 2/640
    scipy_io.savemat(tmp_path / "cameraParameters.mat",
                     {"focal": np.array([[8.0]]),
                      "pixelSize": np.array([[0.01]]),
                      "pp": np.array([[307.0, 251.0]])})
    img_dir = tmp_path / "P1001"
    os.makedirs(img_dir)
    write_png(img_dir / "P1001.jpg", 480, 640)
    # three orthogonal camera-frame directions
    vp = np.eye(3)
    vp[:, 0] = [1, 0.1, 0.2]; vp[:, 1] = [0, 1, 0.05]; vp[:, 2] = [-0.2, 0, 1]
    scipy_io.savemat(img_dir / "P1001GroundTruthVP_CamParams.mat", {"vp": vp})
    records, start = dsets.yud_records(str(tmp_path))
    assert start == 25 and len(records) == 1
    th = records[0].true_horizon

    # oracle: the reference's transform (benchmark.py:142-167)
    k = np.array([[800.0, 0, 13], [0, 800.0, -11], [0, 0, 1]])
    s = np.diag([2.0 / 640, 2.0 / 640, 1.0])
    tv = k @ vp
    tv = tv / tv[2:3, :]
    tv = s @ tv
    t1 = tv[:, 0] / tv[2, 0]
    t3 = tv[:, 2] / tv[2, 2]
    want = np.cross(t1, t3)
    np.testing.assert_allclose(th / np.linalg.norm(th),
                               want / np.linalg.norm(want), atol=1e-9)


def test_yud_missing_gt_yields_none(tmp_path):
    scipy_io.savemat(tmp_path / "cameraParameters.mat",
                     {"focal": np.array([[8.0]]),
                      "pixelSize": np.array([[0.01]]),
                      "pp": np.array([[307.0, 251.0]])})
    img_dir = tmp_path / "P1002"
    os.makedirs(img_dir)
    write_png(img_dir / "P1002.jpg", 480, 640)
    records, _ = dsets.yud_records(str(tmp_path))
    assert records[0].true_horizon is None
