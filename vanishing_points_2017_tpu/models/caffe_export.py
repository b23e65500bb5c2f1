"""Serialize the CNN parameter pytree as a .caffemodel (wire format).

Counterpart of ``caffe_import``: writes a NetParameter whose layers carry
the same blobs (conv HWIO -> OIHW, fc (in, out) -> (out, in)) in either the
modern ``layer`` (field 100, LayerParameter) or legacy ``layers`` (field 2,
V1LayerParameter) framing, with the realistic surrounding fields (type,
bottom/top names) a Caffe-written artifact contains. Two uses:

* golden fixtures for importer parity tests at the REAL network size (the
  original 2017 artifact, ``/root/reference/config.py:7``, is a download we
  cannot fetch — the exporter lets tests validate the exact drop-in path);
* interop: exporting trained weights back to a Caffe deployment.
"""

from __future__ import annotations

import numpy as np

_CONV = ("conv1", "conv2", "conv3", "conv4", "conv5")
_FC = ("fc6", "fc7", "fc8_20x20")


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_field(num: int, data: bytes) -> bytes:
    return _field(num, 2, _varint(len(data)) + data)


def blob_bytes(arr: np.ndarray, legacy_shape: bool = False) -> bytes:
    """BlobProto: packed float data (5) + BlobShape (7) or legacy dims
    (1-4, num/channels/height/width)."""
    data = np.ascontiguousarray(arr, dtype="<f4").tobytes()
    out = b""
    if legacy_shape:
        dims = ([1] * (4 - arr.ndim) + list(arr.shape))[:4]
        for i, d in enumerate(dims):
            out += _field(i + 1, 0, _varint(d))
        out += _len_field(5, data)
    else:
        out += _len_field(5, data)
        shape_msg = b"".join(_field(1, 0, _varint(d)) for d in arr.shape)
        out += _len_field(7, shape_msg)
    return out


def _layer_blobs(name: str, params: dict) -> list[np.ndarray]:
    layer = params[name]
    if "u" in layer:  # low-rank factorized FC (models/factorize): densify
        w = np.asarray(layer["u"]) @ np.asarray(layer["v"])
    else:
        w = np.asarray(layer["w"])
    b = np.asarray(layer["b"])
    if name in _CONV:
        w = np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW
    else:
        w = w.T  # (in, out) -> (out, in)
    return [w, b]


def params_to_caffemodel(params: dict, path: str,
                         legacy: bool = False) -> None:
    """Write the parameter pytree as a .caffemodel.

    ``legacy=True`` emits V1LayerParameter framing (field 2, name=4,
    blobs=6, legacy blob dims) like pre-2014 Caffe snapshots; otherwise the
    modern LayerParameter framing (field 100, name=1, blobs=7).
    """
    net = _len_field(1, b"AlexNet_for_VP_classification")  # NetParameter.name
    for name in _CONV + _FC:
        blobs = _layer_blobs(name, params)
        if legacy:
            msg = _len_field(4, name.encode())
            msg += _field(5, 0, _varint(4))  # V1 type enum CONVOLUTION-ish
            for arr in blobs:
                msg += _len_field(6, blob_bytes(arr, legacy_shape=True))
            net += _len_field(2, msg)
        else:
            msg = _len_field(1, name.encode())
            msg += _len_field(2, b"Convolution" if name in _CONV
                              else b"InnerProduct")
            msg += _len_field(3, name.encode())        # bottom
            msg += _len_field(4, (name + "_out").encode())  # top
            for arr in blobs:
                msg += _len_field(7, blob_bytes(arr))
            net += _len_field(100, msg)
    with open(path, "wb") as fh:
        fh.write(net)


def mean_to_binaryproto(mean: np.ndarray, path: str) -> None:
    """Write a (H, W) mean image as Caffe's mean.binaryproto BlobProto."""
    arr = np.asarray(mean, np.float32)[None, None]
    with open(path, "wb") as fh:
        fh.write(blob_bytes(arr, legacy_shape=True))
