"""Import Caffe artifacts (.caffemodel weights, .binaryproto mean blob).

The reference loads ``cnn/weights.caffemodel`` and ``cnn/mean.binaryproto``
through pycaffe (``evaluation.py:17-31`` of fkluger/vanishing_points_2017);
both are downloaded artifacts, not in its repo. This module parses the
protobuf **wire format** directly — no caffe or compiled-proto dependency —
extracting only what the network needs:

* NetParameter: ``layer`` (field 100, LayerParameter) and legacy ``layers``
  (field 2, V1LayerParameter) — both probed, modern first.
* LayerParameter: ``name`` (1), ``blobs`` (7); V1LayerParameter: ``name``
  (4), ``blobs`` (6).
* BlobProto: ``data`` (5, packed float), ``shape`` (7 -> BlobShape.dim (1)),
  legacy ``num/channels/height/width`` (1-4).

Conversion to this package's layout:

* conv blobs: Caffe OIHW -> HWIO. Grouped convs keep I = in/groups, which
  matches ``feature_group_count`` directly.
* fc blobs: Caffe (out, in) -> (in, out) transpose. The fc6 input ordering
  is Caffe's NCHW flatten, which ``models/cnn.py`` reproduces.
"""

from __future__ import annotations

import numpy as np


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_fields(buf: bytes) -> dict[int, list]:
    """Decode one message level: {field_number: [raw values]}.

    Wire type 0 -> int, 2 -> bytes, 5 -> 4 bytes, 1 -> 8 bytes.
    """
    fields: dict[int, list] = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            val = buf[pos:pos + length]
            pos += length
        elif wire == 5:
            val = buf[pos:pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(field, []).append(val)
    return fields


def _blob_to_array(blob_bytes: bytes) -> np.ndarray:
    f = parse_fields(blob_bytes)
    if 5 in f:  # packed float data
        raw = b"".join(f[5])
        data = np.frombuffer(raw, dtype="<f4")
    elif 8 in f:  # double_data
        raw = b"".join(f[8])
        data = np.frombuffer(raw, dtype="<f8").astype(np.float32)
    else:
        raise ValueError("blob has no data field")
    if 7 in f:  # BlobShape
        dims = parse_fields(f[7][0]).get(1, [])
        shape = [int(d) for d in dims]
    else:  # legacy num/channels/height/width
        shape = [int(f.get(i, [1])[0]) for i in (1, 2, 3, 4)]
    shape = [s for s in shape if s > 0] or [data.size]
    return data.reshape(shape)


def read_mean_binaryproto(path: str) -> np.ndarray:
    """mean.binaryproto -> (H, W) float32 mean image (channel-squeezed)."""
    with open(path, "rb") as fh:
        arr = _blob_to_array(fh.read())
    return np.squeeze(arr).astype(np.float32)


def read_caffemodel(path: str) -> dict[str, list[np.ndarray]]:
    """caffemodel -> {layer_name: [blob arrays]} for layers with weights."""
    with open(path, "rb") as fh:
        net = parse_fields(fh.read())
    out: dict[str, list[np.ndarray]] = {}
    # modern LayerParameter (field 100): name=1, blobs=7
    for layer_bytes in net.get(100, []):
        lf = parse_fields(layer_bytes)
        if 7 not in lf:
            continue
        name = lf[1][0].decode()
        out[name] = [_blob_to_array(b) for b in lf[7]]
    # legacy V1LayerParameter (field 2): name=4, blobs=6
    if not out:
        for layer_bytes in net.get(2, []):
            lf = parse_fields(layer_bytes)
            if 6 not in lf:
                continue
            name = lf[4][0].decode() if 4 in lf else "?"
            out[name] = [_blob_to_array(b) for b in lf[6]]
    return out


def caffemodel_to_params(path: str) -> dict:
    """Full conversion to the ``models/cnn.py`` parameter pytree."""
    import jax.numpy as jnp

    blobs = read_caffemodel(path)
    params = {}
    conv_names = {"conv1", "conv2", "conv3", "conv4", "conv5"}
    fc_names = {"fc6", "fc7", "fc8_20x20"}
    for name, arrs in blobs.items():
        if name in conv_names:
            w, b = arrs[0], arrs[1]
            # OIHW -> HWIO (grouped convs: I is already in/groups)
            w = np.transpose(w.reshape(w.shape[-4:]), (2, 3, 1, 0))
            params[name] = {"w": jnp.asarray(w), "b": jnp.asarray(b.ravel())}
        elif name in fc_names:
            w, b = arrs[0], arrs[1]
            w = w.reshape(w.shape[-2:])  # (out, in)
            params[name] = {"w": jnp.asarray(w.T), "b": jnp.asarray(b.ravel())}
    missing = (conv_names | fc_names) - set(params)
    if missing:
        raise ValueError(f"caffemodel missing layers: {sorted(missing)}")
    return params
