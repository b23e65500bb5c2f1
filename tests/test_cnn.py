import pytest
import io
import struct

import numpy as np
import jax
import jax.numpy as jnp

from vanishing_points_2017_tpu.models import cnn, train, caffe_import


@pytest.mark.slow
def test_forward_shapes_and_range():
    rng = jax.random.PRNGKey(0)
    params = cnn.init_params(rng, input_size=250)
    x = jnp.zeros((2, 250, 250, 1), jnp.float32)
    y = cnn.forward(params, x)
    assert y.shape == (2, 20, 20)
    y = np.asarray(y)
    assert np.all((y >= 0) & (y <= 1))


def test_caffe_max_pool_ceil_semantics():
    # 30x30 pooled 3/2 must give 15x15 (Caffe ceil), not 14x14
    x = jnp.arange(30 * 30, dtype=jnp.float32).reshape(1, 30, 30, 1)
    y = cnn.caffe_max_pool(x, 3, 2)
    assert y.shape == (1, 15, 15, 1)
    # last window hangs over the edge: max of the bottom-right 2x2 block
    assert float(y[0, 14, 14, 0]) == float(x[0, 29, 29, 0])
    # 123x123 -> 61x61 (exact), 61 -> 30
    assert cnn.caffe_max_pool(jnp.zeros((1, 123, 123, 1)), 3, 2).shape[1] == 61
    assert cnn.caffe_max_pool(jnp.zeros((1, 61, 61, 1)), 3, 2).shape[1] == 30


def test_lrn_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 3, 8)).astype(np.float32)
    got = np.asarray(cnn.lrn_across_channels(jnp.asarray(x)))
    n, alpha, beta = 5, 1e-4, 0.75
    half = (n - 1) // 2
    want = np.zeros_like(x)
    for c in range(8):
        lo, hi = max(0, c - half), min(8, c + half + 1)
        ssum = np.sum(x[..., lo:hi] ** 2, axis=-1)
        want[..., c] = x[..., c] / (1 + alpha / n * ssum) ** beta
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_grouped_conv_halves_input_channels():
    params = cnn.init_params(jax.random.PRNGKey(1))
    assert params["conv2"]["w"].shape == (5, 5, 48, 256)  # 96/2 in
    assert params["conv4"]["w"].shape == (3, 3, 192, 384)
    assert params["conv5"]["w"].shape == (3, 3, 192, 256)
    assert params["fc6"]["w"].shape == (cnn.FC6_IN, 4096)


@pytest.mark.slow
def test_train_step_reduces_loss():
    state = train.init_state(jax.random.PRNGKey(2), input_size=250)
    rng_np = np.random.default_rng(3)
    imgs, labels = train.make_batch(rng_np, batch=2, n_pad=128, size=250)
    rng = jax.random.PRNGKey(4)
    losses = []
    for i in range(4):
        state, loss = train.train_step(state, imgs, labels,
                                       jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizes a 2-sample batch quickly


@pytest.mark.slow
def test_learning_rate_schedule():
    np.testing.assert_allclose(float(train.learning_rate(jnp.asarray(0))),
                               train.BASE_LR, rtol=1e-6)
    np.testing.assert_allclose(float(train.learning_rate(jnp.asarray(200000))),
                               train.BASE_LR * 0.1, rtol=1e-6)


# ---- protobuf wire-format round trip for the caffe importer ----

def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _len_field(num, data):
    return _field(num, 2, _varint(len(data)) + data)


def _blob(arr):
    data = np.ascontiguousarray(arr, dtype="<f4").tobytes()
    shape_msg = b"".join(_field(1, 0, _varint(d)) for d in arr.shape)
    return _len_field(5, data) + _len_field(7, shape_msg)


def test_caffemodel_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    layers = b""
    specs = {
        "conv1": [(8, 1, 11, 11), (8,)], "conv2": [(16, 4, 5, 5), (16,)],
        "conv3": [(16, 16, 3, 3), (16,)], "conv4": [(16, 8, 3, 3), (16,)],
        "conv5": [(8, 8, 3, 3), (8,)],
        "fc6": [(32, 72), (32,)], "fc7": [(32, 32), (32,)],
        "fc8_20x20": [(400, 32), (400,)],
    }
    arrays = {}
    for name, shapes in specs.items():
        blobs = b""
        arrays[name] = []
        for s in shapes:
            a = rng.normal(size=s).astype(np.float32) * 0.01
            arrays[name].append(a)
            blobs += _len_field(7, _blob(a))
        layers += _len_field(100, _len_field(1, name.encode()) + blobs)
    path = tmp_path / "w.caffemodel"
    path.write_bytes(layers)

    params = caffe_import.caffemodel_to_params(str(path))
    # conv: OIHW -> HWIO
    np.testing.assert_allclose(
        np.asarray(params["conv2"]["w"]),
        np.transpose(arrays["conv2"][0], (2, 3, 1, 0)), rtol=1e-6)
    # fc: (out, in) -> (in, out)
    np.testing.assert_allclose(np.asarray(params["fc6"]["w"]),
                               arrays["fc6"][0].T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["fc8_20x20"]["b"]),
                               arrays["fc8_20x20"][1], rtol=1e-6)
    assert params["fc6"]["w"].shape == (72, 32)


def test_mean_binaryproto(tmp_path):
    mean = np.random.default_rng(6).uniform(0, 50, size=(1, 1, 8, 8)).astype(
        np.float32)
    path = tmp_path / "mean.binaryproto"
    path.write_bytes(_blob(mean))
    got = caffe_import.read_mean_binaryproto(str(path))
    np.testing.assert_allclose(got, mean[0, 0], rtol=1e-6)


# ---- exporter round-trip + stored-activation drop-in parity ----

def _export_import_case(tmp_path, legacy):
    from vanishing_points_2017_tpu.models import caffe_export

    params = cnn.init_params(jax.random.PRNGKey(3), input_size=120,
                             fc_width=64)
    path = str(tmp_path / ("w_v1.caffemodel" if legacy else "w.caffemodel"))
    caffe_export.params_to_caffemodel(
        jax.tree.map(np.asarray, params), path, legacy=legacy)
    got = caffe_import.caffemodel_to_params(path)
    for layer, d in params.items():
        for k in d:
            np.testing.assert_allclose(np.asarray(got[layer][k]),
                                       np.asarray(params[layer][k]),
                                       rtol=1e-6, err_msg=f"{layer}/{k}")


def test_caffemodel_roundtrip_modern_framing(tmp_path):
    """Modern LayerParameter framing incl. type/bottom/top fields the
    importer must skip (like a real Caffe-written artifact)."""
    _export_import_case(tmp_path, legacy=False)


def test_caffemodel_roundtrip_v1_framing(tmp_path):
    """Legacy V1LayerParameter framing (field 2, legacy blob dims) like
    pre-2014 Caffe snapshots — the 2017 artifact's likely format."""
    _export_import_case(tmp_path, legacy=True)


def test_caffe_dropin_activation_parity(tmp_path):
    """The full drop-in path of the reference's artifacts
    (``--weights w.caffemodel --mean mean.binaryproto``): export golden
    activations, reload through the Caffe path, forward must match."""
    from vanishing_points_2017_tpu.models import caffe_export
    from vanishing_points_2017_tpu import weights as wload

    params = cnn.init_params(jax.random.PRNGKey(4), input_size=120,
                             fc_width=64)
    rng = np.random.default_rng(0)
    mean = rng.uniform(0, 30, size=(120, 120)).astype(np.float32)
    img = rng.integers(0, 255, size=(1, 120, 120)).astype(np.uint8)
    golden = np.asarray(cnn.forward(params, cnn.preprocess(
        jnp.asarray(img), jnp.asarray(mean))))

    wpath = str(tmp_path / "weights.caffemodel")
    mpath = str(tmp_path / "mean.binaryproto")
    caffe_export.params_to_caffemodel(jax.tree.map(np.asarray, params),
                                      wpath, legacy=True)
    caffe_export.mean_to_binaryproto(mean, mpath)

    params2, mean2 = wload.load_params_and_mean(wpath, mpath, warn=False)
    out = np.asarray(cnn.forward(params2, cnn.preprocess(
        jnp.asarray(img), jnp.asarray(mean2))))
    np.testing.assert_allclose(out, golden, atol=1e-6)


def test_real_caffemodel_golden_if_present():
    """Drop-in slot for the ORIGINAL 2017 artifact: place
    assets/caffe/weights.caffemodel + assets/caffe/golden.npz (keys
    'sphere_image' uint8 (500,500), 'mean' (500,500), 'prediction'
    (20,20) from a pycaffe forward) and this test validates CNN-forward
    parity against the stored activations."""
    import os

    from vanishing_points_2017_tpu import weights as wload

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wpath = os.path.join(here, "assets", "caffe", "weights.caffemodel")
    gpath = os.path.join(here, "assets", "caffe", "golden.npz")
    if not (os.path.isfile(wpath) and os.path.isfile(gpath)):
        pytest.skip("original caffemodel artifact not available")
    golden = np.load(gpath)
    params, _ = wload.load_params_and_mean(wpath, None, warn=False)
    x = cnn.preprocess(jnp.asarray(golden["sphere_image"][None]),
                       jnp.asarray(golden["mean"]))
    out = np.asarray(cnn.forward(params, x))[0]
    np.testing.assert_allclose(out, golden["prediction"], atol=1e-4)


def test_factorized_forward_matches_dense():
    import jax
    from vanishing_points_2017_tpu.models import factorize

    params = cnn.init_params(jax.random.PRNGKey(3), input_size=100,
                             fc_width=256)
    # plant an exactly-rank-32 fc7 so a rank-64 truncation is lossless and
    # the factorized forward must reproduce the dense forward
    rng = np.random.default_rng(3)
    w_lr = (rng.standard_normal((256, 32)).astype(np.float32) * 0.02) @ \
        (rng.standard_normal((32, 256)).astype(np.float32) * 0.02)
    params["fc7"]["w"] = jnp.asarray(w_lr)
    fact = factorize.factorize_params(params, ranks={"fc7": 64})
    assert fact["fc7"]["u"].shape == (256, 64)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 100, 100, 1))
    dense_out = np.asarray(cnn.forward(params, x))
    fact_out = np.asarray(cnn.forward(
        jax.tree.map(jnp.asarray, fact), x))
    np.testing.assert_allclose(fact_out, dense_out, atol=2e-5)
    # densify(factorize(w)) reconstructs w for rank >= matrix rank
    dense2 = factorize.densify(fact)
    np.testing.assert_allclose(dense2["fc7"]["w"], w_lr, atol=1e-5)


def test_low_rank_truncation_is_best_approx():
    from vanishing_points_2017_tpu.models import factorize

    rng = np.random.default_rng(5)
    # matrix with fast-decaying spectrum, like a trained fc layer
    u = rng.standard_normal((300, 40)).astype(np.float32)
    v = rng.standard_normal((40, 200)).astype(np.float32)
    s = (0.5 ** np.arange(40)).astype(np.float32)
    w = (u * s[None, :]) @ v
    uu, vv = factorize.factorize_layer(w, rank=20)
    err = np.linalg.norm(uu @ vv - w) / np.linalg.norm(w)
    assert err < 1e-4  # spectrum below rank 20 is ~1e-6 of the mass


def test_params_npz_f16_roundtrip(tmp_path):
    import jax
    from vanishing_points_2017_tpu import weights as wload

    params = cnn.init_params(jax.random.PRNGKey(6), input_size=100)
    p = str(tmp_path / "w16.npz")
    wload.params_to_npz(params, p, step=7, dtype=np.float16)
    got, step = wload.params_from_npz(p, with_step=True)
    assert step == 7
    assert got["conv1"]["w"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got["conv1"]["w"]),
                               np.asarray(params["conv1"]["w"]),
                               atol=1e-3, rtol=1e-2)
