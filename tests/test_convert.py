"""Converter tests: protobuf wire round-trip, layout transforms (torch as
the independent conv oracle), and a full GoogLeNet weight round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tpufcn.convert import (
    load_caffemodel, write_caffemodel, convert_caffemodel,
    export_caffemodel, conv_blob_to_hwio)
from tpufcn.models import build


def test_pb_roundtrip(tmp_path, rng):
    layers = {
        "conv1": [rng.standard_normal((8, 3, 5, 5), dtype=np.float32),
                  rng.standard_normal(8, dtype=np.float32)],
        "fc/odd name": [rng.standard_normal((4, 8, 1, 1), dtype=np.float32)],
    }
    p = str(tmp_path / "w.caffemodel")
    write_caffemodel(p, layers)
    got = load_caffemodel(p)
    assert set(got) == set(layers)
    for k in layers:
        assert len(got[k]) == len(layers[k])
        for a, b in zip(got[k], layers[k]):
            np.testing.assert_array_equal(a, b)


def test_conv_layout_matches_torch(rng):
    """A Caffe-layout blob converted to HWIO must make our NHWC conv agree
    with torch's NCHW conv using the raw blob."""
    blob = rng.standard_normal((6, 3, 3, 3), dtype=np.float32)
    x = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
    want = F.conv2d(torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
                    torch.from_numpy(blob), padding=1)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(conv_blob_to_hwio(blob)),
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want.numpy(), 1, -1), rtol=1e-4, atol=1e-5)


def test_googlenet_full_roundtrip(tmp_path, rng):
    """export -> load -> convert reproduces every conv param exactly and
    the model forward gives identical outputs."""
    model = build("googlenet_detectnet", dtype=jnp.float32)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32) * 255)
    params = model.init(jax.random.key(0), x)

    p = str(tmp_path / "gnet.caffemodel")
    export_caffemodel(params, p)
    # fresh init with a different seed, then load the exported weights
    params2 = model.init(jax.random.key(1), x)
    restored = convert_caffemodel(params2, p)

    flat_a = jax.tree_util.tree_leaves_with_path(params["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(restored["params"]))
    # same leaf set, same values
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[tuple(path)]),
                                      err_msg=str(path))

    out_a = model.apply(params, x)
    out_b = model.apply(restored, x)
    np.testing.assert_array_equal(np.asarray(out_a["coverage"]),
                                  np.asarray(out_b["coverage"]))


def test_convert_rejects_shape_mismatch(tmp_path, rng):
    model = build("googlenet_detectnet", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    bad = {"cvg/classifier": [rng.standard_normal((7, 1024, 1, 1),
                                                  dtype=np.float32)]}
    p = str(tmp_path / "bad.caffemodel")
    write_caffemodel(p, bad)
    import pytest
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_caffemodel(params, p)


def test_legacy_4d_bias_blob_is_squeezed(rng, monkeypatch):
    """Legacy (V1LayerParameter) caffemodels parse biases as 4-D
    num/channels/height/width blobs; they must load, not silently drop
    (regression: dropped biases left legacy pretrained nets all-zero)."""
    import tpufcn.convert.convert as cc
    model = build("googlenet_detectnet", dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    kshape = np.asarray(
        params["params"]["cvg/classifier"]["conv"]["kernel"]).shape  # HWIO
    w = rng.standard_normal(
        (kshape[3], kshape[2], kshape[0], kshape[1]), dtype=np.float32)
    bias = rng.standard_normal((kshape[3],), dtype=np.float32)
    monkeypatch.setattr(cc, "load_caffemodel", lambda _: {
        "cvg/classifier": [w, bias.reshape(1, 1, 1, -1)]})
    out = cc.convert_caffemodel(params, "/nonexistent", strict=False)
    np.testing.assert_allclose(
        np.asarray(out["params"]["cvg/classifier"]["conv"]["bias"]), bias)

    # single-channel head: a (1, 1, 1, 1) bias squeezes to 0-d and must
    # STILL load as shape (1,) (strict mode used to reject it)
    model1 = build("googlenet_detectnet_1cls", dtype=jnp.float32)
    params1 = model1.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    k1 = np.asarray(
        params1["params"]["cvg/classifier"]["conv"]["kernel"]).shape
    w1 = rng.standard_normal((k1[3], k1[2], k1[0], k1[1]), dtype=np.float32)
    b1 = rng.standard_normal((1,), dtype=np.float32)
    monkeypatch.setattr(cc, "load_caffemodel", lambda _: {
        "cvg/classifier": [w1, b1.reshape(1, 1, 1, 1)]})
    out1 = cc.convert_caffemodel(params1, "/nonexistent", strict=True)
    np.testing.assert_allclose(
        np.asarray(out1["params"]["cvg/classifier"]["conv"]["bias"]), b1)


def test_vgg_ilsvrc_name_mapping(tmp_path, rng):
    """The reference fine-tunes from VGG16 ILSVRC weights
    (train/bounding_box/train.sh --weights); those caffemodels use bare
    layer names (conv1_1 ...) that must suffix-match our backbone paths."""
    import jax
    import jax.numpy as jnp
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    blob = rng.standard_normal((64, 3, 3, 3), dtype=np.float32)
    bias = rng.standard_normal(64, dtype=np.float32)
    p = str(tmp_path / "vgg.caffemodel")
    write_caffemodel(p, {"conv1_1": [blob, bias]})
    out = convert_caffemodel(params, p, strict=True)
    got = np.asarray(out["params"]["backbone"]["conv1_1"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, conv_blob_to_hwio(blob))
    np.testing.assert_array_equal(
        np.asarray(out["params"]["backbone"]["conv1_1"]["conv"]["bias"]),
        bias)


def test_truncated_caffemodel_raises(tmp_path, rng):
    """A truncated .caffemodel must fail LOUDLY: the old parser sliced
    short past EOF, returned a flat blob, and convert_caffemodel then
    skipped the layer via its ndim!=4 branch — leaving RANDOM init in
    place even under strict=True."""
    import pytest
    layers = {
        "conv1": [rng.standard_normal((8, 3, 5, 5), dtype=np.float32),
                  rng.standard_normal(8, dtype=np.float32)],
    }
    p = str(tmp_path / "w.caffemodel")
    write_caffemodel(p, layers)
    raw = open(p, "rb").read()
    for cut in (len(raw) - 17, len(raw) // 2):
        pt = str(tmp_path / f"t{cut}.caffemodel")
        with open(pt, "wb") as f:
            f.write(raw[:cut])
        with pytest.raises(ValueError, match="truncated"):
            load_caffemodel(pt)


def test_blob_shape_data_mismatch_raises(tmp_path):
    """A blob whose declared shape disagrees with its data size (corrupt
    file, partial write at a record boundary) raises instead of parsing
    as an unshaped flat array."""
    import pytest
    from tpufcn.convert.caffe_pb import _field, _len_field, _varint

    # BlobProto: shape (2, 3) but only 5 floats of data
    shape_msg = _field(1, 0, _varint(2)) + _field(1, 0, _varint(3))
    data = np.arange(5, dtype="<f4").tobytes()
    blob = _len_field(7, shape_msg) + _len_field(5, data)
    layer = _len_field(1, b"conv1") + _len_field(7, blob)
    body = _len_field(1, b"net") + _len_field(100, layer)
    p = str(tmp_path / "bad.caffemodel")
    with open(p, "wb") as f:
        f.write(body)
    with pytest.raises(ValueError, match="does not match declared shape"):
        load_caffemodel(p)
