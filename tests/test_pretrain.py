"""Backbone pretraining (tpufcn/train/pretrain.py): the in-repo
reproduction of the reference's fine-tune-from-pretrained workflow
(reference train/bounding_box/train.sh:14 seeds VGG16 from the ILSVRC
caffemodel; here a hardbench-crop classifier exports the seed).

Covers: the crop-bank renderer's label/shape contract, the
train -> export -> lenient-by-name seeding round trip into a detection
model, and the gate plumbing (_train_hard weights=)."""

import numpy as np
import jax.numpy as jnp

from tpufcn.train.pretrain import (
    cached_vgg16_pretrain, pretrain_vgg16, render_cls_dataset)


def test_render_cls_dataset_contract():
    imgs, labs = render_cls_dataset(classes=4, n=64, size=32, seed=3)
    assert imgs.shape == (64, 32, 32, 3) and imgs.dtype == np.uint8
    assert labs.shape == (64,) and labs.dtype == np.int32
    # all of: real classes, the distractor bucket, pure background
    assert set(np.unique(labs)) <= set(range(6))
    assert labs.max() >= 4
    # deterministic for a fixed seed
    imgs2, labs2 = render_cls_dataset(classes=4, n=64, size=32, seed=3)
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(labs, labs2)


def test_pretrain_export_seeds_detection_model(tmp_path):
    """Tiny pretrain -> .caffemodel -> resolve_weights into
    VGGDetectNet: every backbone conv must carry over by name; the
    classifier head must NOT leak in (lenient seeding drops it)."""
    import jax
    from tpufcn.convert import resolve_weights
    from tpufcn.models import build

    out = str(tmp_path / "vgg16.caffemodel")
    res = pretrain_vgg16(out, classes=2, steps=2, batch=4, size=32,
                         n_bank=16, steps_per_dispatch=1)
    assert res["path"] == out and res["steps"] == 2

    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=3)
    init = jax.jit(model.init)(jax.random.key(0),
                               jnp.zeros((1, 32, 32, 3), jnp.float32))
    seeded = resolve_weights(out, lambda: init)
    # backbone convs replaced (pretrained != fresh init) ...
    k0 = np.asarray(init["params"]["backbone"]["conv1_1"]["conv"]["kernel"])
    k1 = np.asarray(
        seeded["params"]["backbone"]["conv1_1"]["conv"]["kernel"])
    assert k0.shape == k1.shape
    assert not np.allclose(k0, k1)
    # ... while the head layers keep their fresh init (name mismatch)
    h0 = np.asarray(init["params"]["cvg/classifier"]["conv"]["kernel"])
    h1 = np.asarray(seeded["params"]["cvg/classifier"]["conv"]["kernel"])
    np.testing.assert_array_equal(h0, h1)


def test_cached_pretrain_reuses_file(tmp_path, monkeypatch):
    calls = []

    def fake_pretrain(path, **kw):
        calls.append(path)
        open(path, "wb").write(b"x")
        return {"path": path}

    monkeypatch.setattr("tpufcn.train.pretrain.pretrain_vgg16",
                        fake_pretrain)
    p1 = cached_vgg16_pretrain(str(tmp_path), steps=10)
    p2 = cached_vgg16_pretrain(str(tmp_path), steps=10)
    assert p1 == p2 and len(calls) == 1
    p3 = cached_vgg16_pretrain(str(tmp_path), steps=20)  # distinct config
    assert p3 != p1 and len(calls) == 2
