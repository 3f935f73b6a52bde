"""Model zoo shape/structure tests (CPU, small inputs where possible)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufcn.models import build, get_spec, names


@pytest.mark.parametrize("name,hw,exp_grid", [
    ("googlenet_detectnet", (224, 224), 14),       # stride 16
    ("vgg_detectnet_train", (224, 224), 28),       # stride 8
    ("fcn8s_bbox", (96, 96), 12),                  # stride 8
])
def test_detection_model_shapes(name, hw, exp_grid):
    spec = get_spec(name)
    model = build(name, dtype=jnp.float32)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    C = spec.grid.num_classes
    assert out["coverage"].shape == (1, exp_grid, exp_grid, C)
    assert out["bboxes"].shape == (1, exp_grid, exp_grid, 4 * C)
    cov = np.asarray(out["coverage"])
    assert (cov >= 0).all() and (cov <= 1).all()


def test_pyramid_model_shapes():
    # pyramid pooling needs the full 448 deploy geometry
    model = build("vgg_pyramid_detectnet", dtype=jnp.float32)
    x = jnp.zeros((1, 448, 448, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["coverage"].shape == (1, 28, 28, 20)
    assert out["bboxes"].shape == (1, 28, 28, 80)


def test_fcn8s_seg_full_res():
    model = build("fcn8s_bbox", dtype=jnp.float32)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["seg"].shape == (1, 96, 96, 11)
    # coverage is a softmax -> sums to 1 over classes
    s = np.asarray(out["coverage"]).sum(-1)
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)


def test_fcn32s_shapes():
    model = build("fcn32s_seg", dtype=jnp.float32)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["seg"].shape == (1, 96, 96, 12)


def test_registry_complete():
    # every SURVEY.md model family (C16-C19) is represented
    have = names()
    for required in ("googlenet_detectnet", "googlenet_detectnet_1cls",
                     "googlenet_detectnet_3cls", "vgg_detectnet_train",
                     "vgg_pyramid_detectnet", "fcn8s_bbox", "fcn32s_seg",
                     "fcn8s_bbox_serving", "fcn32s_seg_serving"):
        assert required in have


def test_fcn_store_dtype_agrees_with_exact(rng):
    """e5m2 backbone storage on FCN-32s: seg logits close to exact."""
    from tpufcn.models import build
    exact = build("fcn32s_seg", dtype=jnp.float32)
    fast = build("fcn32s_seg", dtype=jnp.float32,
                 store_dtype=jnp.float8_e5m2)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    p = exact.init(jax.random.key(0), x)
    a = exact.apply(p, x)["score"]     # softmax class probabilities
    b = fast.apply(p, x)["score"]
    assert float(jnp.abs(a - b).mean()) < 0.02
    assert a.shape == b.shape


def test_serving_preset_checkpoint_compatible():
    """googlenet_detectnet_serving: same param tree as the flagship
    (checkpoints interchange; only activation STORAGE dtypes differ)."""
    import jax.tree_util as jtu
    exact = build("googlenet_detectnet", dtype=jnp.bfloat16)
    serving = build("googlenet_detectnet_serving", dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    pe = exact.init(jax.random.key(0), x)
    ps = serving.init(jax.random.key(0), x)
    assert (jtu.tree_structure(pe) == jtu.tree_structure(ps))
    assert all(a.shape == b.shape for a, b in
               zip(jtu.tree_leaves(pe), jtu.tree_leaves(ps)))
    out = serving.apply(pe, x)           # exact's params serve directly
    assert out["coverage"].shape == (1, 4, 4, 4)


@pytest.mark.parametrize("exact_name,serving_name,hw", [
    ("fcn8s_bbox", "fcn8s_bbox_serving", (96, 96)),
    ("fcn32s_seg", "fcn32s_seg_serving", (96, 96)),
])
def test_fcn_serving_presets_checkpoint_compatible(exact_name, serving_name,
                                                   hw):
    """FCN-family serving presets: same param tree as the exact model
    (checkpoints interchange; only activation STORAGE dtypes differ)."""
    import jax.tree_util as jtu
    exact = build(exact_name, dtype=jnp.bfloat16)
    serving = build(serving_name, dtype=jnp.bfloat16)
    x = jnp.zeros((1, *hw, 3), jnp.bfloat16)
    pe = exact.init(jax.random.key(0), x)
    ps = serving.init(jax.random.key(0), x)
    assert jtu.tree_structure(pe) == jtu.tree_structure(ps)
    assert all(a.shape == b.shape for a, b in
               zip(jtu.tree_leaves(pe), jtu.tree_leaves(ps)))
    oe = exact.apply(pe, x)
    os_ = serving.apply(pe, x)           # exact's params serve directly
    for k in oe:
        assert oe[k].shape == os_[k].shape
        # e5m2 storage perturbs but must not derail the outputs
        a = np.asarray(oe[k], np.float64)
        b = np.asarray(os_[k], np.float64)
        assert np.isfinite(b).all()


def test_googlenet_param_names():
    model = build("googlenet_detectnet", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    # caffe-mirroring module names for the converter
    assert "conv1/7x7_s2" in params
    assert "inception_3a" in params and "5x5_reduce" in params["inception_3a"]
    assert "cvg/classifier" in params and "bbox/regressor" in params


def test_fcn8s_serving_keeps_head_taps_exact():
    """fcn8s_bbox_serving quantizes ONLY backbone stages 1-2: the taps
    its score heads read directly (pool3/pool4/conv5_3) must stay in
    the compute dtype — full-backbone e5m2 measured a trained-mAP
    collapse 0.68 -> 0.20 (BENCH.md)."""
    from tpufcn.models.vgg import VGG16Backbone

    bb = VGG16Backbone(dtype=jnp.bfloat16,
                       store_dtype=jnp.float8_e5m2, store_stages=2)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    taps = bb.apply(bb.init(jax.random.key(0), x), x)
    assert taps["pool1"].dtype == jnp.float8_e5m2      # stage 1 stored
    assert taps["pool2"].dtype == jnp.float8_e5m2      # stage 2 stored
    for tap in ("pool3", "pool4", "conv5_3"):          # head inputs exact
        assert taps[tap].dtype == jnp.bfloat16, tap
