"""Train step tests: loss semantics, single-device step, and the
multi-device (data x space) sharded step on the fake 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufcn.core.config import GridConfig, MeshConfig, TrainConfig
from tpufcn.core.mesh import make_mesh
from tpufcn.models import build
from tpufcn.ops.grid_codec import encode_grid_labels_batch, GridLabels
from tpufcn.train.losses import (
    detectnet_loss, l1_loss_caffe, euclidean_loss_caffe, seg_loss)
from tpufcn.train.step import make_train_step, init_state, batch_sharding


def _tiny_cfg(**kw):
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    return TrainConfig(grid=grid, model="vgg_detectnet_train", **kw)


def _batch(rng, B, H, W, M=4, C=2):
    return {
        "image": rng.random((B, H, W, 3), dtype=np.float32),
        "rects": np.tile(np.array([8.0, 8.0, 24.0, 24.0], np.float32),
                         (B, M, 1)),
        "labels": rng.integers(0, C, size=(B, M)).astype(np.int32),
        "valid": np.tile(np.array([True] + [False] * (M - 1)), (B, 1)),
    }


def test_caffe_loss_normalizations(rng):
    a = rng.random((4, 3, 3, 2), dtype=np.float32)
    b = rng.random((4, 3, 3, 2), dtype=np.float32)
    np.testing.assert_allclose(
        float(l1_loss_caffe(jnp.asarray(a), jnp.asarray(b))),
        np.abs(a - b).sum() / 4, rtol=1e-5)
    np.testing.assert_allclose(
        float(euclidean_loss_caffe(jnp.asarray(a), jnp.asarray(b))),
        ((a - b) ** 2).sum() / 8, rtol=1e-5)
    logits = rng.random((2, 4, 4, 3), dtype=np.float32)
    lab = rng.integers(0, 3, size=(2, 4, 4)).astype(np.int32)
    got = float(seg_loss(jnp.asarray(logits), jnp.asarray(lab), False))
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want = -np.log(np.take_along_axis(p, lab[..., None], -1)).sum() / 2
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_detectnet_loss_zero_when_perfect(rng):
    """If predictions equal the (masked) labels exactly, bbox loss is 0."""
    grid = GridConfig(64, 64, 8, 2)
    b = _batch(rng, 2, 64, 64)
    labels = encode_grid_labels_batch(b["rects"], b["labels"], b["valid"], grid)
    outputs = {"coverage": labels.coverage, "bboxes": labels.bbox}
    total, m = detectnet_loss(outputs, labels)
    # pred side multiplies by coverage_block -> masked bbox equals label
    np.testing.assert_allclose(float(m["loss_bbox"]), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(m["loss_coverage"]), 0.0, atol=1e-6)


def test_train_step_single_device(rng):
    cfg = _tiny_cfg()
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    state = init_state(model, cfg, (1, 64, 64, 3))
    step = make_train_step(model, cfg)
    b = {k: jnp.asarray(v) for k, v in _batch(rng, 2, 64, 64).items()}
    # snapshot one leaf before the step (state buffers are donated)
    before = np.asarray(
        state.params["params"]["cvg/classifier"]["conv"]["bias"]).copy()
    state2, metrics = step(state, b)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))
    after = np.asarray(state2.params["params"]["cvg/classifier"]["conv"]["bias"])
    assert np.abs(after - before).sum() > 0  # params actually moved


def test_sharded_step_hlo_contains_collectives(rng):
    """Compilation-level evidence for SURVEY §2.3: the DP axis inserts
    gradient all-reduces, and the spatial axis inserts the conv halo
    exchange (collective-permute) — not just 'it runs'."""
    cfg = _tiny_cfg(mesh=MeshConfig(data=4, space=2))
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    mesh = make_mesh(MeshConfig(data=4, space=2))
    state = init_state(model, cfg, (1, 64, 64, 3))
    step = make_train_step(model, cfg, mesh=mesh)
    raw = _batch(rng, 8, 64, 64)
    sh = batch_sharding(mesh)
    b = {k: jax.device_put(jnp.asarray(v), sh[k]) for k, v in raw.items()}
    hlo = step.lower(state, b).compile().as_text()
    assert "all-reduce" in hlo          # DP gradient sync
    assert "collective-permute" in hlo  # spatial halo exchange


def test_sharded_step_matches_single_device(rng):
    """DP(+spatial) sharding is a pure execution strategy: the (4,2)
    mesh step must produce the same loss and updated params as the
    unsharded step on the identical batch (threefry dropout bits are
    sharding-invariant; only reduction order may differ)."""
    cfg = _tiny_cfg(mesh=MeshConfig(data=4, space=2))
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    raw = _batch(rng, 8, 64, 64)

    s0 = init_state(model, cfg, (1, 64, 64, 3), rng_seed=3)
    step_single = make_train_step(model, _tiny_cfg())
    s1, m1 = step_single(s0, {k: jnp.asarray(v) for k, v in raw.items()})

    mesh = make_mesh(MeshConfig(data=4, space=2))
    s0b = init_state(model, cfg, (1, 64, 64, 3), rng_seed=3)
    step_mesh = make_train_step(model, cfg, mesh=mesh)
    sh = batch_sharding(mesh)
    b = {k: jax.device_put(jnp.asarray(v), sh[k]) for k, v in raw.items()}
    s2, m2 = step_mesh(s0b, b)

    np.testing.assert_allclose(float(m1["loss_total"]),
                               float(m2["loss_total"]), rtol=1e-4)
    la = np.asarray(s1.params["params"]["cvg/classifier"]["conv"]["kernel"])
    lb = np.asarray(s2.params["params"]["cvg/classifier"]["conv"]["kernel"])
    np.testing.assert_allclose(la, lb, rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_train_step_sharded_mesh(rng, mesh_shape):
    """Full DP(+spatial) sharded step on the fake 8-device CPU mesh."""
    d, s = mesh_shape
    mesh = make_mesh(MeshConfig(data=d, space=s))
    cfg = _tiny_cfg(mesh=MeshConfig(data=d, space=s))
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    state = init_state(model, cfg, (1, 64, 64, 3))
    step = make_train_step(model, cfg, mesh=mesh)

    B = 8
    raw = _batch(rng, B, 64, 64)
    sh = batch_sharding(mesh)
    b = {k: jax.device_put(jnp.asarray(v), sh[k]) for k, v in raw.items()}
    state2, metrics = step(state, b)
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state2.step) == 1


def test_googlenet_train_step_backward():
    """One optimizer step through the GoogLeNet stem + fused-inception
    convs in bf16 (regression: the fused 1x1 conv and the space-to-depth
    stem conv used a float32 accumulator whose conv-transpose this jax
    version rejects — training the flagship crashed while vgg trained
    fine)."""
    import jax.numpy as jnp
    from tpufcn.core.config import GridConfig, TrainConfig
    from tpufcn.models import build
    from tpufcn.train.step import init_state, make_train_step

    grid = GridConfig(im_width=64, im_height=64, stride=16, num_classes=1)
    cfg = TrainConfig(grid=grid, model="googlenet_detectnet_1cls")
    model = build("googlenet_detectnet_1cls", dtype=jnp.bfloat16)
    state = init_state(model, cfg, (1, 64, 64, 3))
    step = make_train_step(model, cfg, preprocessing="shift127")
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32),
        "rects": np.tile(np.array([8., 8., 40., 40.], np.float32), (2, 2, 1)),
        "labels": np.zeros((2, 2), np.int32),
        "valid": np.tile(np.array([True, False]), (2, 1)),
    }
    state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(metrics["loss_total"]))


def test_with_seg_requires_seg_batch(rng):
    """with_seg=True over a batch with no 'seg' masks (e.g. record-shard
    batches) must fail at trace time, not silently train the seg head
    on nothing."""
    import pytest
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.models import build
    from tpufcn.train.step import init_state, make_train_step

    grid = GridConfig(32, 32, stride=8, num_classes=3)
    cfg = TrainConfig(grid=grid, data=DataConfig(batch_size=1),
                      model="fcn8s_bbox", optimizer="sgd",
                      learning_rate=1e-8, max_iter=1)
    model = build("fcn8s_bbox", num_classes=3)
    state = init_state(model, cfg, (1, 32, 32, 3), rng_seed=0)
    step = make_train_step(model, cfg, with_seg=True, label_offset=1)
    batch = {
        "image": rng.integers(0, 255, (1, 32, 32, 3)).astype(np.uint8),
        "rects": np.zeros((1, 2, 4), np.float32),
        "labels": np.zeros((1, 2), np.int32),
        "valid": np.zeros((1, 2), bool),
    }
    with pytest.raises(ValueError, match="no 'seg' masks"):
        step(state, batch)


def test_iter_size_matches_manual_grad_average(rng):
    """Caffe iter_size semantics oracle (reference
    train/bounding_box/solver.prototxt:5): one update from the MEAN of
    the per-micro-batch gradients, each micro-batch with its own
    dropout rng drawn from the step's split schedule."""
    from tpufcn.train.step import make_loss_fn, make_grads_fn, stack_batches

    cfg = _tiny_cfg(iter_size=2)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    state = init_state(model, cfg, (1, 64, 64, 3))
    b1 = {k: jnp.asarray(v) for k, v in _batch(rng, 2, 64, 64).items()}
    b2 = {k: jnp.asarray(v) for k, v in _batch(rng, 2, 64, 64).items()}

    # manual: two independent grads at the SAME params, averaged —
    # computed BEFORE the jitted step donates the state buffers
    loss_fn = make_loss_fn(model, cfg)
    rng0, _ = jax.random.split(state.dropout_rng)
    r = jax.random.split(rng0, 2)
    g1, m1 = jax.grad(loss_fn, has_aux=True)(state.params, b1, r[0])
    g2, m2 = jax.grad(loss_fn, has_aux=True)(state.params, b2, r[1])
    want_g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    want_loss = (float(m1["loss_total"]) + float(m2["loss_total"])) / 2
    want_kernel = np.asarray(jax.tree_util.tree_map(
        lambda p, g: p, state.params, want_g)
        ["params"]["cvg/classifier"]["conv"]["kernel"]).copy()
    # reference update through the same optimizer
    ref_state = init_state(model, cfg, (1, 64, 64, 3))
    ref_state = ref_state.apply_gradients(grads=want_g)
    ref_kernel = np.asarray(
        ref_state.params["params"]["cvg/classifier"]["conv"]["kernel"])

    # accumulated grads_fn equals the manual average exactly
    gfn = make_grads_fn(loss_fn, 2)
    acc_g, acc_m = gfn(state.params, stack_batches([b1, b2]),
                       rng0)
    for a, b in zip(jax.tree_util.tree_leaves(acc_g),
                    jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(acc_m["loss_total"]), want_loss,
                               rtol=1e-5)

    # the full jitted step applies that averaged gradient
    step = make_train_step(model, cfg)
    state2, metrics = step(state, stack_batches([b1, b2]))
    assert int(state2.step) == 1
    got_kernel = np.asarray(
        state2.params["params"]["cvg/classifier"]["conv"]["kernel"])
    np.testing.assert_allclose(got_kernel, ref_kernel, rtol=1e-4,
                               atol=1e-7)
    assert np.abs(got_kernel - want_kernel).sum() > 0  # params moved


def test_iter_size_sharded_mesh(rng):
    """iter_size accumulation over the (4,2) DP+spatial mesh: leading
    micro-batch axis replicated, inner axes batch-sharded."""
    from tpufcn.train.step import stack_batches

    mesh = make_mesh(MeshConfig(data=4, space=2))
    cfg = _tiny_cfg(iter_size=2, mesh=MeshConfig(data=4, space=2))
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    state = init_state(model, cfg, (1, 64, 64, 3))
    step = make_train_step(model, cfg, mesh=mesh)
    b1 = _batch(rng, 8, 64, 64)
    b2 = _batch(rng, 8, 64, 64)
    stacked = stack_batches([b1, b2])
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = batch_sharding(mesh)
    b = {k: jax.device_put(jnp.asarray(v),
                           NamedSharding(mesh, P(None, *sh[k].spec)))
         for k, v in stacked.items()}
    state2, metrics = step(state, b)
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state2.step) == 1


def test_iter_size_multi_step_rejected():
    cfg = _tiny_cfg(iter_size=2)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    from tpufcn.train.step import make_multi_train_step
    with pytest.raises(ValueError, match="iter_size"):
        make_multi_train_step(model, cfg)


def test_warmup_schedule_lr_values():
    """warmup_steps prepends a linear 0->lr ramp; the step-decay
    boundaries count from the END of the warmup (config.py
    warmup_steps — the from-scratch stabilizer the reference never
    needed because its recipes fine-tune from pretrained weights)."""
    from tpufcn.train.step import make_optimizer
    import optax

    cfg = _tiny_cfg(learning_rate=1e-3, warmup_steps=10,
                    lr_decay_step=100, lr_gamma=0.1)
    # reconstruct the schedule the optimizer was built from
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
         optax.exponential_decay(cfg.learning_rate, cfg.lr_decay_step,
                                 cfg.lr_gamma, staircase=True)],
        [cfg.warmup_steps])
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 5e-4) < 1e-9
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert abs(float(sched(109)) - 1e-3) < 1e-9   # decay at warmup+100
    assert abs(float(sched(110)) - 1e-4) < 1e-9

    # and the real optimizer applies a zero first-step update, ramping up
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    st = opt.init(params)
    g = {"w": jnp.ones((3,))}
    up0, st = opt.update(g, st, params)
    up1, st = opt.update(g, st, params)
    assert float(jnp.abs(up0["w"]).max()) == 0.0        # lr 0 at step 0
    assert float(jnp.abs(up1["w"]).max()) > 0.0


def test_warmup_zero_is_parity_default():
    from tpufcn.train.step import make_optimizer
    cfg = _tiny_cfg(learning_rate=1e-3, warmup_steps=0, lr_decay_step=0)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones((2,))}
    st = opt.init(params)
    up, _ = opt.update({"w": jnp.ones((2,))}, st, params)
    assert float(jnp.abs(up["w"]).max()) > 0.0
