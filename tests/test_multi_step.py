"""Multi-step-per-dispatch training: same result as step-by-step."""

import numpy as np
import jax
import jax.numpy as jnp

from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
from tpufcn.models import build
from tpufcn.train.step import (
    init_state, make_multi_train_step, make_train_step, stack_batches)


def _batches(rng, n, B=2):
    out = []
    for _ in range(n):
        out.append({
            "image": rng.random((B, 64, 64, 3), dtype=np.float32) * 255,
            "rects": np.tile(np.array([8.0, 8.0, 24.0, 24.0], np.float32),
                             (B, 4, 1)),
            "labels": rng.integers(0, 2, (B, 4)).astype(np.int32),
            "valid": np.tile(np.array([True, False, False, False]), (B, 1)),
        })
    return out


def test_multi_step_matches_sequential(rng):
    grid = GridConfig(64, 64, 8, 2)
    cfg = TrainConfig(grid=grid, model="vgg_detectnet_train",
                      optimizer="sgd", learning_rate=1e-4, lr_decay_step=0)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    batches = _batches(rng, 3)

    # SGD has no dropout-order-independent randomness issue here: the
    # dropout rng folds identically when starting from the same state.
    s1 = init_state(model, cfg, (1, 64, 64, 3), rng_seed=7)
    step = make_train_step(model, cfg)
    losses_seq = []
    for b in batches:
        s1, m = step(s1, {k: jnp.asarray(v) for k, v in b.items()})
        losses_seq.append(float(m["loss_total"]))

    s2 = init_state(model, cfg, (1, 64, 64, 3), rng_seed=7)
    multi = make_multi_train_step(model, cfg)
    stacked = {k: jnp.asarray(v) for k, v in stack_batches(batches).items()}
    s2, metrics = multi(s2, stacked)

    assert int(s2.step) == 3
    losses_multi = [float(v) for v in metrics["loss_total"]]
    np.testing.assert_allclose(losses_multi, losses_seq, rtol=1e-4)
    # end params agree
    a = np.asarray(s1.params["params"]["cvg/classifier"]["conv"]["bias"])
    b = np.asarray(s2.params["params"]["cvg/classifier"]["conv"]["bias"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_trainer_steps_per_dispatch(rng, tmp_path):
    from tpufcn.train.trainer import Trainer
    grid = GridConfig(64, 64, 8, 2)
    cfg = TrainConfig(grid=grid, model="vgg_detectnet_train",
                      data=DataConfig(batch_size=2),
                      snapshot_every=0, max_iter=4,
                      snapshot_dir=str(tmp_path / "s"), log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    tr = Trainer(cfg, model=model, steps_per_dispatch=2,
                 log_sink=lambda s: None)
    state = tr.fit(iter(_batches(rng, 10)), max_iter=4)
    assert int(state.step) == 4
    assert len(tr.logger.history) == 2   # one log per dispatch


def test_device_batch_cache_edge_cases(rng, tmp_path):
    """n_batches=1 with steps_per_dispatch=1 trains (regression: the 5D
    one-batch cache crashed the single-step path); a steps mismatch
    raises instead of silently training the wrong cadence."""
    import pytest
    from tpufcn.data import DeviceBatchCache
    from tpufcn.train.trainer import Trainer

    grid = GridConfig(64, 64, 8, 2)
    cfg = TrainConfig(grid=grid, model="vgg_detectnet_train",
                      data=DataConfig(batch_size=2),
                      snapshot_every=0, max_iter=2,
                      snapshot_dir=str(tmp_path / "s"), log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    tr = Trainer(cfg, model=model, steps_per_dispatch=1,
                 log_sink=lambda s: None)
    cache = DeviceBatchCache(tr.put, iter(_batches(rng, 1)), n_batches=1)
    state = tr.fit(iter(cache), max_iter=2)
    assert int(state.step) == 2

    tr2 = Trainer(cfg, model=model, steps_per_dispatch=3,
                  log_sink=lambda s: None)
    bad = DeviceBatchCache(tr2.put, iter(_batches(rng, 2)), n_batches=2)
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        tr2.fit(iter(bad), max_iter=6)


def test_device_batch_cache_sharded_mesh(rng, tmp_path):
    """Cache + multi-step dispatch on the fake 8-device CPU mesh: the
    stacked batch is placed with a replicated steps axis + DP/spatial
    inner sharding (put must NOT shard the steps axis), and fit runs."""
    from tpufcn.core.config import MeshConfig
    from tpufcn.core.mesh import make_mesh
    from tpufcn.data import DeviceBatchCache
    from tpufcn.train.trainer import Trainer

    grid = GridConfig(64, 64, 8, 2)
    mcfg = MeshConfig(data=4, space=2)
    cfg = TrainConfig(grid=grid, model="vgg_detectnet_train",
                      data=DataConfig(batch_size=8), mesh=mcfg,
                      snapshot_every=0, max_iter=4,
                      snapshot_dir=str(tmp_path / "s"), log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    tr = Trainer(cfg, model=model, mesh=make_mesh(mcfg),
                 steps_per_dispatch=2, log_sink=lambda s: None)
    cache = DeviceBatchCache(tr.put, iter(_batches(rng, 2, B=8)),
                             n_batches=2)
    img = cache.batch["image"]
    assert img.ndim == 5
    # steps axis replicated: each device shard spans all N steps
    shard_shape = img.sharding.shard_shape(img.shape)
    assert shard_shape[0] == img.shape[0]
    assert shard_shape[1] == img.shape[1] // 4      # B over data axis
    assert shard_shape[2] == img.shape[2] // 2      # H over space axis
    state = tr.fit(iter(cache), max_iter=4)
    assert int(state.step) == 4


def test_device_batch_cache_epoch_training(rng, tmp_path):
    """DeviceBatchCache: one upload, epoch reuse — fit() result matches
    feeding the same host batches over and over through put()."""
    from tpufcn.data import DeviceBatchCache
    from tpufcn.train.trainer import Trainer
    import itertools

    grid = GridConfig(64, 64, 8, 2)
    cfg = TrainConfig(grid=grid, model="vgg_detectnet_train",
                      data=DataConfig(batch_size=2),
                      snapshot_every=0, max_iter=6,
                      snapshot_dir=str(tmp_path / "a"), log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    batches = _batches(rng, 2)

    tr1 = Trainer(cfg, model=model, steps_per_dispatch=2,
                  log_sink=lambda s: None)
    cache = DeviceBatchCache(tr1.put, iter(batches), n_batches=2)
    s1 = tr1.fit(iter(cache), max_iter=6)           # 3 epochs over 2 batches
    assert int(s1.step) == 6

    import dataclasses
    cfg2 = dataclasses.replace(cfg, snapshot_dir=str(tmp_path / "b"))
    tr2 = Trainer(cfg2, model=model, steps_per_dispatch=2,
                  log_sink=lambda s: None)
    s2 = tr2.fit(itertools.cycle(batches), max_iter=6)
    np.testing.assert_allclose(
        np.asarray(s1.params["params"]["cvg/classifier"]["conv"]["bias"]),
        np.asarray(s2.params["params"]["cvg/classifier"]["conv"]["bias"]),
        rtol=1e-5, atol=1e-7)
