"""End-to-end detector pipeline test: plant a synthetic detection in the
model-free path by driving decode+NMS through the Detector plumbing, and
smoke-test the full jitted pipeline with random weights."""

import numpy as np
import jax.numpy as jnp

from tpufcn.core.config import DetectorConfig, GridConfig
from tpufcn.serve.detector import Detector


def test_detector_end_to_end_smoke(rng):
    det = Detector("googlenet_detectnet", dtype=jnp.float32,
                   max_candidates=64)
    frames = rng.integers(0, 256, size=(2, 448, 448, 3)).astype(np.uint8)
    result = det(frames)
    C = det.num_fg
    assert result.boxes.shape == (2, C, 64, 4)
    assert result.confidence.shape == (2, C, 64)
    assert result.valid.shape == (2, C, 64)
    lists = result.to_lists()
    assert len(lists) == 2


def test_detector_finds_planted_object(rng):
    """Overwrite the head params so that coverage fires on a block of
    cells with consistent bbox offsets -> the pipeline must return exactly
    one grouped detection at the right place."""
    det = Detector("googlenet_detectnet_1cls", dtype=jnp.float32,
                   max_candidates=128)
    g = det.grid

    # Build synthetic head outputs by hijacking cvg/bbox conv biases with
    # zeroed kernels: coverage = sigmoid(bias), bbox = bias (same offsets
    # for every cell -> candidates equal per-cell origin + offset).
    params = jax.tree_util.tree_map(lambda a: a, det.params)  # shallow copy
    import jax as _jax
    p = params["params"]
    cvg = p["cvg/classifier"]["conv"]
    bbox = p["bbox/regressor"]["conv"]
    cvg["kernel"] = jnp.zeros_like(cvg["kernel"])
    # bias >> 0 -> sigmoid ~ 1 -> every cell above threshold
    cvg["bias"] = jnp.full_like(cvg["bias"], 8.0)
    bbox["kernel"] = jnp.zeros_like(bbox["kernel"])
    # constant offsets: a 64x48 box anchored at each cell origin
    bbox["bias"] = jnp.asarray([0.0, 0.0, 64.0, 48.0])
    det.params = params

    frames = rng.integers(0, 256, size=(1, 448, 448, 3)).astype(np.uint8)
    res = det(frames)
    v = np.asarray(res.valid)[0, 0]
    boxes = np.asarray(res.boxes)[0, 0][v]
    conf = np.asarray(res.confidence)[0, 0][v]
    # every cell proposes a box shifted by its own origin; neighbours
    # within eps group together -> at least one strong detection
    assert v.sum() >= 1
    assert (conf > 0).all()
    # heights are >= 20 (the min-height filter) and boxes lie in-frame
    assert (boxes[:, 3] - boxes[:, 1] >= 20).all()
    assert (boxes >= 0).all() and (boxes[:, 2] <= 448).all()


import jax  # noqa: E402  (used inside test body)


def test_fp8_serving_mode_agrees_with_exact(rng):
    """store_dtype=f8e5m2 serving mode: coverage maps stay close to the
    exact bf16 model and the detector pipeline runs end to end."""
    import jax.numpy as jnp
    from tpufcn.serve.detector import Detector
    base = Detector("googlenet_detectnet_1cls", dtype=jnp.bfloat16,
                    max_candidates=64)
    fast = Detector("googlenet_detectnet_1cls", dtype=jnp.bfloat16,
                    max_candidates=64, params=base.params,
                    model_kwargs={"store_dtype": jnp.float8_e5m2,
                                  "store_blocks": True, "store_stem2": True})
    frames = rng.integers(0, 256, (2, 448, 448, 3)).astype(np.uint8)
    x = jnp.asarray(frames)
    a = base.model.apply(base.params, x)["coverage"]
    b = fast.model.apply(fast.params, x)["coverage"]
    # sigmoid outputs: fp8 activation storage drifts by a few percent
    assert float(jnp.abs(a - b).mean()) < 0.05
    r = fast(frames)
    assert r.boxes.shape[0] == 2


def test_detector_mesh_sharded_serving_matches(rng):
    """Multi-chip DP serving (shard_map over the data axis): identical
    DetectionResult to the single-device detector on the same frames
    (per-example pipeline — sharding is pure execution strategy)."""
    import jax.numpy as jnp
    from tpufcn.core.config import DetectorConfig, GridConfig, MeshConfig
    from tpufcn.core.mesh import make_mesh
    from tpufcn.serve.detector import Detector

    cfg = DetectorConfig(grid=GridConfig(64, 64, stride=8, num_classes=2),
                         model="vgg_detectnet_train", max_candidates=32)
    base = Detector("vgg_detectnet_train", config=cfg, dtype=jnp.float32,
                    model_kwargs={"num_classes": 2})
    mesh = make_mesh(MeshConfig(data=8, space=1))
    sharded = Detector("vgg_detectnet_train", config=cfg, dtype=jnp.float32,
                       params=base.params, model_kwargs={"num_classes": 2},
                       mesh=mesh)
    frames = rng.integers(0, 256, (8, 64, 64, 3)).astype(np.uint8)
    a = base(frames)
    b = sharded(frames)
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.confidence),
                               np.asarray(b.confidence), rtol=1e-6)


def test_detector_spatial_mesh_serving_matches(rng):
    """Spatially-sharded serving (data=2, space=4): the conv stack is
    GSPMD-partitioned over activation rows (halo exchanges), the head
    grids re-gathered to data-only sharding, decode+NMS per data shard
    — identical DetectionResult to the single-device detector (the
    big-frame / fewer-frames-than-chips path, SURVEY.md §5
    long-context analog)."""
    import jax.numpy as jnp
    from tpufcn.core.config import DetectorConfig, GridConfig, MeshConfig
    from tpufcn.core.mesh import make_mesh
    from tpufcn.serve.detector import Detector

    cfg = DetectorConfig(grid=GridConfig(64, 64, stride=8, num_classes=2),
                         model="vgg_detectnet_train", max_candidates=32)
    base = Detector("vgg_detectnet_train", config=cfg, dtype=jnp.float32,
                    model_kwargs={"num_classes": 2})
    mesh = make_mesh(MeshConfig(data=2, space=4))
    sharded = Detector("vgg_detectnet_train", config=cfg, dtype=jnp.float32,
                       params=base.params, model_kwargs={"num_classes": 2},
                       mesh=mesh)
    frames = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    a = base(frames)
    b = sharded(frames)
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.confidence),
                               np.asarray(b.confidence), rtol=1e-6)


def test_vgg_serving_mode_agrees_with_exact(rng):
    """e5m2 activation storage on the VGG pyramid deploy net (C17):
    coverage close to exact; pipeline runs end to end."""
    import jax.numpy as jnp
    from tpufcn.serve.detector import Detector
    base = Detector("vgg_pyramid_detectnet", dtype=jnp.bfloat16,
                    max_candidates=64)
    fast = Detector("vgg_pyramid_detectnet", dtype=jnp.bfloat16,
                    max_candidates=64, params=base.params,
                    model_kwargs={"store_dtype": jnp.float8_e5m2})
    # 448 = the deploy geometry; the pyramid's fixed up-factors only
    # close at s=56 (deploy.prototxt kernel sizes 56/28/14/8)
    frames = rng.integers(0, 256, (1, 448, 448, 3)).astype(np.uint8)
    x = jnp.asarray(frames)
    a = base.model.apply(base.params, x)["coverage"]
    b = fast.model.apply(fast.params, x)["coverage"]
    assert float(jnp.abs(a - b).mean()) < 0.05
    r = fast(frames)
    assert r.boxes.shape[0] == 1


def test_bg_channel_decode_pairs_trained_blocks(rng):
    """Background-channel families (fcn8s_bbox): the blocks the TRAINING
    encoder writes (object ids shifted past the background channel,
    train/step.py label_offset) must be exactly the blocks the detector
    decodes — grid-encode a GT box, serve the encoded grids verbatim as
    model outputs, and recover the GT box with its 0-based object id."""
    import flax.linen as nn
    import jax

    from tpufcn.models import registry
    from tpufcn.ops.grid_codec import encode_grid_labels

    grid = GridConfig(64, 64, stride=16, num_classes=3)  # bg + 2 objects
    rect = np.array([8.0, 8.0, 40.0, 40.0])              # object id 0
    glabels = encode_grid_labels(
        jnp.asarray([rect]), jnp.asarray([0 + 1]),       # label_offset=1
        jnp.asarray([True]), grid)
    cov = glabels.coverage                               # (4, 4, 3)
    bbox = glabels.bbox.reshape(4, 4, 12)                # (4, 4, 4C)

    class _Stub(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            b = x.shape[0]
            return {
                "coverage": jnp.broadcast_to(cov, (b,) + cov.shape),
                "bboxes": jnp.broadcast_to(bbox, (b,) + bbox.shape),
            }

    registry.register("_bg_decode_test", registry.ModelSpec(
        factory=lambda dtype=jnp.float32, **kw: _Stub(),
        grid=grid, preprocessing="demean", background_channel=0,
        heads=("coverage", "bboxes", "seg"),
        reference="train/fcn_bbox/train_val.prototxt"))
    try:
        det = Detector(
            "_bg_decode_test", dtype=jnp.float32,
            config=DetectorConfig(grid=grid, detection_threshold=0.5,
                                  min_boxes=1, nms_eps=0.2,
                                  model="_bg_decode_test",
                                  min_box_height=20,
                                  max_candidates=16))
        frames = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        dets = det(frames).to_lists()[0]
    finally:
        del registry._REGISTRY["_bg_decode_test"]

    assert len(dets) >= 1
    boxes = {tuple(b) for b, _, _ in dets}
    labels = {l for _, l, _ in dets}
    # grid-encoded offsets reproduce the GT corners exactly; the served
    # label is the 0-based object id (the eval-manifest convention)
    assert (8, 8, 48, 48) in boxes
    assert labels == {0}


def test_export_roundtrip(rng):
    """AOT serving artifact: the serialized StableHLO pipeline must
    reproduce the live Detector bit-for-bit (weights stay outside the
    artifact, so a snapshot refresh needs no re-export)."""
    import pytest
    from tpufcn.serve.export import export_detector, load_exported
    det = Detector("googlenet_detectnet_1cls", dtype=jnp.float32,
                   max_candidates=32)
    art = export_detector(det, batch_size=1)
    assert isinstance(art, bytes) and len(art) > 1000
    fn = load_exported(art)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(1, 448, 448, 3)).astype(np.uint8))
    live = det(frames)
    aot = fn(det.params, frames)
    np.testing.assert_array_equal(np.asarray(live.boxes),
                                  np.asarray(aot.boxes))
    np.testing.assert_array_equal(np.asarray(live.valid),
                                  np.asarray(aot.valid))
    np.testing.assert_allclose(np.asarray(live.confidence),
                               np.asarray(aot.confidence))
    # mesh-sharded detectors capture per-shard semantics; export refuses
    det_m = Detector.__new__(Detector)
    det_m.mesh = object()
    det_m.grid = det.grid
    with pytest.raises(ValueError):
        export_detector(det_m, batch_size=1)
