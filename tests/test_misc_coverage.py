"""Coverage for smaller utilities: deconv layout transform, corner IoU,
stage timers, the fcn_bbox recipe's loss weights, and the eval CLI."""

import json

import numpy as np
import cv2 as cv
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from tpufcn import recipes
from tpufcn.convert import deconv_blob_to_hwio
from tpufcn.ops.boxes import iou_corners
from tpufcn.ops.caffe_layers import conv_transpose_caffe
from tpufcn.utils import StageTimer


def test_deconv_blob_layout_matches_torch(rng):
    """Caffe deconv blob (C_in, C_out, kh, kw) -> our HWIO-for-dilated-conv
    layout must reproduce torch's conv_transpose2d."""
    import jax
    cin, cout, k, s, p = 3, 5, 4, 2, 1
    blob = rng.standard_normal((cin, cout, k, k), dtype=np.float32)
    x = rng.standard_normal((1, 6, 6, cin), dtype=np.float32)
    want = F.conv_transpose2d(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
        torch.from_numpy(blob), stride=s, padding=p)
    got = conv_transpose_caffe(
        jnp.asarray(x), jnp.asarray(deconv_blob_to_hwio(blob)), s, p,
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want.numpy(), 1, -1),
        rtol=1e-4, atol=1e-5)


def test_iou_corners():
    a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b = jnp.asarray([5.0, 5.0, 15.0, 15.0])
    got = float(iou_corners(a, b))
    np.testing.assert_allclose(got, 25.0 / 175.0, rtol=1e-6)
    assert float(iou_corners(a, a)) == 1.0
    assert float(iou_corners(a, jnp.asarray([20.0, 20.0, 30.0, 30.0]))) == 0.0


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    t.record("a", 0.002)
    t.record("b", 0.5)
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["b"]["p50_ms"] == 500.0
    lines = []
    t.report(sink=lines.append)
    assert len(lines) == 2


def test_fcn_bbox_recipe_loss_weights():
    cfg = recipes.get("fcn_bbox")
    assert cfg.coverage_loss_weight == 0.0     # no EuclideanLoss in C18
    assert cfg.bbox_loss_weight == 2.0
    assert cfg.seg_loss_weight == 1.0


def test_cli_eval(tmp_path, rng, capsys):
    """eval subcommand over a tiny detection-format manifest."""
    img = rng.integers(0, 256, (448, 448, 3)).astype(np.uint8)
    p = str(tmp_path / "f.png")
    cv.imwrite(p, img)
    man = str(tmp_path / "val.txt")
    with open(man, "w") as f:
        f.write(f"{p} 100 100 80 90 1\n")
    from tpufcn.cli import main
    main(["eval", "--manifest", man, "--format", "detection",
          "--model", "googlenet_detectnet_1cls"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mAP" in rec and rec["images"] == 1
    assert 0.0 <= rec["mAP"] <= 1.0


def test_aggregate_device_trace(tmp_path):
    """device_trace + aggregate_device_trace give per-HLO-op durations
    without TensorBoard (the only valid per-op attribution through the
    remote-TPU tunnel; works against CPU 'hlo_op' tags too)."""
    import jax
    import jax.numpy as jnp
    from tpufcn.utils.profiling import aggregate_device_trace, device_trace

    x = jnp.ones((256, 256), jnp.float32)
    f = jax.jit(lambda a: (a @ a).sum())
    _ = float(f(x))
    with device_trace(str(tmp_path)):
        for _ in range(3):
            _ = float(f(x))
    rows = aggregate_device_trace(str(tmp_path))
    assert rows and all(r["dur_us"] > 0 for r in rows)
    assert any("dot" in r["long_name"] or "dot" in r["name"]
               for r in rows), [r["name"] for r in rows]
