"""Full-pipeline parity: the device detector (full candidate capacity)
against the golden numpy reference flow (decode -> groupRectangles ->
height filter -> rescale) applied to the same model outputs.

This is the end-to-end analog of the reference run_detector path
(scripts/fcn_object_detector.py:54-132) with every stage checked at
once."""

import numpy as np
import jax
import jax.numpy as jnp

from tpufcn.core.config import DetectorConfig, GridConfig
from tpufcn.serve.detector import Detector

from golden import golden_decode, golden_vote_boxes


def test_detector_matches_golden_flow(rng):
    det = Detector("googlenet_detectnet_1cls", dtype=jnp.float32,
                   max_candidates=None)   # full grid capacity
    g = det.grid

    # bias the heads so a plausible number of cells fire
    p = det.params["params"]
    cvg = p["cvg/classifier"]["conv"]
    cvg["bias"] = jnp.asarray([1.0])      # sigmoid(~1+noise): many cells
    det.params = {"params": p}

    frames = rng.integers(0, 256, size=(1, 448, 448, 3)).astype(np.uint8)

    # golden flow on the model's own outputs
    model_out = det.model.apply(det.params, jnp.asarray(frames, jnp.float32))
    coverage = np.asarray(model_out["coverage"])[0]       # (28, 28, 1)
    bboxes = np.asarray(model_out["bboxes"])[0]           # (28, 28, 4)

    boxes, cvgs = golden_decode(
        coverage[:, :, 0], np.moveaxis(bboxes, -1, 0), 448, 448,
        g.stride, 0.5)
    want = golden_vote_boxes(boxes, 3, 0.2, 20)
    # reference materializes int boxes (np.int cast) before the (here
    # identity) rescale
    want_boxes = sorted(tuple(int(v) for v in w[:4]) for w in want)

    res = det(frames)
    v = np.asarray(res.valid)[0, 0]
    got_boxes = sorted(map(tuple, np.asarray(res.boxes)[0, 0][v].tolist()))

    assert len(got_boxes) == len(want_boxes)
    assert got_boxes == want_boxes
    # confidences match log(votes)
    got_conf = sorted(np.asarray(res.confidence)[0, 0][v].tolist())
    want_conf = sorted(w[4] for w in want)
    np.testing.assert_allclose(got_conf, want_conf, rtol=1e-3)


def test_detector_rescale_truncation(rng):
    """Frames larger than the net input: boxes scale by in/net and
    truncate like the reference's int-array assignment."""
    det = Detector("googlenet_detectnet_1cls", dtype=jnp.float32,
                   max_candidates=64)
    p = det.params["params"]
    cvg = p["cvg/classifier"]["conv"]
    bbox = p["bbox/regressor"]["conv"]
    cvg["kernel"] = jnp.zeros_like(cvg["kernel"])
    cvg["bias"] = jnp.full_like(cvg["bias"], 8.0)
    bbox["kernel"] = jnp.zeros_like(bbox["kernel"])
    bbox["bias"] = jnp.asarray([0.0, 0.0, 65.0, 49.0])
    det.params = {"params": p}

    frames = rng.integers(0, 256, size=(1, 896, 672, 3)).astype(np.uint8)
    res = det(frames)
    v = np.asarray(res.valid)[0, 0]
    boxes = np.asarray(res.boxes)[0, 0][v]
    assert len(boxes) > 0
    # scale: x by 672/448 = 1.5, y by 896/448 = 2.0
    assert (boxes[:, 2] <= 672).all() and (boxes[:, 3] <= 896).all()
    # a cell box (0,0,65,49)+origin scaled: x coords multiples of 1.5
    # truncated to int; y coords exactly doubled
    assert (boxes[:, 1] % 2 == 0).all() and (boxes[:, 3] % 2 == 0).all()


def test_select_candidates_matches_unpacked_topk(rng):
    """The packed 3-operand candidate sort (serve/detector.py
    select_candidates) vs the straightforward 6-operand sort it
    replaced: identical selection and (rounded) boxes, including
    negative coords, ties, and out-of-range clamping."""
    import jax
    import jax.numpy as jnp
    from tpufcn.serve.detector import select_candidates

    B, C, M, K = 3, 2, 96, 32
    cvg = rng.random((B, C, M)).astype(np.float32)
    cvg[rng.random((B, C, M)) < 0.3] = 0.5  # ties
    boxes = rng.uniform(-600, 900, (B, C, M, 4)).astype(np.float32)
    boxes[0, 0, 0] = [-5000.0, 5000.0, 3.4, -2048.4]  # clamp surface
    valid = rng.random((B, C, M)) < 0.6

    got_boxes, got_valid = jax.jit(
        select_candidates, static_argnums=3)(cvg, boxes, valid, K)

    # reference: full-payload sort on pre-rounded+clamped boxes
    r = np.clip(np.rint(boxes), -2048, 2047)
    score = np.where(valid, cvg, -1.0)
    want_boxes = np.zeros((B, C, K, 4), np.float32)
    want_valid = np.zeros((B, C, K), bool)
    for b in range(B):
        for c in range(C):
            order = np.argsort(-score[b, c], kind="stable")[:K]
            want_boxes[b, c] = r[b, c][order]
            want_valid[b, c] = valid[b, c][order]
    assert np.array_equal(np.asarray(got_valid), want_valid)
    assert np.array_equal(np.asarray(got_boxes), want_boxes)
