"""Data layer tests: manifests, VOC, compositor, records, pipeline."""

import os

import numpy as np
import cv2 as cv
import pytest

from tpufcn.core.config import DataConfig, GridConfig
from tpufcn.data import (
    Compositor, CompositeTrainPipeline, RecordReader, RecordWriter,
    create_detection_records, read_detection_manifest, read_mask_manifest,
    read_voc_manifest, write_voc_manifest, read_label_names,
    write_label_names, photometric, flip_image_with_rects,
    resize_image_and_rects, PascalVOC, prefetch, DetectionSample)
from tpufcn.data.manifest import MaskSample


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    """Synthetic object dataset: colored rectangles on noise + masks."""
    samples = []
    for i in range(4):
        img = rng.integers(0, 80, size=(120, 160, 3)).astype(np.uint8)
        mask = np.zeros((120, 160), np.uint8)
        x, y, w, h = 30 + i * 5, 20, 50, 60
        img[y:y + h, x:x + w] = (50 + 50 * i, 200 - 30 * i, 100)
        mask[y:y + h, x:x + w] = 255
        ip = str(tmp_path / f"img{i}.png")
        mp = str(tmp_path / f"msk{i}.png")
        cv.imwrite(ip, img)
        cv.imwrite(mp, mask)
        samples.append(MaskSample(ip, mp, i % 2, np.array([x, y, w, h])))
    return samples


def test_detection_manifest_roundtrip(tmp_path):
    p = str(tmp_path / "train.txt")
    with open(p, "w") as f:
        f.write("/a/b.jpg 10 20 30 40 1\n")
        f.write("/c/d.jpg 1 2 3 4 2\n")
    s = read_detection_manifest(p)
    assert s[0].image_path == "/a/b.jpg"
    np.testing.assert_array_equal(s[0].rects[0], [10, 20, 30, 40])
    assert s[0].labels[0] == 0 and s[1].labels[0] == 1  # 1-based -> 0-based


def test_mask_manifest_stride_and_remap(tmp_path):
    p = str(tmp_path / "train.txt")
    with open(p, "w") as f:
        # stride-2: odd lines ignored (reference reader behaviour)
        f.write("/i0.jpg /m0.jpg 7 1 2 3 4\n")
        f.write("ignored line\n")
        f.write("/i1.jpg /m1.jpg 9 5 6 7 8\n")
        f.write("ignored line\n")
    s = read_mask_manifest(p)
    assert len(s) == 2
    assert [x.label for x in s] == [0, 1]  # 7,9 -> contiguous
    s2 = read_mask_manifest(p, background_offset=1)
    assert [x.label for x in s2] == [1, 2]

    # label_map pins class ids to a TRAINING run's snapshot: an eval
    # manifest missing class 7 must keep 9 -> 2 (per-manifest
    # densification would silently shift it to 1)
    from tpufcn.data.manifest import read_label_map_snapshot
    snap = str(tmp_path / "labels.txt")
    with open(snap, "w") as f:
        f.write("1 7\n2 9\n")
    lm = read_label_map_snapshot(snap)
    assert lm == {7: 1, 9: 2}
    p2 = str(tmp_path / "val.txt")
    with open(p2, "w") as f:
        f.write("/i1.jpg /m1.jpg 9 5 6 7 8\n")
        f.write("ignored line\n")
    sv = read_mask_manifest(p2, background_offset=1, label_map=lm)
    assert [x.label for x in sv] == [2]
    with open(p2, "a") as f:
        f.write("/i2.jpg /m2.jpg 11 5 6 7 8\n")
        f.write("ignored line\n")
    with pytest.raises(ValueError, match=r"\[11\]"):
        read_mask_manifest(p2, background_offset=1, label_map=lm)


def test_voc_manifest_roundtrip(tmp_path):
    samples = [DetectionSample("/img.jpg",
                               np.array([[1, 2, 3, 4], [5, 6, 7, 8]]),
                               np.array([0, 5]))]
    p = str(tmp_path / "voc.txt")
    write_voc_manifest(p, samples)
    back = read_voc_manifest(p)
    np.testing.assert_array_equal(back[0].rects, samples[0].rects)
    np.testing.assert_array_equal(back[0].labels, samples[0].labels)


def test_label_names_both_formats(tmp_path):
    p2 = str(tmp_path / "two.txt")
    write_label_names(p2, ["cat", "dog"])
    assert read_label_names(p2) == ["cat", "dog"]
    p3 = str(tmp_path / "three.txt")
    with open(p3, "w") as f:
        f.write("0 _ cat\n1 _ dog\n")
    assert read_label_names(p3) == ["cat", "dog"]


def test_voc_xml_converter(tmp_path):
    voc = tmp_path / "VOC"
    (voc / "Annotations").mkdir(parents=True)
    (voc / "JPEGImages").mkdir()
    (voc / "ImageSets" / "Main").mkdir(parents=True)
    (voc / "Annotations" / "000001.xml").write_text("""
<annotation><filename>000001.jpg</filename>
 <object><name>dog</name>
  <bndbox><xmin>48</xmin><ymin>240</ymin><xmax>195</xmax><ymax>371</ymax></bndbox>
 </object>
 <object><name>person</name>
  <bndbox><xmin>8</xmin><ymin>12</ymin><xmax>352</xmax><ymax>498</ymax></bndbox>
 </object>
</annotation>""")
    (voc / "ImageSets" / "Main" / "train.txt").write_text("000001\n")
    (voc / "ImageSets" / "Main" / "val.txt").write_text("")
    pv = PascalVOC(str(voc))
    pv.create(str(tmp_path / "out"))
    s = read_voc_manifest(str(tmp_path / "out" / "train.txt"))
    assert len(s) == 1
    np.testing.assert_array_equal(s[0].rects[0], [48, 240, 147, 131])
    assert s[0].labels[0] == PascalVOC(str(voc)).classes.index("dog")
    names = read_label_names(str(tmp_path / "out" / "class_label_names.txt"))
    assert names[11] == "dog"


def test_flip_rect_semantics(rng):
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    rect = [10, 5, 20, 12]
    for code in (-1, 0, 1):
        im2, rects = flip_image_with_rects(img, [rect], code)
        x, y, w, h = rects[0]
        assert im2.shape == img.shape
        assert w == rect[2] and h == rect[3]
        assert 0 <= x and x + w <= 60 and 0 <= y and y + h <= 40


def test_compositor_places_nonoverlapping(tiny_dataset, rng):
    comp = Compositor(tiny_dataset)
    bg = np.zeros((240, 320, 3), np.uint8)
    scene = comp.compose(3, bg, rng)
    assert scene.image.shape == (240, 320, 3)
    assert scene.mask.shape == (240, 320)
    assert len(scene.rects) == len(scene.labels)
    # pasted pixels exist where the mask says (label+1)
    for r, l in zip(scene.rects, scene.labels):
        x, y, w, h = r
        sub = scene.mask[y:y + h, x:x + w]
        assert (sub == l + 1).any()
    # pairwise scaled-IoU below the reference threshold
    from tpufcn.data.compositor import _scaled_iou
    for i in range(len(scene.rects)):
        for j in range(i + 1, len(scene.rects)):
            assert _scaled_iou(scene.rects[i], scene.rects[j]) <= 0.05 + 1e-6


def test_photometric_shape_dtype(rng):
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    out = photometric(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_resize_rects_reference_rounding():
    img = np.zeros((100, 200, 3), np.uint8)
    out, rects = resize_image_and_rects(img, [[20, 10, 60, 40]], (100, 50))
    assert out.shape == (50, 100, 3)
    assert rects[0] == [10, 5, 30, 20]


def test_records_roundtrip(tmp_path, rng):
    prefix = str(tmp_path / "ds" / "train")
    with RecordWriter(prefix, records_per_shard=3) as w:
        for i in range(8):
            w.write({"a": np.arange(i + 1, dtype=np.int64),
                     "b": rng.random((2, 3)).astype(np.float32)})
    r = RecordReader(prefix)
    assert len(r) == 8
    rec5 = r.read(5)
    np.testing.assert_array_equal(rec5["a"], np.arange(6))
    assert len(list(iter(r))) == 8


def test_detection_records_with_jpeg(tmp_path, tiny_dataset):
    samples = [DetectionSample(s.image_path, s.rect[None, :],
                               np.array([s.label]))
               for s in tiny_dataset]
    prefix = str(tmp_path / "rec" / "det")
    n = create_detection_records(samples, prefix)
    assert n == 4
    r = RecordReader(prefix)
    rec = r.read(0)
    assert rec["image"].shape == (120, 160, 3)
    assert rec["rects"].shape == (1, 4)


def test_detection_records_augmented(tmp_path, tiny_dataset):
    """--augment bakes the reference's offline chain (original + flip +
    zoom-crop + blur per sample, create_training_lmdb.py:296-356) and
    keeps rect/label alignment through each transform."""
    from tpufcn.data.records import offline_variants
    samples = [DetectionSample(s.image_path, s.rect[None, :],
                               np.array([s.label]))
               for s in tiny_dataset]
    prefix = str(tmp_path / "rec" / "aug")
    n = create_detection_records(samples, prefix, augment=True)
    assert n >= 3 * len(samples)          # crop variants may drop
    r = RecordReader(prefix)
    for i in range(len(r)):
        rec = r.read(i)
        assert rec["rects"].shape[0] == rec["labels"].shape[0] >= 1
        assert rec["image"].ndim == 3

    # flip variant parity: flag -1 mirrors both axes with the -1 shift
    rng = np.random.default_rng(5)
    img = np.zeros((40, 60, 3), np.uint8)
    img[10:20, 12:30] = 255
    variants = offline_variants(img, [[12, 10, 18, 10]], [2], rng)
    assert len(variants) in (2, 3, 4)
    vimg, vrects, vlabels = variants[1]
    assert vlabels == [2] and len(vrects) == 1
    assert vimg.shape == img.shape


def test_zoom_crop_keeps_label_map_aligned(rng):
    """zoom_crop must crop the seg label map with the image's window
    (the reference crops only the image — a seg-supervision bug, fixed
    here; see compositor.zoom_crop docstring)."""
    from tpufcn.data.compositor import zoom_crop
    img = np.zeros((100, 120, 3), np.uint8)
    lm = np.zeros((100, 120), np.uint8)
    img[30:50, 40:70] = 200
    lm[30:50, 40:70] = 5
    for seed in range(5):
        r = np.random.default_rng(seed)
        roi, rect, lm2 = zoom_crop(img, [40, 30, 30, 20], r, lm)
        assert roi.shape[:2] == lm2.shape
        np.testing.assert_array_equal(roi[..., 0] == 200, lm2 == 5)


def test_multiclass_synthetic_dataset_pipeline(tmp_path, rng):
    """examples.demo.make_dataset(classes=3): per-class textures/shapes,
    labels flow through the compositor batch and the grid-label encoder
    puts coverage on the right class channel."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from demo import make_dataset
    from tpufcn.ops.grid_codec import encode_grid_labels_batch
    import jax.numpy as jnp

    samples = make_dataset(str(tmp_path), rng, n=9, classes=3)
    assert sorted({s.label for s in samples}) == [0, 1, 2]
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=3)
    pipe = CompositeTrainPipeline(samples, grid, DataConfig(batch_size=4),
                                  box_capacity=4, seed=1)
    b = pipe.batch(4)
    labs = b["labels"][b["valid"]]
    assert labs.min() >= 0 and labs.max() <= 2
    enc = encode_grid_labels_batch(jnp.asarray(b["rects"]),
                                   jnp.asarray(b["labels"]),
                                   jnp.asarray(b["valid"]), grid)
    cov = np.asarray(enc.coverage)          # (B, gh, gw, 3)
    assert cov.shape[-1] == 3
    # every valid GT label's channel has some coverage somewhere
    for i in range(4):
        for lab in np.unique(b["labels"][i][b["valid"][i]]):
            assert cov[i, :, :, int(lab)].max() > 0


def test_composite_pipeline_batch(tiny_dataset, rng):
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    pipe = CompositeTrainPipeline(
        tiny_dataset, grid, DataConfig(batch_size=2), box_capacity=4)
    b = pipe.batch(2)
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["rects"].shape == (2, 4, 4)
    assert b["seg"].shape == (2, 64, 64)
    assert b["valid"].dtype == bool


def test_prefetch_wraps_iterator():
    out = list(prefetch(iter(range(5)), depth=2))
    assert out == [0, 1, 2, 3, 4]


def test_prefetch_propagates_source_errors():
    """A crashing source must raise in the consumer, not silently look
    like end-of-data (training stopping early with zero diagnostics)."""
    import pytest

    def bad():
        yield 1
        raise FileNotFoundError("corrupt image")

    it = prefetch(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(FileNotFoundError, match="corrupt image"):
        list(it)


def test_parallel_pipeline_batches(tiny_dataset):
    """Process-pool scene builder yields the same batch contract as the
    in-process pipeline and shuts down cleanly (VERDICT r1 missing #4:
    the host input pipeline must not be single-threaded)."""
    from tpufcn.core.config import DataConfig, GridConfig
    from tpufcn.data.parallel import ParallelCompositePipeline

    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    with ParallelCompositePipeline(
            tiny_dataset, grid, DataConfig(batch_size=2), box_capacity=4,
            workers=2, depth=2, seed=3) as pipe:
        it = iter(pipe)
        batches = [next(it) for _ in range(3)]
    for b in batches:
        assert b["image"].shape == (2, 64, 64, 3)
        assert b["image"].dtype == np.uint8
        assert b["rects"].shape == (2, 4, 4)
        assert b["valid"].any()
    # different worker seeds -> scenes differ across batches
    assert not np.array_equal(batches[0]["image"], batches[1]["image"])


def test_records_relabel_contiguous_background(tmp_path, rng):
    """The reference writer's np.unique relabeling + use_bkgnd shift
    (create_training_lmdb.py:112-117): sparse manifest labels {2, 7}
    store as contiguous ids, +1 with a learned background, and the
    mapping persists as a sidecar."""
    import json
    from tpufcn.data.manifest import DetectionSample
    from tpufcn.data.records import RecordReader, create_detection_records

    paths = []
    for i in range(2):
        img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        p = str(tmp_path / f"r{i}.png")
        cv.imwrite(p, img)
        paths.append(p)
    samples = [
        DetectionSample(paths[0], np.asarray([[2, 2, 8, 8]]),
                        np.asarray([7])),
        DetectionSample(paths[1], np.asarray([[4, 4, 8, 8], [1, 1, 6, 6]]),
                        np.asarray([2, 7])),
    ]
    prefix = str(tmp_path / "rec/ds")
    n = create_detection_records(samples, prefix, shuffle_seed=None,
                                 relabel_contiguous=True,
                                 add_background=True)
    assert n == 2
    meta = json.load(open(prefix + ".labelmap.json"))
    assert meta["map"] == {"2": 1, "7": 2}
    assert meta["add_background"] is True
    r = RecordReader(prefix)
    stored = sorted(int(l) for i in range(len(r))
                    for l in r.read(i)["labels"])
    assert stored == [1, 2, 2]

    # the train pipeline must NOT hand the stored background shift to
    # the train step (which applies the model's own label_offset):
    # yielded labels are 0-based object ids again
    from tpufcn.core.config import GridConfig
    from tpufcn.data.pipeline import RecordTrainPipeline
    pipe = RecordTrainPipeline(prefix, GridConfig(32, 32, stride=8,
                                                  num_classes=3),
                               batch_size=2)
    b = next(iter(pipe))
    got = sorted(int(l) for l, v in zip(b["labels"].ravel(),
                                        b["valid"].ravel()) if v)
    assert got == [0, 1, 1]            # 2,7 -> 0,1 (both samples drawn)


def test_mask_manifest_blank_separators_and_snapshot(tmp_path):
    """The reference reader strides the RAW file — manifests whose odd
    lines are BLANK separators keep all records; and the label snapshot
    is written with the reference's one-based ids regardless of
    background_offset."""
    p = str(tmp_path / "train.txt")
    with open(p, "w") as f:
        f.write("/i0.jpg /m0.jpg 7 1 2 3 4\n")
        f.write("\n")
        f.write("/i1.jpg /m1.jpg 9 5 6 7 8\n")
        f.write("\n")
    s = read_mask_manifest(p)
    assert len(s) == 2                  # blanks were halving the dataset
    snap = str(tmp_path / "labels.txt")
    read_mask_manifest(p, background_offset=0,
                       snapshot_label_manifest=snap)
    assert open(snap).read() == "1 7\n2 9\n"   # 1-based despite offset 0
    # a blank RECORD line (mis-strided file) fails loudly
    bad = str(tmp_path / "bad.txt")
    with open(bad, "w") as f:
        f.write("\n/i0.jpg /m0.jpg 7 1 2 3 4\n")
    with pytest.raises(ValueError, match="blank record line"):
        read_mask_manifest(bad)


def test_parallel_pipeline_propagates_worker_errors(tmp_path):
    """A data error inside a worker process (bad manifest entry) must
    surface at the CONSUMER with the real traceback, not die silently
    on the child's stderr while the pool shrinks."""
    from tpufcn.core.config import DataConfig, GridConfig
    from tpufcn.data.manifest import MaskSample
    from tpufcn.data.parallel import ParallelCompositePipeline

    bad = [MaskSample(str(tmp_path / "missing.png"),
                      str(tmp_path / "missing_mask.png"), 0,
                      np.array([1, 1, 8, 8], np.int32))]
    grid = GridConfig(im_width=32, im_height=32, stride=8, num_classes=2)
    with ParallelCompositePipeline(
            bad, grid, DataConfig(batch_size=1), workers=1, depth=2,
            seed=0) as pipe:
        with pytest.raises(RuntimeError, match="worker failed"):
            pipe.batch()


def test_rotate_image_with_rects():
    """Reference rotate_image_with_rect semantics (argumentation_engine
    .py:327-355, gated off upstream): the returned rect must be the
    axis-aligned bound of the rotated box — checked against the actual
    nonzero pixels of a rotated white patch (independent oracle)."""
    from tpufcn.data.compositor import rotate_image_with_rects

    class _FixedAngle:
        def __init__(self, angle):
            self.angle = angle

        def integers(self, lo, hi):
            assert lo == -5 and hi == 6   # the reference randint(-5, 5)
            return self.angle

    img = np.zeros((120, 160, 3), np.uint8)
    img[40:80, 60:110] = 255
    mask = np.zeros((120, 160), np.uint8)
    mask[40:80, 60:110] = 7

    # angle 0 == identity (modulo warp resampling of an axis-aligned box)
    im0, r0, m0 = rotate_image_with_rects(
        img, [[60, 40, 50, 40]], _FixedAngle(0), label_map=mask)
    assert r0 == [[60, 40, 50, 40]]
    np.testing.assert_array_equal(m0, mask)

    im5, r5, m5 = rotate_image_with_rects(
        img, [[60, 40, 50, 40]], _FixedAngle(5), label_map=mask)
    ys, xs = np.nonzero(im5[..., 0])
    x, y, w, h = r5[0]
    # the rect must bound the rotated patch tightly (int truncation: the
    # reference's corner cast can shave up to a pixel per side)
    assert abs(x - xs.min()) <= 1 and abs(y - ys.min()) <= 1
    assert abs((x + w) - (xs.max() + 1)) <= 1
    assert abs((y + h) - (ys.max() + 1)) <= 1
    # mask rotates with the image, label values preserved (nearest)
    assert set(np.unique(m5)) <= {0, 7}
    mys, mxs = np.nonzero(m5)
    assert abs(mys.min() - ys.min()) <= 1 and abs(mxs.min() - xs.min()) <= 1

    # the augmentation chain leaves rotation OFF by default (reference
    # argumentation_engine.py:179) and applies it when asked
    from tpufcn.data.compositor import random_augmentation
    rng = np.random.default_rng(3)
    out, rects, _ = random_augmentation(
        img, [[60, 40, 50, 40]], rng, enable_zoom=False,
        enable_photometric=False, rotate=True)
    assert out.shape == img.shape and len(rects) == 1
