from tpufcn.data.manifest import (
    DetectionSample, MaskSample, read_detection_manifest, read_mask_manifest,
    read_voc_manifest, write_voc_manifest, read_label_names,
    write_label_names)
from tpufcn.data.compositor import (
    Compositor, ComposedScene, photometric, random_augmentation,
    rotate_image_with_rects,
    flip_image_with_rects, resize_image_and_rects, fcn_crop_sample)
from tpufcn.data.records import (
    RecordReader, RecordWriter, create_detection_records, read_records)
from tpufcn.data.pipeline import (
    CompositeTrainPipeline, DeviceBatchCache, RecordTrainPipeline,
    prefetch, pad_boxes)
from tpufcn.data.parallel import ParallelCompositePipeline
from tpufcn.data.device_compositor import (
    CropLibrary, DeviceCompositePipeline)
from tpufcn.data.voc import PascalVOC, VOC_CLASSES

__all__ = [
    "DetectionSample", "MaskSample", "read_detection_manifest",
    "read_mask_manifest", "read_voc_manifest", "write_voc_manifest",
    "read_label_names", "write_label_names",
    "Compositor", "ComposedScene", "photometric", "random_augmentation",
    "flip_image_with_rects", "rotate_image_with_rects",
    "resize_image_and_rects", "fcn_crop_sample",
    "RecordReader", "RecordWriter", "create_detection_records",
    "read_records",
    "CompositeTrainPipeline", "DeviceBatchCache", "RecordTrainPipeline",
    "prefetch", "pad_boxes",
    "ParallelCompositePipeline",
    "CropLibrary", "DeviceCompositePipeline",
    "PascalVOC", "VOC_CLASSES",
]
