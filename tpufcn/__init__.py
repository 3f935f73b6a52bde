"""tpufcn — TPU-native fully-convolutional object detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``iKrishneel/fcn_object_detector`` (reference mounted at /root/reference):
DetectNet-style grid detection, FCN semantic segmentation, copy-paste
compositing augmentation, grid->box decode + box-grouping NMS, dataset
tooling, and an RGB-D point-map fusion node — all re-designed for TPU
(NHWC layouts, bfloat16 MXU compute, jitted single-dispatch inference,
pjit/shard_map data + spatial parallelism over a device mesh).

Layering (bottom-up):
  core/      typed config tree, mesh/sharding, dtype policy
  ops/       pure array ops: grid label codec, box decode, group-rectangles
             NMS, Caffe-semantic LRN/deconv, image preprocessing
  models/    model zoo (GoogLeNet DetectNet, VGG-pyramid DetectNet,
             FCN-8s+bbox, FCN-32s seg) as flax.linen modules
  data/      manifests, VOC converter, record storage, compositing +
             photometric augmentation, device-prefetch pipeline
  train/     losses, jitted data-parallel train step, orbax checkpoints
  convert/   .caffemodel/.prototxt -> JAX pytree weight converter
  serve/     single-dispatch detector pipeline, stream driver (topic bus)
  pointmap/  C++ RGB-D Euclidean-clustering fusion node
"""

__version__ = "0.1.0"
