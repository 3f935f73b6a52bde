from tpufcn.models.googlenet import GoogLeNetDetectNet
from tpufcn.models.vgg import VGGDetectNet, VGGPyramidDetectNet, VGG16Backbone
from tpufcn.models.fcn import FCN8sBBox, FCN32sSeg
from tpufcn.models.registry import build, get_spec, names, ModelSpec

__all__ = [
    "GoogLeNetDetectNet", "VGGDetectNet", "VGGPyramidDetectNet",
    "VGG16Backbone", "FCN8sBBox", "FCN32sSeg",
    "build", "get_spec", "names", "ModelSpec",
]
