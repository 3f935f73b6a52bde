from tpufcn.convert.caffe_pb import load_caffemodel, write_caffemodel
from tpufcn.convert.convert import (
    convert_caffemodel, export_caffemodel, conv_blob_to_hwio,
    deconv_blob_to_hwio)

__all__ = [
    "load_caffemodel", "write_caffemodel", "convert_caffemodel",
    "export_caffemodel", "conv_blob_to_hwio", "deconv_blob_to_hwio",
]
