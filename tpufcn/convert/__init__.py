from tpufcn.convert.caffe_pb import load_caffemodel, write_caffemodel
from tpufcn.convert.convert import (
    convert_caffemodel, export_caffemodel, conv_blob_to_hwio,
    deconv_blob_to_hwio)


def resolve_weights(weights, init_fn):
    """One resolver for every ``--weights``/``pretrained_weights``
    surface: ``None`` -> random init, a DIRECTORY -> Trainer orbax
    snapshot, a file -> ``.caffemodel`` (lenient, by-name).

    ``init_fn`` builds the randomly initialized pytree and is only
    called when needed — a snapshot-dir load skips the model-init
    compile entirely (minutes on a slow host)."""
    import os
    if weights and os.path.isdir(weights):
        from tpufcn.train.trainer import load_snapshot_params
        return load_snapshot_params(weights)
    init = init_fn()
    if weights:
        return convert_caffemodel(init, weights, strict=False)
    return init


__all__ = [
    "load_caffemodel", "write_caffemodel", "convert_caffemodel",
    "export_caffemodel", "conv_blob_to_hwio", "deconv_blob_to_hwio",
    "resolve_weights",
]
