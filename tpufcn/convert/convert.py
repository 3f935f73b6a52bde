"""``.caffemodel`` -> tpufcn parameter pytree converter.

Layout transforms:
  * Caffe conv blob (C_out, C_in, kH, kW)  ->  HWIO (kH, kW, C_in, C_out)
  * bias (C_out,) unchanged
  * Caffe deconv blob (C_in, C_out/g, kH, kW): every Deconvolution in the
    reference model zoo is a frozen depthwise bilinear filler
    (SURVEY.md C16-C19) which tpufcn implements as a constant — those
    blobs are validated (optionally) and skipped.

Name mapping: tpufcn module names mirror the Caffe layer names
(see tpufcn/models/*.py), so a caffe layer maps to the unique param-tree
path whose joined module names equal (or end with) the layer name.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufcn.convert.caffe_pb import load_caffemodel


def conv_blob_to_hwio(blob: np.ndarray) -> np.ndarray:
    """(C_out, C_in, kH, kW) -> (kH, kW, C_in, C_out)."""
    if blob.ndim != 4:
        raise ValueError(f"expected 4-D conv blob, got {blob.shape}")
    return np.ascontiguousarray(blob.transpose(2, 3, 1, 0))


def deconv_blob_to_hwio(blob: np.ndarray) -> np.ndarray:
    """Caffe deconv (C_in, C_out, kH, kW) -> HWIO of the equivalent
    forward (input-dilated) conv: spatial flip + axis swap."""
    flipped = blob[:, :, ::-1, ::-1]
    return np.ascontiguousarray(flipped.transpose(2, 3, 0, 1))


def _conv_param_paths(params: Dict[str, Any]) -> Dict[str, Tuple[str, ...]]:
    """All paths ending in a {kernel, bias?} conv leaf dict, keyed by the
    joined module-name string (excluding the trailing 'conv' scope)."""
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and not isinstance(node["kernel"], dict):
                name = "/".join(path[:-1] if path and path[-1] == "conv"
                                else path)
                out[name] = tuple(path)
                return
            for k, v in node.items():
                walk(v, path + [k])

    walk(params, [])
    return out


def _match(paths: Dict[str, Tuple[str, ...]], layer: str):
    if layer in paths:
        return paths[layer]
    suffix = [p for name, p in paths.items() if name.endswith("/" + layer)]
    if len(suffix) == 1:
        return suffix[0]
    if len(suffix) > 1:
        raise KeyError(f"ambiguous caffe layer '{layer}': {suffix}")
    return None


def _set_path(tree, path: Tuple[str, ...], leaf_updates: Dict[str, np.ndarray]):
    node = tree
    for k in path:
        node = node[k]
    for k, v in leaf_updates.items():
        if k not in node:
            raise KeyError(f"no leaf '{k}' at {'/'.join(path)}")
        want = tuple(node[k].shape)
        if tuple(v.shape) != want:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}/{k}: caffemodel "
                f"{v.shape} vs model {want}")
        node[k] = jnp.asarray(v, node[k].dtype)


def convert_caffemodel(params: Dict[str, Any],
                       caffemodel_path: str,
                       strict: bool = True) -> Dict[str, Any]:
    """Load Caffe blobs into a (copied) tpufcn param pytree.

    Args:
      params: an initialized variables dict ({"params": {...}}) from the
        matching tpufcn model — supplies structure, shapes, dtypes.
      caffemodel_path: the .caffemodel file.
      strict: raise if a 4-D caffe conv blob finds no matching param path
        (frozen bilinear deconvs are always skipped — they are constants
        in tpufcn).

    Returns:
      A new variables dict with converted weights.
    """
    blobs = load_caffemodel(caffemodel_path)
    new = jax.tree_util.tree_map(lambda x: x, params)  # deep-copied containers
    p = new["params"] if "params" in new else new
    paths = _conv_param_paths(p)

    unmatched: List[str] = []
    for layer, layer_blobs in blobs.items():
        w = layer_blobs[0]
        if w.ndim != 4:
            continue  # BN stats / scale layers etc. — none in the zoo
        path = _match(paths, layer)
        if path is None:
            if _looks_bilinear(w):
                continue  # frozen bilinear deconv: constant in tpufcn
            unmatched.append(layer)
            continue
        updates = {"kernel": conv_blob_to_hwio(w)}
        if len(layer_blobs) > 1:
            b = layer_blobs[1]
            if b.ndim != 1:
                # legacy (V1LayerParameter) BlobProtos parse with the
                # 4-D num/channels/height/width dims — a bias arrives
                # as (1, C, 1, 1)/(1, 1, 1, C); squeeze, don't drop
                # (dropping silently zeroed biases of legacy-era
                # pretrained nets like BVLC GoogLeNet).  atleast_1d:
                # a single-channel head's (1, 1, 1, 1) bias squeezes
                # to 0-d, which must still load as shape (1,)
                b = np.atleast_1d(np.squeeze(b))
            if b.ndim == 1:
                updates["bias"] = b
            else:
                unmatched.append(f"{layer} (bias shape "
                                 f"{layer_blobs[1].shape})")
        _set_path(p, path, updates)

    if strict and unmatched:
        raise KeyError(f"unmatched caffe layers: {unmatched}")
    return new


def _looks_bilinear(w: np.ndarray) -> bool:
    """Heuristic: depthwise (dim1 == 1) symmetric kernel -> bilinear
    upsampler blob."""
    if w.ndim != 4 or w.shape[1] != 1:
        return False
    k = w[0, 0]
    return bool(np.allclose(k, k[::-1, ::-1], atol=1e-5))


def export_caffemodel(params: Dict[str, Any], path: str) -> None:
    """Reverse conversion: write tpufcn conv params as a .caffemodel (for
    round-trip tests and for users migrating back)."""
    from tpufcn.convert.caffe_pb import write_caffemodel
    p = params["params"] if "params" in params else params
    paths = _conv_param_paths(p)
    layers = {}
    for name, path_t in paths.items():
        node = p
        for k in path_t:
            node = node[k]
        kernel = np.asarray(node["kernel"])
        blobs = [np.ascontiguousarray(kernel.transpose(3, 2, 0, 1))]
        if "bias" in node:
            blobs.append(np.asarray(node["bias"]))
        layers[name] = blobs
    write_caffemodel(path, layers)
