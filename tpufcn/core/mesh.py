"""Device mesh and sharding helpers.

The reference runs on a single CUDA device (reference
scripts/fcn_object_detector.py:68-69, train/train.sh:27).  Here every
entry point takes a ``jax.sharding.Mesh`` with axes ``("data", "space")``:

* ``data``  — batch-axis data parallelism; gradients all-reduce over ICI.
* ``space`` — spatial sharding of activation rows (H) for frames larger
  than one chip's comfortable working set; convs exchange halos via XLA
  collective-permute when this axis is >1.

Axis size 1 on either axis degenerates to plain jit with no collectives,
so single-chip behaviour is the trivial case of the same code path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufcn.core.config import MeshConfig

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the 2-axis (data, space) mesh.

    With no config, uses all available devices on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=len(devices), space=1)
    n = cfg.num_devices
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices ({cfg.data}x{cfg.space}) but only "
            f"{len(devices)} available")
    dev = np.asarray(devices[:n]).reshape(cfg.data, cfg.space)
    return Mesh(dev, (DATA_AXIS, SPACE_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def batch_space_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activations: batch over ``data``, H over ``space``."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"data-parallel degree {n}")
    return global_batch // n
