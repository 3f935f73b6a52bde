"""Multi-host / multi-chip execution helpers.

The reference has no distributed support at all (SURVEY.md §2.3 —
single GPU, ``--gpu=0``).  tpufcn's scaling story, per the §5 design:

* within a slice: the (data, space) mesh (tpufcn/core/mesh.py) with
  GSPMD-inserted collectives over ICI — used by the train step and by
  spatially-sharded inference;
* across hosts: ``jax.distributed`` over DCN; each process contributes
  its local devices to the same global mesh.  ``initialize_distributed``
  wraps the initialization handshake.

There is deliberately NO pipeline or expert parallelism: the models are
~10M-param convnets (see PARITY.md non-goals).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufcn.core.mesh import DATA_AXIS, SPACE_AXIS


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX (no-op for single-process runs).

    Returns the global device count.  With no arguments, relies on the
    cluster environment (TPU pod metadata / env vars) as
    ``jax.distributed.initialize`` does.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return len(jax.devices())


def shard_params_replicated(params, mesh: Mesh):
    """Replicate a param pytree across the mesh (the right layout for
    these small convnets — no tensor parallelism needed)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def spatial_infer_sharding(mesh: Mesh) -> NamedSharding:
    """Input sharding for large-frame inference: batch over ``data``,
    activation rows over ``space``.  XLA spatial partitioning inserts the
    conv halo exchanges (the CP/SP analog for an FCN, SURVEY.md §5)."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))
