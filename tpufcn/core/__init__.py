from tpufcn.core.config import (
    GridConfig,
    DetectorConfig,
    TrainConfig,
    MeshConfig,
    DataConfig,
)
from tpufcn.core.mesh import make_mesh, data_sharding, replicated
from tpufcn.core.dtypes import DTypePolicy

__all__ = [
    "GridConfig",
    "DetectorConfig",
    "TrainConfig",
    "MeshConfig",
    "DataConfig",
    "DTypePolicy",
    "make_mesh",
    "data_sharding",
    "replicated",
]
