from tpufcn.pointmap.node import PointMapLib, PointMapNode, build_library

__all__ = ["PointMapLib", "PointMapNode", "build_library"]
