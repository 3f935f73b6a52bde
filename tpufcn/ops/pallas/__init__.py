from tpufcn.ops.pallas.lrn import lrn_pallas

__all__ = ["lrn_pallas"]
