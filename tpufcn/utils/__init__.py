from tpufcn.utils.profiling import (
    StageTimer, aggregate_device_trace, device_trace)

__all__ = ["StageTimer", "aggregate_device_trace", "device_trace"]
