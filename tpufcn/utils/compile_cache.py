"""Persistent XLA compilation cache, probed-working through the axon
remote-TPU tunnel (round 4): the first compile of a graph costs the
usual 10 s-5 min on this 1-core host, every later compile of the same
HLO — fresh jit wrapper, fresh PROCESS, later bench/driver run on the
same host — returns in <1 s from the on-disk cache (measured 12.1 s ->
0.7 s cross-process on the 448² GoogLeNet forward).

This is the wall-clock backbone of the recalibrated bench gate phase:
per-seed Trainer rebuilds, per-family Detector evals, and the driver's
end-of-round bench all re-lower identical HLO; with the cache enabled
they pay compilation once per round instead of once per object.

Enabled by every entry point that compiles real graphs (bench.py, the
CLI, __graft_entry__, tests/conftest).  Safe to call multiple times;
falls back silently if this jax version lacks the config knobs.
"""

from __future__ import annotations

DEFAULT_DIR = "/tmp/tpufcn_jaxcache"


def enable(path: str = DEFAULT_DIR) -> bool:
    """Point jax at the on-disk compilation cache; True when active."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes >= 2 s to compile (the default
        # 1 s floor plus margin keeps tiny test graphs out); no size
        # floor — a small executable can still cost minutes to build
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except Exception:
        return False
