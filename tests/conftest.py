"""Test harness: run everything on a virtual 8-device CPU backend.

Multi-chip sharding tests (SURVEY.md §4) use
``xla_force_host_platform_device_count`` so mesh code paths execute
without TPU hardware.  Must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# does stick (must happen before any backend use).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: re-runs of the suite (and re-parametrized
# tests compiling identical HLO) skip recompilation — a large slice of
# the ~40-min wall on this 1-core host (utils/compile_cache.py).
from tpufcn.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache("/tmp/tpufcn_jaxcache_cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Tests that compile large graphs on this 1-core host (>~20 s each).
# ``-m "not slow"`` is the fast tier (~3-4 min); the full suite ~17 min.
_SLOW = {
    "test_cli_launch.py::test_launch_graph_detector",
    "test_cli_launch.py::test_cli_detect_inprocess",
    "test_cli_launch.py::test_cli_launch_graph",
    "test_cli_launch.py::test_cli_refine_and_rank",
    "test_cli_launch.py::test_launch_detector_orbax_weights",
    "test_detector.py::test_export_roundtrip",
    "test_cli_launch.py::test_cli_train_records_eval_weights",
    "test_cli_launch.py::test_cli_replay",
    "test_e2e_train_detect.py::test_train_snapshot_serve_roundtrip",
    "test_detector_parity.py::test_detector_rescale_truncation",
    "test_detector_parity.py::test_detector_matches_golden_flow",
    "test_multi_step.py::test_trainer_steps_per_dispatch",
    "test_multi_step.py::test_device_batch_cache_epoch_training",
    "test_multi_step.py::test_device_batch_cache_edge_cases",
    "test_multi_step.py::test_device_batch_cache_sharded_mesh",
    "test_multi_step.py::test_multi_step_matches_sequential",
    "test_train_step.py::test_train_step_sharded_mesh",
    "test_train_step.py::test_sharded_step_matches_single_device",
    "test_train_step.py::test_sharded_step_hlo_contains_collectives",
    "test_resnet_fpn.py::test_train_step",
    "test_resnet_fpn.py::test_shapes_and_contract",
    "test_resnet_fpn.py::test_serves_through_detector",
    "test_detector.py::test_detector_finds_planted_object",
    "test_detector.py::test_vgg_serving_mode_agrees_with_exact",
    "test_detector.py::test_detector_end_to_end_smoke",
    "test_bus_stream.py::test_detector_node_replay",
    "test_bus_stream.py::test_tiled_segmenter",
    "test_convert.py::test_googlenet_full_roundtrip",
    "test_trainer.py::test_trainer_fit_and_resume",
    "test_trainer.py::test_trainer_multistep_snapshot_cadence",
    "test_trainer.py::test_trainer_fit_from_parallel_pipeline",
    "test_train_step.py::test_googlenet_train_step_backward",
    "test_misc_coverage.py::test_cli_eval",
    "test_launch_integration.py::test_detector_and_pointmap_graph",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("/")[-1].split("[")[0]
        if base in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
