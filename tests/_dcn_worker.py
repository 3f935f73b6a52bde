"""Worker process for the multi-host DCN smoke test.

Launched twice by tests/test_distributed.py: two CPU processes, 4 forced
devices each, joined by ``jax.distributed`` over a local coordinator —
the same handshake a real multi-host DCN run uses (SURVEY.md §5
distributed-communication stance; the reference is single-GPU).  Each
process contributes its devices to one global (data=8, space=1) mesh and
runs ONE sharded tpufcn train step; the DP gradient all-reduce crosses
the process boundary.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(port: str, pid: int) -> None:
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from tpufcn.core.config import GridConfig, MeshConfig, TrainConfig
    from tpufcn.core.mesh import make_mesh
    from tpufcn.models import build
    from tpufcn.parallel.distributed import initialize_distributed
    from tpufcn.train.step import init_state, make_train_step

    n = initialize_distributed(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert n == 8, f"expected 8 global devices, got {n}"
    assert jax.process_count() == 2

    mesh = make_mesh(MeshConfig(data=8, space=1), devices=jax.devices())

    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    cfg = TrainConfig(grid=grid, model="vgg_detectnet_train")
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    # identical seed -> identical host-local params on both processes
    state = init_state(model, cfg, (1, 64, 64, 3), rng_seed=0)
    step = make_train_step(model, cfg, mesh=mesh)

    rng = np.random.default_rng(0)
    B = 16  # global batch; each process holds its half
    local = {
        "image": rng.random((B // 2, 64, 64, 3), dtype=np.float32),
        "rects": np.tile(np.array([8.0, 8.0, 24.0, 24.0], np.float32),
                         (B // 2, 4, 1)),
        "labels": np.zeros((B // 2, 4), np.int32),
        "valid": np.tile(np.array([True, False, False, False]), (B // 2, 1)),
    }
    specs = {k: P("data", *([None] * (v.ndim - 1)))
             for k, v in local.items()}
    batch = {
        k: multihost_utils.host_local_array_to_global_array(
            jnp.asarray(v), mesh, specs[k])
        for k, v in local.items()
    }
    # replicate the (identical) host-local state onto the global mesh
    state = jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, P()), state)
    state, metrics = step(state, batch)
    loss = float(metrics["loss_total"])
    assert np.isfinite(loss)
    print(f"DCN_STEP_OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
