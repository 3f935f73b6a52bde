"""Spatially-sharded inference: NHWC activations sharded over the
(data, space) mesh; GSPMD inserts conv halo exchanges.  Results must be
identical to single-device execution."""

import numpy as np
import jax
import jax.numpy as jnp

from tpufcn.core.config import MeshConfig
from tpufcn.core.mesh import make_mesh
from tpufcn.models import build
from tpufcn.parallel import spatial_infer_sharding, shard_params_replicated


def test_spatial_sharded_forward_matches_single_device(rng):
    mesh = make_mesh(MeshConfig(data=2, space=4),
                     devices=jax.devices("cpu"))
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    params = model.init(jax.random.key(0), x)

    want = model.apply(params, x)

    xs = jax.device_put(x, spatial_infer_sharding(mesh))
    ps = shard_params_replicated(params, mesh)
    got = jax.jit(model.apply)(ps, xs)

    np.testing.assert_allclose(np.asarray(got["coverage"]),
                               np.asarray(want["coverage"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["bboxes"]),
                               np.asarray(want["bboxes"]),
                               rtol=1e-4, atol=1e-4)
