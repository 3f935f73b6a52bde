"""space-to-depth conv equivalence vs direct lax conv."""

import numpy as np
import jax
import jax.numpy as jnp

from tpufcn.ops.fast_conv import conv2d_space_to_depth


def test_s2d_conv_matches_direct(rng):
    for k, pad in [(7, 3), (5, 2), (3, 1)]:
        x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
        w = rng.standard_normal((k, k, 3, 8), dtype=np.float32)
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (2, 2), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        got = conv2d_space_to_depth(jnp.asarray(x), jnp.asarray(w), 2, pad)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
