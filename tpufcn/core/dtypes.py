"""Dtype policy: fp32 parameters, bfloat16 MXU compute.

The reference runs fp32 everywhere (Caffe default).  On TPU the MXU's
native input type is bfloat16; we keep parameters and optimizer state in
float32 and cast activations/weights to bfloat16 inside matmul/conv ops,
accumulating in float32 (``preferred_element_type``).  Set
``compute_dtype=float32`` for bitwise-parity runs against converted Caffe
weights.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32

    @classmethod
    def parity(cls) -> "DTypePolicy":
        """Full-fp32 policy for numerical parity tests vs Caffe semantics."""
        return cls(compute_dtype=jnp.float32)

    @classmethod
    def fast(cls) -> "DTypePolicy":
        return cls(compute_dtype=jnp.bfloat16)
