"""RMSNorm with fp32 statistics.

Matches LlamaRMSNorm semantics: variance computed in float32, result scaled
and cast back to the input dtype (reference: llama/modeling_llama.py:118-132).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    input_dtype = x.dtype
    xf = x.astype(jnp.float32)
    variance = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(variance + eps)
    # Reference multiplies weight * normalized then casts to input dtype.
    return (weight * xf).astype(input_dtype)
