"""Lookup-Free Quantization (LFQ) as pure JAX functions.

Reference: taming/modules/quantization/lookup_free_quantization.py:52-280
(MAGVIT-v2 LFQ, arXiv:2310.05737). Each codebook dimension is sign-quantized
to {-1, +1}; indices are the bit-pack of the signs (MSB first). Libra uses
2 codebooks x 512 codes (9 bits each) on an 18-dim latent, so project_in/out
are identity; we support the projected case too.

All ops are elementwise/bit ops + one small matmul for the entropy loss --
trivially fusable by XLA, no kernel needed.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LFQSpec(NamedTuple):
    codebook_size: int          # e.g. 512
    num_codebooks: int          # e.g. 2
    dim: int                    # input feature dim (e.g. 18)
    entropy_loss_weight: float = 0.1
    commitment_loss_weight: float = 1.0
    diversity_gamma: float = 2.5
    inv_temperature: float = 100.0

    @property
    def codebook_dim(self) -> int:
        d = self.codebook_size.bit_length() - 1
        assert (1 << d) == self.codebook_size, "codebook_size must be 2^k"
        return d

    @property
    def codebook_dims(self) -> int:
        return self.codebook_dim * self.num_codebooks

    @property
    def has_projections(self) -> bool:
        return self.dim != self.codebook_dims


def bit_mask(spec: LFQSpec) -> jax.Array:
    """2^(d-1), ..., 2, 1 -- MSB-first bit weights
    (reference: lookup_free_quantization.py:111)."""
    return 2 ** jnp.arange(spec.codebook_dim - 1, -1, -1, dtype=jnp.int32)


def full_codebook(spec: LFQSpec) -> jax.Array:
    """(codebook_size, codebook_dim) array of {-1,+1} codes."""
    codes = jnp.arange(spec.codebook_size, dtype=jnp.int32)
    bits = ((codes[:, None] & bit_mask(spec)[None, :]) != 0).astype(jnp.float32)
    return bits * 2.0 - 1.0


class LFQOutput(NamedTuple):
    quantized: jax.Array     # same shape as input x (..., dim)
    indices: jax.Array       # (..., num_codebooks) int32
    aux_loss: jax.Array      # scalar (0 when not training)


def quantize(x: jax.Array, spec: LFQSpec,
             params: Optional[Dict] = None,
             training: bool = False) -> LFQOutput:
    """LFQ forward on channel-last input x: (..., dim).

    Matches LFQ.forward (reference: lookup_free_quantization.py:160-275):
    sign-quantize, straight-through when training, bit-pack indices, and the
    per-sample-low / batch-high entropy aux loss + commitment loss.
    """
    if spec.has_projections:
        assert params is not None and "project_in" in params
        x = x @ params["project_in"]["w"] + params["project_in"]["b"]

    lead = x.shape[:-1]
    x = x.reshape(lead + (spec.num_codebooks, spec.codebook_dim))
    original = x

    quantized = jnp.where(x > 0, 1.0, -1.0).astype(x.dtype)
    if training:
        out = x + jax.lax.stop_gradient(quantized - x)
    else:
        out = quantized

    mask = bit_mask(spec)
    indices = jnp.sum((out > 0).astype(jnp.int32) * mask, axis=-1)  # (..., c)

    if training:
        xf = original.astype(jnp.float32)
        codebook = full_codebook(spec)
        # same as euclidean distance up to a constant (ref line 214)
        distance = -2.0 * jnp.einsum("...cd,jd->...cj", xf, codebook)
        prob = jax.nn.softmax(-distance * spec.inv_temperature, axis=-1)
        plogp = -prob * jnp.log(jnp.clip(prob, 1e-5))
        per_sample_entropy = jnp.mean(jnp.sum(plogp, axis=-1))
        axes = tuple(range(prob.ndim - 2))
        avg_prob = jnp.mean(prob, axis=axes)                  # (c, codebook)
        cb_plogp = -avg_prob * jnp.log(jnp.clip(avg_prob, 1e-5))
        codebook_entropy = jnp.mean(jnp.sum(cb_plogp, axis=-1))
        entropy_aux = per_sample_entropy - spec.diversity_gamma * codebook_entropy
        commit = jnp.mean(
            (xf - jax.lax.stop_gradient(quantized.astype(jnp.float32))) ** 2)
        aux = (entropy_aux * spec.entropy_loss_weight
               + commit * spec.commitment_loss_weight)
    else:
        aux = jnp.zeros((), jnp.float32)

    out = out.reshape(lead + (spec.codebook_dims,))
    if spec.has_projections:
        out = out @ params["project_out"]["w"] + params["project_out"]["b"]
    return LFQOutput(quantized=out, indices=indices, aux_loss=aux)


def indices_to_codes(indices: jax.Array, spec: LFQSpec,
                     params: Optional[Dict] = None) -> jax.Array:
    """Un-pack bit indices back to +-1 codes and project out.

    indices: (..., num_codebooks) -> codes (..., dim).
    Reference: LFQ.indices_to_codes (lookup_free_quantization.py:129-158).
    """
    mask = bit_mask(spec)
    bits = ((indices[..., None] & mask) != 0).astype(jnp.float32)
    codes = bits * 2.0 - 1.0
    codes = codes.reshape(indices.shape[:-1] + (spec.codebook_dims,))
    if spec.has_projections:
        assert params is not None and "project_out" in params
        codes = codes @ params["project_out"]["w"] + params["project_out"]["b"]
    return codes
