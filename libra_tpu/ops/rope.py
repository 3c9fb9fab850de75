"""Rotary position embeddings (GPT-NeoX layout, as in LLaMA).

Reference: modeling_libra.py:32-94 (LibraRotaryEmbedding, apply_rotary_pos_emb).
The cos/sin table is precomputed in fp32 then cast to compute dtype, and
positions are gathered per token -- this supports arbitrary (even 2D-RoPE)
position ids with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_cos_sin(max_len: int, dim: int, base: float = 10000.0,
                 dtype=jnp.float32):
    """Precompute the (max_len, dim) cos/sin tables.

    Matches LibraRotaryEmbedding.__init__: inv_freq over even indices,
    emb = concat(freqs, freqs) (reference: modeling_libra.py:66-78).
    """
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)              # (max_len, dim//2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (max_len, dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               position_ids: jax.Array) -> jax.Array:
    """Apply rotary embedding.

    x: (B, N, H, d) in head-major-last layout.
    position_ids: (B, N) int positions.
    Matches apply_rotary_pos_emb (reference: modeling_libra.py:39-61) for the
    standard 1D case; RoPE is linear, so the bridge-K addition commutes with it.
    """
    c = cos[position_ids].astype(x.dtype)[:, :, None, :]  # (B, N, 1, d)
    s = sin[position_ids].astype(x.dtype)[:, :, None, :]
    return x * c + _rotate_half(x) * s


def apply_rope_2d(x: jax.Array, cos: jax.Array, sin: jax.Array,
                  position_ids_2d: jax.Array) -> jax.Array:
    """2D RoPE: half the heads use row positions, half use column positions.

    x: (B, N, H, d); position_ids_2d: (B, 2, N).
    Matches the use_2d_rope branch of apply_rotary_pos_emb
    (reference: modeling_libra.py:43-49): cos/sin indexed with the (B,2,N)
    ids then tiled over heads -- heads alternate [row, col, row, col, ...]
    pairs via `repeat(1, num_head//2, 1, 1)` on a (B,2,N,d) tensor, which
    tiles the 2-entry axis across heads.
    """
    B, N, H, d = x.shape
    c2 = cos[position_ids_2d]  # (B, 2, N, d)
    s2 = sin[position_ids_2d]
    reps = H // 2
    c = jnp.tile(c2, (1, reps, 1, 1)).transpose(0, 2, 1, 3).astype(x.dtype)  # (B,N,H,d)
    s = jnp.tile(s2, (1, reps, 1, 1)).transpose(0, 2, 1, 3).astype(x.dtype)
    return x * c + _rotate_half(x) * s
