"""Bridged routed attention -- the heart of the decoupled vision system.

Reference semantics (modeling_libra.py:245-414): every projection has a
language path and a low-rank vision path routed by vision_flag; the optional
"bridge" adds rank-8 K/V corrections so that each modality's queries see the
OTHER modality's keys/values corrected.

The reference implements this by cloning K/V tensors and scatter-adding
bridge terms per query-modality (attn_with_bridge, modeling_libra.py:267-296;
key bridging at 317-327). Algebraically that collapses to a single
*cross-modality mask* `cross[q,k] = vision_flag[q] != vision_flag[k]`:

    S    = (Q @ K^T) * scale + (Q @ Kb^T) * scale * cross
    A    = softmax(S + additive_mask)      # fp32
    out  = A @ V + (A * cross) @ Vb

Proof sketch: for a vision query, keys are K + (1-flag_k) * Kb and values are
V + (1-flag_k) * Vb; for a language query, K + flag_k * Kb and V + flag_k * Vb.
`(1-flag_k)` when flag_q=1 and `flag_k` when flag_q=0 is exactly
`flag_q XOR flag_k`. Because Q@(Kb*m)^T == (Q@Kb^T)*m for a per-key mask m,
and A@(Vb*m) folds the mask into A's columns, we get the form above -- two
extra dense matmuls, zero gathers, fully static. RoPE is linear, so applying
it to K and Kb separately matches the reference's rope(K + Kb).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

BIG_NEG = -2.0 ** 30  # additive mask value; min-clamped like the reference


class AttentionInputs(NamedTuple):
    q: jax.Array            # (B, Nq, H, d) -- post-RoPE
    k: jax.Array            # (B, Nk, H, d) -- post-RoPE
    v: jax.Array            # (B, Nk, H, d)
    kb: Optional[jax.Array]  # (B, Nk, H, d) bridge keys, post-RoPE (or None)
    vb: Optional[jax.Array]  # (B, Nk, H, d) bridge values (or None)


def bridged_attention(
    inputs: AttentionInputs,
    flag_q: jax.Array,       # (B, Nq) bool: query token is vision
    flag_kv: jax.Array,      # (B, Nk) bool: key/value token is vision
    bias: jax.Array,         # (B, 1, Nq, Nk) additive mask (0 or BIG_NEG)
    dropout: Optional[tuple] = None,  # (rng, attn_pdrop) on the probs
) -> jax.Array:
    """Returns (B, Nq, H, d). XLA-path implementation; a fused Pallas kernel
    with identical semantics lives in libra_tpu/ops/pallas/flash_bridge.py.

    (A score-folded variant that kept the int8 KV cache un-dequantized in
    the dots was tried and measured SLOWER on v5e (+6 ms/step at L=24) and
    crashed the TPU compiler at 32 layers; callers dequantize quantized
    caches before this function instead.)"""
    q, k, v, kb, vb = inputs
    B, Nq, H, d = q.shape
    scale = 1.0 / (d ** 0.5)

    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    use_bridge = kb is not None
    if use_bridge:
        cross = (flag_q[:, None, :, None] ^ flag_kv[:, None, None, :])  # (B,1,Nq,Nk)
        sb = jnp.einsum("bqhd,bkhd->bhqk", q, kb) * scale
        s = s + jnp.where(cross, sb, 0.0)

    s = s + bias.astype(s.dtype)
    # fp32 softmax with min-clamp, matching modeling_libra.py:386-391
    s = jnp.maximum(s, BIG_NEG)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)

    if dropout is not None:
        rng, rate = dropout
        if rng is not None and rate > 0.0:
            # dropout on the attention matrix, BEFORE both V dots -- the
            # reference's attn_with_bridge consumes the dropped matrix
            # (modeling_llama.py:392 then modeling_libra.py:394-395)
            from libra_tpu.ops.routed import apply_dropout
            a = apply_dropout(rng, a, rate)

    out = jnp.einsum("bhqk,bkhd->bqhd", a, v)
    if use_bridge:
        ab = jnp.where(cross, a, 0.0)
        out = out + jnp.einsum("bhqk,bkhd->bqhd", ab, vb)
    return out


def causal_bias(attention_mask: jax.Array, nq: int, nk: int,
                dtype=jnp.float32) -> jax.Array:
    """Build the additive (B, 1, Nq, Nk) mask from a (B, Nk) padding mask,
    combining causality (queries occupy the LAST nq key slots) and padding.

    Matches _prepare_decoder_attention_mask semantics
    (reference: modeling_libra.py:601-623): causal + expanded padding masks
    are added, so a position masked by both gets 2x BIG_NEG -- harmless since
    we clamp in the softmax.
    """
    B = attention_mask.shape[0]
    past = nk - nq
    q_pos = jnp.arange(nq) + past           # absolute key index of each query
    k_pos = jnp.arange(nk)
    causal = (k_pos[None, :] <= q_pos[:, None])          # (Nq, Nk)
    pad = attention_mask.astype(bool)[:, None, None, :]  # (B,1,1,Nk)
    keep = causal[None, None, :, :] & pad
    return jnp.where(keep, 0.0, BIG_NEG).astype(dtype)
