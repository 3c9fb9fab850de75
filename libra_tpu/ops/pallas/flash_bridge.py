"""Fused bridged-attention Pallas kernel (TPU).

Computes, entirely in VMEM with no HBM materialisation of the attention
matrix:

    S   = (Q K^T) * scale + cross * (Q Kb^T) * scale + bias
    A   = softmax(S)                                (fp32)
    out = A V + (A * cross) Vb

where cross[q, k] = vision_flag[q] != vision_flag[k] -- the dense-mask
formulation of the reference's clone-and-scatter bridge
(modeling_libra.py:267-296, 317-327; see libra_tpu/ops/attention.py for
the equivalence proof).

Grid: (batch, heads, q-blocks). Each program holds one q-block plus the
full K/V/Kb/Vb for its (batch, head) in VMEM: at N=2048, d=128, bf16
that is 4 x 512 KB = 2 MB, comfortably inside the ~16 MB VMEM budget, so
no online-softmax streaming is needed at Libra's sequence lengths; the
5 dots per block all run on the MXU.

Forward-only: training keeps the XLA path (same math, autodiff'd);
prefill/decode use this kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -2.0 ** 30


def _kernel(q_ref, k_ref, v_ref, kb_ref, vb_ref, fq_ref, fk_ref, bias_ref,
            out_ref, *, scale: float, use_bridge: bool):
    # q: (BQ, d); k/v/kb/vb: (N, d); fq: (BQ, 1); fk: (N, 1) int32
    # bias: (BQ, N) fp32; out: (BQ, d)
    q = q_ref[...]
    k = k_ref[...]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (BQ, N)

    if use_bridge:
        kb = kb_ref[...]
        sb = jax.lax.dot_general(
            q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        cross = (fq_ref[...] != fk_ref[...].reshape(1, -1))  # (BQ, N)
        s = s + jnp.where(cross, sb, 0.0)

    s = s + bias_ref[...]
    s = jnp.maximum(s, BIG_NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    pv = p.astype(v_ref.dtype)
    o = jax.lax.dot_general(
        pv, v_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if use_bridge:
        pb = jnp.where(cross, p, 0.0).astype(vb_ref.dtype)
        o = o + jax.lax.dot_general(
            pb, vb_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[...] = (o / denom).astype(out_ref.dtype)


def flash_bridged_attention(
        q: jax.Array, k: jax.Array, v: jax.Array,
        kb: Optional[jax.Array], vb: Optional[jax.Array],
        flag_q: jax.Array, flag_kv: jax.Array, bias: jax.Array,
        block_q: int = 256, interpret: bool = False) -> jax.Array:
    """q: (B, Nq, H, d); k/v/kb/vb: (B, Nk, H, d); flag_q: (B, Nq);
    flag_kv: (B, Nk); bias: (B, 1, Nq, Nk) additive fp32.
    Returns (B, Nq, H, d)."""
    B, Nq, H, d = q.shape
    Nk = k.shape[1]
    use_bridge = kb is not None
    if not use_bridge:
        kb = k  # dummy operands keep one kernel signature
        vb = v
    block_q = min(block_q, Nq)
    if Nq % block_q != 0:
        raise ValueError(f"Nq={Nq} must be a multiple of block_q={block_q}")
    scale = 1.0 / (d ** 0.5)

    fq = flag_q.astype(jnp.int32)[..., None]     # (B, Nq, 1)
    fk = flag_kv.astype(jnp.int32)[..., None]    # (B, Nk, 1)

    grid = (B, H, Nq // block_q)

    def qmap(b, h, qi):
        return (b, qi, h, 0)

    def kvmap(b, h, qi):
        return (b, 0, h, 0)

    kernel = functools.partial(_kernel, scale=scale, use_bridge=use_bridge)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, None, d), qmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nk, None, d), kvmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nk, None, d), kvmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nk, None, d), kvmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nk, None, d), kvmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda b, h, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nk, 1), lambda b, h, qi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, block_q, Nk),
                         lambda b, h, qi: (b, 0, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, None, d), qmap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nq, H, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Nq * Nk * d * (5 if use_bridge else 2),
            bytes_accessed=B * H * (Nq + 4 * Nk) * d * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
    )(q, k, v, kb, vb, fq, fk, bias.astype(jnp.float32))
    return out
