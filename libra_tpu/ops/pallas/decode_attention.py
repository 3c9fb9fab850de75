"""Fused bridged decode attention over the int8 KV cache.

One decode step's attention (Nq=1) reads the whole cached K/V history;
with an int8 cache the XLA path costs three passes over the data per layer
(dequant-materialise bf16, score reads, value reads -- profiled ~11 ms/step
on the full-32-layer 11B decode). This kernel reads the RAW int8 buffers
once, dequantises in VMEM, and runs scores + softmax + value sums on the
MXU, per (batch, 8-head-block) grid cell:

    s    = (q . k_int) * k_scale * rsqrt(d)            # (1, S) fp32
    s   += cross ? (q . kb_int) * kb_scale * rsqrt(d)  # bridge keys
    a    = softmax(s + bias)                           # fp32, BIG_NEG clamp
    out  = (a * v_scale) . v_int + (a * cross * vb_scale) . vb_int

Scale folding is exact: K scales are per (token, head) constants along the
contraction, so (q.k_int)*s == q.(k_int*s); V scales fold into the
attention row. Semantics match ops/attention.bridged_attention (the
cross-modality-mask reformulation of modeling_libra.py:267-296,317-327).

Layouts: k/v int8 (B, S, H, d) with (B, H, S) fp32 scales (sequence-minor,
see models.libra.init_cache). Mosaic tiling requires every block's last two
dims be tile-multiples or full array dims, so the grid cells carry 8-head
blocks of the (B, S, H, d) buffers -- block (S, 8, d) -- and the kernel
loops the 8 heads with static slices. S must be a multiple of 128 (callers
round the cache length up; the extra positions are masked).

STATUS (measured on 1xv5e, full-32 decode): correct but SLOW on the
head-interleaved (B,S,H,d) cache -- the (S, 8, d) blocks DMA in 1 KB
strided chunks (11.6 tok/s vs 76.4 for the materialise-then-MXU XLA path).
Gated behind LIBRA_DECODE_ATTN_KERNEL=1 until the cache moves to a
head-major (B, H, S, d) layout that makes the per-cell reads contiguous.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -2.0 ** 30
_HB = 8   # heads per grid cell


def _scores(q_h, k_ref, s_ref, h, inv_sqrt_d):
    k = k_ref[:, h, :].astype(jnp.bfloat16)             # (S, d)
    s = jax.lax.dot_general(q_h, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (1, S)
    return s * s_ref[h] * inv_sqrt_d


def _weighted_v(a, v_ref, s_ref, h):
    av = (a * s_ref[h]).astype(jnp.bfloat16)            # (1, S)
    return jax.lax.dot_general(av, v_ref[:, h, :].astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (1, d)


def _kernel_bridge(q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                   kbq_ref, kbs_ref, vbq_ref, vbs_ref,
                   fq_ref, fkv_ref, bias_ref, o_ref, *, inv_sqrt_d):
    cross = fq_ref[0, 0] != fkv_ref[:]                  # (1, S)
    bias = bias_ref[:]
    for h in range(q_ref.shape[0]):
        q_h = q_ref[h]                                  # (1, d)
        s = _scores(q_h, kq_ref, ks_ref, h, inv_sqrt_d)
        sb = _scores(q_h, kbq_ref, kbs_ref, h, inv_sqrt_d)
        s = s + jnp.where(cross, sb, 0.0)
        s = jnp.maximum(s + bias, BIG_NEG)
        a = jax.nn.softmax(s, axis=-1)                  # fp32 (1, S)
        out = _weighted_v(a, vq_ref, vs_ref, h)
        out = out + _weighted_v(jnp.where(cross, a, 0.0), vbq_ref, vbs_ref, h)
        o_ref[h] = out.astype(o_ref.dtype)


def _kernel_plain(q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                  bias_ref, o_ref, *, inv_sqrt_d):
    bias = bias_ref[:]
    for h in range(q_ref.shape[0]):
        q_h = q_ref[h]
        s = _scores(q_h, kq_ref, ks_ref, h, inv_sqrt_d)
        s = jnp.maximum(s + bias, BIG_NEG)
        a = jax.nn.softmax(s, axis=-1)
        o_ref[h] = _weighted_v(a, vq_ref, vs_ref, h).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_decode_attention(q, kq, ks, vq, vs, kbq=None, kbs=None,
                          vbq=None, vbs=None, flag_q=None, kv_flag=None,
                          bias=None, interpret: bool = False):
    """q (B, 1, H, d) bf16; kq/vq (B, S, H, d) int8 with (B, H, S) fp32
    scales; optional bridge tensors; flag_q (B,) / kv_flag (B, S) bool;
    bias (B, S) additive fp32. Returns (B, 1, H, d) in q.dtype."""
    B, N, H, d = q.shape
    S = kq.shape[1]
    assert N == 1 and S % 128 == 0 and H % _HB == 0, (N, S, H)
    use_bridge = kbq is not None
    qh = q.reshape(B, H, 1, d)
    bias = bias.astype(jnp.float32).reshape(B, 1, S)
    grid = (B, H // _HB)

    q_spec = pl.BlockSpec((None, _HB, 1, d), lambda b, h: (b, h, 0, 0))
    kv_spec = pl.BlockSpec((None, S, _HB, d), lambda b, h: (b, 0, h, 0))
    s_spec = pl.BlockSpec((None, _HB, 1, S), lambda b, h: (b, h, 0, 0))
    row_spec = pl.BlockSpec((None, 1, S), lambda b, h: (b, 0, 0))
    fq_spec = pl.BlockSpec((None, 1, 1), lambda b, h: (b, 0, 0))
    out_spec = pl.BlockSpec((None, _HB, 1, d), lambda b, h: (b, h, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, H, 1, d), q.dtype)

    def sc(s):
        return s.astype(jnp.float32).reshape(B, H, 1, S)

    if use_bridge:
        fq = flag_q.astype(jnp.int32).reshape(B, 1, 1)
        fkv = kv_flag.astype(jnp.int32).reshape(B, 1, S)
        out = pl.pallas_call(
            functools.partial(_kernel_bridge, inv_sqrt_d=1.0 / d ** 0.5),
            grid=grid,
            in_specs=[q_spec, kv_spec, s_spec, kv_spec, s_spec,
                      kv_spec, s_spec, kv_spec, s_spec,
                      fq_spec, row_spec, row_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qh.astype(jnp.bfloat16), kq, sc(ks), vq, sc(vs),
          kbq, sc(kbs), vbq, sc(vbs), fq, fkv, bias)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_plain, inv_sqrt_d=1.0 / d ** 0.5),
            grid=grid,
            in_specs=[q_spec, kv_spec, s_spec, kv_spec, s_spec, row_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qh.astype(jnp.bfloat16), kq, sc(ks), vq, sc(vs), bias)
    return out.reshape(B, 1, H, d)
