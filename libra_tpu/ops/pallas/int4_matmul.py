"""Fused int4 weight-only matmul Pallas kernel.

Weights are packed two int4 values per uint8 byte ALONG K (row 2k in the
low nibble, row 2k+1 in the high nibble) with per-(group, out-channel)
scales, group size G along K. The kernel unpacks and dequantizes one
(K/2, block_o) tile entirely in VMEM and runs two MXU dots (even-k and
odd-k halves against the caller-split activations), so HBM weight traffic
is the int4 byte count -- XLA cannot do this (a jnp unpack materialises
int8/bf16 weights in HBM and measured 4.6x SLOWER than int8).

Numerics: symmetric int4, q in [-8, 7], w ~= q * scale, scale = amax/7.

STATUS -- MEMORY-ONLY, measured (r3, 1xv5e, (4096, 11008) decode matvec,
bench.py kernels stage): int4 0.070 ms vs fused int8 0.060 ms vs bf16
0.129 ms. The VPU nibble-unpack dominates, holding int4 at ~321 GB/s of
effective int4 bytes while the int8 kernel streams 749 GB/s -- so int4
HALVES weight memory but does NOT beat int8 tokens/s at decode batch
sizes. Restructurings tried and rejected: all-8-bit unpack (crashes the
Mosaic compiler), int8-pair dot trick (no nibble separation exists
through a single dot). Use int8 for speed; int4 only when the model
must fit a smaller HBM budget.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def pack_int4(w, group: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w: (..., K, O) float -> (packed (..., K/2, O) uint8,
    scales (..., K/group, O) float32)."""
    w = jnp.asarray(w)
    K, O = w.shape[-2:]
    if K % group or group % 2:
        raise ValueError(
            f"K={K} must be divisible by group={group}, group must be even")
    gshape = w.shape[:-2] + (K // group, group, O)
    amax = jnp.max(jnp.abs(w.reshape(gshape)), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax, 1.0).astype(jnp.float32) / 7.0
    q = jnp.clip(jnp.round(w.reshape(gshape) / scale), -8, 7)
    q = q.reshape(w.shape).astype(jnp.int32)
    lo = q[..., 0::2, :] & 15            # two's-complement low nibble
    hi = (q[..., 1::2, :] & 15) << 4
    packed = (lo | hi).astype(jnp.uint8)
    return packed, scale[..., 0, :]


def dequant_int4(packed: jnp.ndarray, scales: jnp.ndarray,
                 group: int = 128, dtype=jnp.float32) -> jnp.ndarray:
    """Reference unpack (used by tests and the CPU fallback path)."""
    p = packed.astype(jnp.int32)
    lo = ((p & 15) ^ 8) - 8              # sign-extend 4-bit
    hi = ((p >> 4) ^ 8) - 8
    Kh, O = packed.shape[-2:]
    w = jnp.stack([lo, hi], axis=-2)     # (..., Kh, 2, O)
    w = w.reshape(packed.shape[:-2] + (Kh * 2, O))
    s = jnp.repeat(scales, group, axis=-2)
    return (w * s).astype(dtype)


def _kernel(xe_ref, xo_ref, wp_ref, s_ref, o_ref, *, n_groups: int,
            gh: int):
    # xe/xo: (B, K/2) bf16; wp: (K/2, bo) uint8; s: (n_groups, bo) f32.
    # NOTE: the int32 widening below is deliberate -- an all-8-bit unpack
    # variant crashed the Mosaic TPU compiler; this version compiles and
    # runs at ~0.30 ms for a (4096, 11008) matmul on v5e (HBM-roofline for
    # int4 would be ~0.08 ms; the VPU unpack dominates, so int4 currently
    # MATCHES int8-dequant-in-XLA speed while halving weight memory).
    w32 = wp_ref[...].astype(jnp.int32)
    lo = ((w32 & 15) ^ 8) - 8                       # (Kh, bo) in [-8, 7]
    hi = ((w32 >> 4) ^ 8) - 8
    bo = lo.shape[-1]
    s3 = s_ref[...].reshape(n_groups, 1, bo)
    wl = (lo.reshape(n_groups, gh, bo) * s3).reshape(n_groups * gh, bo)
    wh = (hi.reshape(n_groups, gh, bo) * s3).reshape(n_groups * gh, bo)
    acc = jax.lax.dot(xe_ref[...], wl.astype(xe_ref.dtype),
                      preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot(xo_ref[...], wh.astype(xo_ref.dtype),
                            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def int4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array,
                group: int = 128, block_o: int = 512,
                interpret: bool = False) -> jax.Array:
    """x: (B, K) -> (B, O) with packed (K/2, O) uint8, scales (K/G, O).

    B is padded to the bf16 sublane tile (8) inside; out dtype = x dtype.
    """
    B, K = x.shape
    Kh, O = packed.shape
    assert Kh * 2 == K, (x.shape, packed.shape)
    n_groups = K // group
    gh = group // 2                      # packed rows per group
    if O % block_o:
        block_o = O if O < block_o else max(
            b for b in (128, 256, 512) if O % b == 0)

    Bp = max(8, -(-B // 8) * 8)
    xp = jnp.zeros((Bp, K), x.dtype).at[:B].set(x)
    xe, xo = xp[:, 0::2], xp[:, 1::2]    # (Bp, Kh)

    out = pl.pallas_call(
        functools.partial(_kernel, n_groups=n_groups, gh=gh),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((Bp, Kh), lambda j: (0, 0)),
            pl.BlockSpec((Bp, Kh), lambda j: (0, 0)),
            pl.BlockSpec((Kh, block_o), lambda j: (0, j)),
            pl.BlockSpec((n_groups, block_o), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Bp, block_o), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
        interpret=interpret,
    )(xe, xo, packed, scales)
    return out[:B]
