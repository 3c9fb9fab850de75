"""Convolution / norm primitives for the VQGAN conv stack (NHWC layout).

XLA maps NHWC convs onto the MXU directly; all weights are HWIO.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def conv2d(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
           stride: int = 1, padding="SAME") -> jax.Array:
    """x: (B, H, W, Cin); w: (kh, kw, Cin, Cout)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               groups: int = 32, eps: float = 1e-6) -> jax.Array:
    """GroupNorm over NHWC (taming Normalize: 32 groups, eps 1e-6;
    reference: taming/modules/diffusionmodules/model.py:33-35).

    Channel counts in real checkpoints are multiples of 32; for miniature
    test configs we fall back to the largest group count dividing C."""
    B, H, W, C = x.shape
    if C % groups != 0:
        import math
        groups = math.gcd(groups, C)
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * scale + bias).astype(x.dtype)


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def nearest_upsample(x: jax.Array, scale_factor: float) -> jax.Array:
    """torch F.interpolate(mode='nearest') semantics: src = floor(dst / scale).

    Supports fractional scales (the level-1 Upsample reaches 336 from a
    non-power-of-two grid; reference: model.py:538-543).
    """
    B, H, W, C = x.shape
    out_h = int(H * scale_factor)
    out_w = int(W * scale_factor)
    idx_h = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    idx_w = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[:, idx_h][:, :, idx_w]


def avg_pool2(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
