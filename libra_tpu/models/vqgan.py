"""VQGAN vision tokenizer: CLIP encoder tap -> 1x1 quant conv -> LFQ ->
(decode path) 1x1 post-quant conv -> taming conv decoder.

Reference: taming/models/vqgan.py:26-135 (VQModel) and
taming/modules/diffusionmodules/model.py:380-588 (Encoder/Decoder).
Everything is NHWC; convs are HWIO and map directly onto the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from libra_tpu.config import VQGANConfig
from libra_tpu.models import clip as clip_model
from libra_tpu.models import lfq
from libra_tpu.ops.conv import (avg_pool2, conv2d, group_norm,
                                nearest_upsample, swish)

Params = Dict[str, Any]


def lfq_spec(cfg: VQGANConfig) -> lfq.LFQSpec:
    return lfq.LFQSpec(
        codebook_size=cfg.codebook_size,
        num_codebooks=cfg.num_codebook,
        dim=cfg.embed_dim,
        entropy_loss_weight=0.1,       # vqgan.py:66-72
        commitment_loss_weight=1.0,
        diversity_gamma=2.5,
    )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * (fan_in ** -0.5)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _gn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _resnet_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin), "conv1": _conv_init(k1, 3, 3, cin, cout),
        "norm2": _gn_init(cout), "conv2": _conv_init(k2, 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(k3, 1, 1, cin, cout)
    return p


def _attn_init(key, c):
    ks = jax.random.split(key, 4)
    return {
        "norm": _gn_init(c),
        "q": _conv_init(ks[0], 1, 1, c, c), "k": _conv_init(ks[1], 1, 1, c, c),
        "v": _conv_init(ks[2], 1, 1, c, c), "proj_out": _conv_init(ks[3], 1, 1, c, c),
    }


def decoder_plan(cfg: VQGANConfig):
    """Static structure of the taming Decoder upsampling stack
    (reference: model.py:474-546): per level (top-down construction order,
    bottom-up execution), channels and whether attn/upsample apply."""
    n_lev = len(cfg.ch_mult)
    block_in = cfg.ch * cfg.ch_mult[-1]
    curr_res = cfg.initial_resolution
    levels = []
    for i_level in reversed(range(n_lev)):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        has_attn = curr_res in cfg.attn_resolutions
        if i_level > 1:
            up_scale: Optional[float] = 2.0
            curr_res *= 2
        elif i_level == 1:
            up_scale = cfg.resolution / curr_res
        else:
            up_scale = None
        levels.append(dict(i_level=i_level, block_in=block_in,
                           block_out=block_out, has_attn=has_attn,
                           up_scale=up_scale))
        block_in = block_out
    return levels, block_in


def init_decoder_params(key, cfg: VQGANConfig) -> Params:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    levels, final_ch = decoder_plan(cfg)
    mid_ch = cfg.ch * cfg.ch_mult[-1]
    p: Params = {
        "conv_in": _conv_init(nk(), 3, 3, cfg.z_channels, mid_ch),
        "mid_block_1": _resnet_init(nk(), mid_ch, mid_ch),
        "mid_attn_1": _attn_init(nk(), mid_ch),
        "mid_block_2": _resnet_init(nk(), mid_ch, mid_ch),
        "norm_out": _gn_init(final_ch),
        "conv_out": _conv_init(nk(), 3, 3, final_ch, cfg.out_ch),
        "up": [],
    }
    if cfg.norm_first:
        p["first_norm"] = _gn_init(cfg.z_channels)
    for lev in levels:
        cin = lev["block_in"]
        blocks, attns = [], []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_resnet_init(nk(), cin, lev["block_out"]))
            cin = lev["block_out"]
            if lev["has_attn"]:
                attns.append(_attn_init(nk(), cin))
        entry: Params = {"block": blocks, "attn": attns}
        if lev["up_scale"] is not None:
            entry["upsample_conv"] = _conv_init(nk(), 3, 3, cin, cin)
        p["up"].append(entry)
    return p


def init_params(key, cfg: VQGANConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    clip_in = cfg.clip_feature_dim  # hidden x len(select_layers)
    params: Params = {
        "clip": clip_model.init_params(k1, cfg.clip),
        "quant_conv": _conv_init(k2, 1, 1, clip_in, cfg.embed_dim),
        "post_quant_conv": _conv_init(k3, 1, 1, cfg.embed_dim, cfg.z_channels),
        "decoder": init_decoder_params(k4, cfg),
    }
    return params


# ---------------------------------------------------------------------------
# Forward blocks
# ---------------------------------------------------------------------------

def _resnet_block(p: Params, x: jax.Array) -> jax.Array:
    h = conv2d(swish(group_norm(x, **p["norm1"])), **p["conv1"])
    h = conv2d(swish(group_norm(h, **p["norm2"])), **p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d(x, **p["nin_shortcut"])
    return x + h


def _attn_block(p: Params, x: jax.Array, num_heads: int = 1) -> jax.Array:
    B, H, W, C = x.shape
    hn = group_norm(x, **p["norm"])
    q = conv2d(hn, **p["q"]).reshape(B, H * W, num_heads, C // num_heads)
    k = conv2d(hn, **p["k"]).reshape(B, H * W, num_heads, C // num_heads)
    v = conv2d(hn, **p["v"]).reshape(B, H * W, num_heads, C // num_heads)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * ((C // num_heads) ** -0.5)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, H, W, C)
    return x + conv2d(o, **p["proj_out"])


def decoder_forward(params: Params, cfg: VQGANConfig, z: jax.Array) -> jax.Array:
    """z: (B, h, w, z_channels) -> pixels (B, resolution, resolution, out_ch).

    Execution mirrors Decoder.forward (reference: model.py:556-588): mid
    block, then levels bottom-up with upsampling (fractional nearest at
    level 1 to reach the target resolution).
    """
    levels, _ = decoder_plan(cfg)
    if cfg.norm_first:
        z = group_norm(z, **params["first_norm"])
    h = conv2d(z, **params["conv_in"])
    h = _resnet_block(params["mid_block_1"], h)
    h = _attn_block(params["mid_attn_1"], h, cfg.attn_num_heads)
    h = _resnet_block(params["mid_block_2"], h)

    for entry, lev in zip(params["up"], levels):
        for i_block in range(cfg.num_res_blocks + 1):
            h = _resnet_block(entry["block"][i_block], h)
            if lev["has_attn"]:
                h = _attn_block(entry["attn"][i_block], h, cfg.attn_num_heads)
        if lev["up_scale"] is not None:
            h = nearest_upsample(h, lev["up_scale"])
            h = conv2d(h, **entry["upsample_conv"])

    h = swish(group_norm(h, **params["norm_out"]))
    return conv2d(h, **params["conv_out"])


# ---------------------------------------------------------------------------
# Conv encoder (taming Encoder; used when encoder_name != "clip")
# ---------------------------------------------------------------------------

def encoder_plan(cfg: VQGANConfig):
    """Static structure of the taming Encoder downsampling stack
    (reference: model.py:380-442)."""
    n_lev = len(cfg.ch_mult)
    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    curr_res = cfg.resolution
    levels = []
    for i_level in range(n_lev):
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        has_attn = curr_res in cfg.attn_resolutions
        has_down = i_level != n_lev - 1
        if has_down:
            curr_res //= 2
        levels.append(dict(block_in=block_in, block_out=block_out,
                           has_attn=has_attn, has_down=has_down))
    return levels, cfg.ch * cfg.ch_mult[-1]


def init_encoder_params(key, cfg: VQGANConfig, in_channels: int = 3) -> Params:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    levels, final_ch = encoder_plan(cfg)
    p: Params = {
        "conv_in": _conv_init(nk(), 3, 3, in_channels, cfg.ch),
        "down": [],
        "mid_block_1": _resnet_init(nk(), final_ch, final_ch),
        "mid_attn_1": _attn_init(nk(), final_ch),
        "mid_block_2": _resnet_init(nk(), final_ch, final_ch),
        "norm_out": _gn_init(final_ch),
        "conv_out": _conv_init(nk(), 3, 3, final_ch, cfg.z_channels),
    }
    for lev in levels:
        cin = lev["block_in"]
        entry: Params = {"block": [], "attn": []}
        for _ in range(cfg.num_res_blocks):
            entry["block"].append(_resnet_init(nk(), cin, lev["block_out"]))
            cin = lev["block_out"]
            if lev["has_attn"]:
                entry["attn"].append(_attn_init(nk(), cin))
        if lev["has_down"]:
            entry["downsample_conv"] = _conv_init(nk(), 3, 3, cin, cin)
        p["down"].append(entry)
    return p


def encoder_forward(params: Params, cfg: VQGANConfig,
                    pixels: jax.Array) -> jax.Array:
    """pixels (B, S, S, C) -> latents (B, s, s, z_channels). Mirrors
    Encoder.forward (reference: model.py:444-471); Downsample uses the
    torch asymmetric (0,1,0,1) pad + stride-2 valid conv."""
    levels, _ = encoder_plan(cfg)
    h = conv2d(pixels, **params["conv_in"])
    for entry, lev in zip(params["down"], levels):
        for i_block in range(cfg.num_res_blocks):
            h = _resnet_block(entry["block"][i_block], h)
            if lev["has_attn"]:
                h = _attn_block(entry["attn"][i_block], h, cfg.attn_num_heads)
        if lev["has_down"]:
            hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(hp, **entry["downsample_conv"], stride=2,
                       padding="VALID")
    h = _resnet_block(params["mid_block_1"], h)
    h = _attn_block(params["mid_attn_1"], h, cfg.attn_num_heads)
    h = _resnet_block(params["mid_block_2"], h)
    h = swish(group_norm(h, **params["norm_out"]))
    return conv2d(h, **params["conv_out"])


# ---------------------------------------------------------------------------
# VQModel API
# ---------------------------------------------------------------------------

class EncodeOutput(Tuple):
    pass


def encode(params: Params, cfg: VQGANConfig, pixels: jax.Array,
           training: bool = False):
    """pixels: (B, S, S, 3) CLIP-normalized -> (quantized, aux_loss,
    indices (B, g, g, Q), encoder_feat (B, g, g, C)).

    Reference: VQModel.encode (vqgan.py:106-114): CLIP tower feature tap
    (square (24,24,1024)), 1x1 quant conv to embed_dim, LFQ.
    """
    feat = clip_model.forward_features(params["clip"], cfg.clip, pixels,
                                       select_layer=cfg.select_layer,
                                       square_output=True)
    h = conv2d(feat, **params["quant_conv"])
    out = lfq.quantize(h, lfq_spec(cfg), training=training)
    return out.quantized, out.aux_loss, out.indices, feat


def decode_code(params: Params, cfg: VQGANConfig,
                indices: jax.Array) -> jax.Array:
    """indices: (B, h, w, Q) codebook ids -> pixels (B, S, S, 3).

    Reference: VQModel.decode_code (vqgan.py:127-130)."""
    codes = lfq.indices_to_codes(indices, lfq_spec(cfg))  # (B,h,w,embed_dim)
    quant = conv2d(codes, **params["post_quant_conv"])
    return decoder_forward(params["decoder"], cfg, quant)
