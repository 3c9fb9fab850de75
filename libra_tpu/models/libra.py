"""Libra decoder: LLaMA backbone with a decoupled (routed) vision system.

TPU-native re-design of the reference decoder (modeling_libra.py:245-1188):

* modality routing is dense masked dual-path compute (see ops/routed.py),
  not gather/scatter -- static shapes, MXU-friendly;
* the K/V bridge is a cross-modality mask in attention (see ops/attention.py),
  not tensor cloning;
* layers are stacked and driven by `lax.scan` (one compiled layer body),
  with optional `jax.checkpoint` rematerialisation for training;
* the KV cache is a preallocated static-shape ring of (K, Kb, V, Vb, flag)
  written with dynamic_update_slice -- the bridged-cache tuple of the
  reference (modeling_libra.py:344-361) without dynamic shapes.

Parameters are plain pytrees (dicts of arrays); weights are stored in
x @ W orientation (in_features first). See libra_tpu/checkpoint.py for the
PyTorch-name mapping used when importing reference weights.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _ckpt_name

from libra_tpu.config import LibraConfig
from libra_tpu.ops.attention import (AttentionInputs, BIG_NEG, bridged_attention,
                                     causal_bias)
from libra_tpu.ops.norm import rms_norm
from libra_tpu.ops.rope import apply_rope, apply_rope_2d, rope_cos_sin
from libra_tpu.ops.routed import (gather_rows, low_rank_linear,
                                  routed_dropout, routed_linear,
                                  routed_low_rank, select_by_flag,
                                  split_merge)

Params = Dict[str, Any]


def dropout_enabled(cfg: LibraConfig) -> bool:
    """True when any reference pdrop field is nonzero (the train step must
    then supply a dropout_rng; reference: configuration_libra.py pdrops
    applied at modeling_llama.py:226-228, modeling_libra.py:254,426-427,
    543-551,767)."""
    return any(r > 0.0 for r in (cfg.resid_pdrop, cfg.attn_pdrop,
                                 cfg.embd_pdrop, cfg.vision_embd_pdrop,
                                 cfg.vision_resid_pdrop))


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------

def _normal(key, shape, std, dtype):
    return std * jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


def _init_low_rank(key, d_in, d_bottleneck, d_out, std, dtype, zero_b: bool):
    ka, kb = jax.random.split(key)
    wa = _normal(ka, (d_in, d_bottleneck), std, dtype)
    wb = (jnp.zeros((d_bottleneck, d_out), dtype)
          if zero_b else _normal(kb, (d_bottleneck, d_out), std, dtype))
    return {"wa": wa, "wb": wb}


def init_layer_params(key, cfg: LibraConfig) -> Params:
    D, I = cfg.hidden_size, cfg.intermediate_size
    Db = D // cfg.vision_down_ratio
    Ib = I // cfg.vision_down_ratio
    r = cfg.bridge_rank
    std = cfg.initializer_range
    pd = cfg.params_dtype
    zero_b = cfg.addition_mode  # reference: modeling_libra.py:502-509
    keys = iter(jax.random.split(key, 24))
    nk = lambda: next(keys)

    attn = {
        "q_proj": _normal(nk(), (D, D), std, pd),
        "k_proj": _normal(nk(), (D, D), std, pd),
        "v_proj": _normal(nk(), (D, D), std, pd),
        "o_proj": _normal(nk(), (D, D), std, pd),
        "vision_q": _init_low_rank(nk(), D, Db, D, std, pd, zero_b),
        "vision_k": _init_low_rank(nk(), D, Db, D, std, pd, zero_b),
        "vision_v": _init_low_rank(nk(), D, Db, D, std, pd, zero_b),
        "vision_o": _init_low_rank(nk(), D, Db, D, std, pd, zero_b),
    }
    if cfg.use_bridge:
        # bridge B-weights init to zero (rank mode, modeling_libra.py:183-184)
        attn.update({
            "k_bridge_lang": _init_low_rank(nk(), D, r, D, std, pd, True),
            "k_bridge_vis": _init_low_rank(nk(), D, r, D, std, pd, True),
            "v_bridge_lang": _init_low_rank(nk(), D, r, D, std, pd, True),
            "v_bridge_vis": _init_low_rank(nk(), D, r, D, std, pd, True),
        })
    mlp = {
        "gate_proj": _normal(nk(), (D, I), std, pd),
        "up_proj": _normal(nk(), (D, I), std, pd),
        "down_proj": _normal(nk(), (I, D), std, pd),
        "vision_gate": _init_low_rank(nk(), D, Ib, I, std, pd, zero_b),
        "vision_up": _init_low_rank(nk(), D, Ib, I, std, pd, zero_b),
        "vision_down": _init_low_rank(nk(), I, Db, D, std, pd, zero_b),
    }
    ones = lambda: jnp.ones((D,), pd)
    return {
        "attn": attn,
        "mlp": mlp,
        "input_layernorm": ones(),
        "post_attention_layernorm": ones(),
        "vision_input_layernorm": ones(),
        "vision_post_attention_layernorm": ones(),
    }


def init_params(key, cfg: LibraConfig) -> Params:
    """Random-init full parameter pytree (layer params stacked on axis 0)."""
    D, V = cfg.hidden_size, cfg.vocab_size
    Q, Vv = cfg.vision_codebook_num, cfg.vision_vocab_size
    S = cfg.contiguous_signal_size
    std = cfg.initializer_range
    pd = cfg.params_dtype
    keys = iter(jax.random.split(key, 12))
    nk = lambda: next(keys)

    layer_keys = jax.random.split(nk(), cfg.num_hidden_layers)
    layers = jax.vmap(lambda k: init_layer_params(k, cfg))(layer_keys)

    head_in = D * 2 if cfg.vision_prediction_mode == "2d" else D
    params: Params = {
        "embed_tokens": _normal(nk(), (V, D), std, pd),
        "vision_embed_tokens": _normal(nk(), (Q, Vv, D // Q), std, pd),
        "layers": layers,
        "norm": jnp.ones((D,), pd),
        "vision_norm": jnp.ones((D,), pd),
        "lm_head": _normal(nk(), (D, V), std, pd),
        "vision_lm_head": _normal(nk(), (Q, head_in, Vv), std, pd),
    }
    if cfg.concat_signals:
        params["signal_proj"] = _normal(nk(), (S + D, D), std, pd)
        if cfg.norm_signals:
            params["signal_norm"] = jnp.ones((S + D,), pd)
    else:
        params["signal_proj"] = _normal(nk(), (S, D), std, pd)
    if cfg.use_vision_position_embedding:
        params["vision_position_embedding"] = _normal(
            nk(), (cfg.max_vision_token_length, D), std, pd)
    if cfg.vision_prediction_mode == "2d":
        params["vision_hidden_placeholder"] = _normal(nk(), (D,), std, pd)
    return params


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    """Static-shape bridged KV cache.

    k/kb/v/vb: (num_layers, B, max_len, H, head_dim); kb/vb absent (None)
    when use_bridge=False. flag: (B, max_len) vision flags of cached tokens.
    index: number of tokens already written -- scalar int32 (all rows in
    lockstep, the Generator decode), or (B,) int32 for PER-SLOT timelines
    (the serving engine: each slot owns positions [0, index_b) of its own
    row and recycles independently).
    """
    k: jax.Array
    v: jax.Array
    kb: Optional[jax.Array]
    vb: Optional[jax.Array]
    flag: jax.Array
    index: jax.Array


def init_cache(cfg: LibraConfig, batch: int, max_len: int,
               dtype=None, quantized: bool = False) -> KVCache:
    """quantized=True: int8 K/V with per-(token, head) scales -- halves the
    cache's HBM footprint AND its per-step read traffic (net-new vs the
    reference's fp16 tuple cache, modeling_libra.py:344-361).

    Quantized buffers are HEAD-MAJOR (L, B, H, S, d): the fused decode-
    attention kernel (ops/pallas/decode_attention.py) reads each grid
    cell's heads as one contiguous (hb, S, d) block -- the r2
    sequence-major layout gave it 1 KB strided DMAs (6x slower than the
    XLA path it was meant to replace). Plain bf16 buffers stay
    sequence-major (L, B, S, H, d), the layout bridged_attention consumes.

    Scale layout is (L, B, H, S) -- sequence minor -- NOT (..., S, H, 1):
    a trailing size-1 dim is tile-padded to 128 lanes on TPU, which made
    the scale buffers occupy (and stream) ~100x their logical bytes
    (measured ~13 ms/step of pure scale DMA in the r2 profile)."""
    from libra_tpu.quantization import QuantizedArray

    dtype = dtype or cfg.compute_dtype
    L, H, d = cfg.num_hidden_layers, cfg.num_attention_heads, cfg.head_dim

    def z():
        if quantized:
            return QuantizedArray(
                jnp.zeros((L, batch, H, max_len, d), jnp.int8),
                jnp.zeros((L, batch, H, max_len), jnp.float32))
        return jnp.zeros((L, batch, max_len, H, d), dtype)

    return KVCache(
        k=z(), v=z(),
        kb=z() if cfg.use_bridge else None,
        vb=z() if cfg.use_bridge else None,
        flag=jnp.zeros((batch, max_len), jnp.bool_),
        index=jnp.zeros((), jnp.int32),
    )


def _write_seq(buf: jax.Array, new: jax.Array, index) -> jax.Array:
    """Write `new` (B, N, ...) into `buf` (B, S, ...) at sequence offset
    `index` -- scalar (same offset for every row) or (B,) per-row offsets."""
    new = new.astype(buf.dtype)
    if getattr(index, "ndim", 0) == 1:
        def row(b, n, i):
            return jax.lax.dynamic_update_slice(b, n, (i,) + (0,) * (b.ndim - 1))
        return jax.vmap(row)(buf, new, index)
    return jax.lax.dynamic_update_slice(
        buf, new, (0, index) + (0,) * (buf.ndim - 2))


def _write_cache(buf, new: jax.Array, layer_idx, index):
    """Write one layer's new K/V into the FULL STACKED cache buffer,
    in place (the cache is a layer-scan CARRY: dynamic_update_slice on a
    carry aliases; the r2 scan-xs/ys threading re-materialised the whole
    4x400 MB cache every decode step).

    buf: sequence-major (L, B, S, H, d) array or HEAD-MAJOR QuantizedArray
    (q (L, B, H, S, d), scale (L, B, H, S)); new: (B, N, H, d); write at
    layer `layer_idx`, sequence offset `index` (per-row when index is a
    (B,) vector)."""
    from libra_tpu.quantization import QuantizedArray

    li = jnp.asarray(layer_idx, jnp.int32)
    if isinstance(buf, QuantizedArray):
        a = jnp.max(jnp.abs(new.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.where(a > 0, a, 1.0) / 127.0
        q = jnp.clip(jnp.round(new.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        q_hm = q.transpose(0, 2, 1, 3)                       # (B, H, N, d)
        scale_hn = scale[..., 0].transpose(0, 2, 1)          # (B, H, N)
        scale_hn = scale_hn.astype(buf.scale.dtype)
        if getattr(index, "ndim", 0) == 1:
            # per-slot offsets (serving): a STATIC Python loop of chained
            # in-place updates over the (small) slot pool. A vmap over the
            # batch axis here made XLA physically transpose every 400 MB
            # cache buffer to batch-major and back PER LAYER PER STEP
            # (profiled 314 ms/step -- 16x the whole useful decode work).
            new_q, new_scale = buf.q, buf.scale
            for b in range(new.shape[0]):
                new_q = jax.lax.dynamic_update_slice(
                    new_q, q_hm[b:b + 1][None], (li, b, 0, index[b], 0))
                new_scale = jax.lax.dynamic_update_slice(
                    new_scale, scale_hn[b:b + 1][None], (li, b, 0, index[b]))
        else:
            new_q = jax.lax.dynamic_update_slice(
                buf.q, q_hm[None], (li, 0, 0, index, 0))
            new_scale = jax.lax.dynamic_update_slice(
                buf.scale, scale_hn[None], (li, 0, 0, index))
        return QuantizedArray(new_q, new_scale)

    new = new.astype(buf.dtype)
    if getattr(index, "ndim", 0) == 1:
        out = buf
        for b in range(new.shape[0]):
            out = jax.lax.dynamic_update_slice(
                out, new[b:b + 1][None], (li, b, index[b], 0, 0))
        return out
    return jax.lax.dynamic_update_slice(
        buf, new[None], (li, 0, index, 0, 0))


def _write_cache_row(buf, new: jax.Array, layer_idx, row, offset,
                     write=None):
    """Write one row's K/V block into the FULL STACKED cache buffer at a
    traced (row, sequence-offset): new (1, C, H, d) lands at
    buf[layer_idx, row, offset:offset+C] (head-major transpose for
    quantized buffers, as _write_cache). The serving engine's packed
    merged-prefill step uses this for the prompt-chunk segment -- ONE
    contiguous block write per layer instead of C scattered tokens.

    write (scalar bool or None): when False the write is a VALUE-masked
    no-op (old block read back and rewritten). The packed step's "parked"
    iterations target the just-finished row's decode territory, where a
    blind junk write would clobber the decode token K/V written earlier
    in the same layer."""
    from libra_tpu.quantization import QuantizedArray

    li = jnp.asarray(layer_idx, jnp.int32)
    C = new.shape[1]
    if isinstance(buf, QuantizedArray):
        a = jnp.max(jnp.abs(new.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.where(a > 0, a, 1.0) / 127.0
        q = jnp.clip(jnp.round(new.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        q_hm = q.transpose(0, 2, 1, 3)                       # (1, H, C, d)
        scale_hn = scale[..., 0].transpose(0, 2, 1).astype(buf.scale.dtype)
        if write is not None:
            H, d = q_hm.shape[1], q_hm.shape[3]
            old_q = jax.lax.dynamic_slice(
                buf.q, (li, row, 0, offset, 0), (1, 1, H, C, d))[0]
            old_s = jax.lax.dynamic_slice(
                buf.scale, (li, row, 0, offset), (1, 1, H, C))[0]
            q_hm = jnp.where(write, q_hm, old_q)
            scale_hn = jnp.where(write, scale_hn, old_s)
        new_q = jax.lax.dynamic_update_slice(
            buf.q, q_hm[None], (li, row, 0, offset, 0))
        new_scale = jax.lax.dynamic_update_slice(
            buf.scale, scale_hn[None], (li, row, 0, offset))
        return QuantizedArray(new_q, new_scale)
    blk = new.astype(buf.dtype)
    if write is not None:
        H, d = blk.shape[2], blk.shape[3]
        old = jax.lax.dynamic_slice(
            buf, (li, row, offset, 0, 0), (1, 1, C, H, d))[0]
        blk = jnp.where(write, blk, old)
    return jax.lax.dynamic_update_slice(
        buf, blk[None], (li, row, offset, 0, 0))


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def embed_inputs(params: Params, cfg: LibraConfig, input_ids: jax.Array,
                 vision_flag: jax.Array,
                 contiguous_signal: Optional[jax.Array],
                 vision_indices: Optional[jax.Array],
                 lang_only: bool = False) -> jax.Array:
    """Multi-codebook embedding + continuous-signal fusion.

    Reference: get_inputs_embeds_from_multicodebook (modeling_libra.py:625-661)
    plus the id-offset strip at 746-751. input_ids: (Q, B, N) raw combined-vocab
    ids (vision ids carry the +vocab_size offset).

    lang_only: statically skip the vision embed chain (per-codebook embeds,
    vision pos-emb, signal_proj) -- see forward().
    """
    V, Vv = cfg.vocab_size, cfg.vision_vocab_size
    cd = cfg.compute_dtype

    text_ids = jnp.clip(input_ids[0], 0, V - 1)
    text_emb = params["embed_tokens"][text_ids].astype(cd)           # (B,N,D)
    if lang_only:
        return text_emb

    vis_ids = jnp.clip(input_ids - V, 0, Vv - 1)                     # (Q,B,N)
    # per-codebook embed, concat on features (modeling_libra.py:629-634)
    vis_emb = jnp.concatenate(
        [params["vision_embed_tokens"][q][vis_ids[q]].astype(cd)
         for q in range(cfg.vision_codebook_num)], axis=-1)          # (B,N,D)

    if cfg.use_vision_position_embedding:
        vpe = params["vision_position_embedding"][
            jnp.clip(vision_indices, 0, cfg.max_vision_token_length - 1)]
        vis_emb = vis_emb + vpe.astype(cd)

    if cfg.concat_signals:
        B, N = text_ids.shape
        if contiguous_signal is None:
            sig = jnp.zeros((B, N, cfg.contiguous_signal_size), cd)
        else:
            sig = contiguous_signal.astype(cd)
        from libra_tpu.ops.qlinear import qdot
        cat = jnp.concatenate([vis_emb, sig], axis=-1)
        if cfg.norm_signals:
            cat = rms_norm(cat, params["signal_norm"], cfg.rms_norm_eps)
        vis_emb = qdot(cat, params["signal_proj"])

    h = select_by_flag(vision_flag, vis_emb, text_emb)

    if (not cfg.concat_signals) and contiguous_signal is not None:
        # additive mode applies to ALL positions (modeling_libra.py:753-754)
        h = h + jnp.einsum("bns,sd->bnd", contiguous_signal.astype(cd),
                           params["signal_proj"].astype(cd))
    return h


# ---------------------------------------------------------------------------
# Position ids
# ---------------------------------------------------------------------------

def position_ids_from_mask(attention_mask: jax.Array) -> jax.Array:
    """cumsum(mask)-1 with pad positions set to 1
    (reference: modeling_libra.py:1203-1205)."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.where(attention_mask == 0, 1, pos)


def make_2d_pos_offset(cfg: LibraConfig) -> jax.Array:
    """(max_vision_token_length + 1, 2) table: BOI->0, grid (i,j) 1-indexed,
    EOI->0, text (index==578)->0. Reference: modeling_libra.py:576-587."""
    R = cfg.image_feature_resolution
    i = jnp.arange(1, R + 1)
    hh = jnp.broadcast_to(i[:, None], (R, R))
    ww = jnp.broadcast_to(i[None, :], (R, R))
    grid = jnp.stack([hh, ww], axis=-1).reshape(-1, 2)
    return jnp.concatenate(
        [jnp.zeros((1, 2), jnp.int32), grid.astype(jnp.int32),
         jnp.zeros((2, 2), jnp.int32)], axis=0)


def get_2d_position_ids(cfg: LibraConfig, vision_indices: jax.Array,
                        attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """2D-RoPE position ids, (B, 2, N).

    Reference: LibraModel.get_2d_position_ids (modeling_libra.py:663-678):
    text/BOI advance the base counter by 1, EOI advances by R+1, in-image
    tokens advance 0 and add their (row, col) offset.
    """
    M, R = cfg.max_vision_token_length, cfg.image_feature_resolution
    step = jnp.logical_or(vision_indices == M, vision_indices == 0)
    if attention_mask is not None:
        step = jnp.where(attention_mask == 0, False, step)
    step = step.astype(jnp.int32)
    step = jnp.where(vision_indices == M - 1, R + 1, step)
    base = jnp.cumsum(step, axis=-1) - 1                       # (B, N)
    pos = jnp.broadcast_to(base[..., None], base.shape + (2,))
    offset = make_2d_pos_offset(cfg)[jnp.clip(vision_indices, 0, M)]
    pos = pos + offset
    if attention_mask is not None:
        pos = jnp.where((attention_mask == 0)[..., None], 1, pos)
    return pos.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------

def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, N, D = x.shape
    return x.reshape(B, N, num_heads, D // num_heads)


def _choose_block_q(nq: int) -> Optional[int]:
    """q-block for the fused prefill kernel. Mosaic tiling: a block dim
    must be a multiple of the bf16 sublane tile (16) OR the full dim, so
    prefer the largest power-of-two <= 256 dividing nq; otherwise a
    single FULL-dim block (always tile-legal, how ragged prompts like the
    610-token VQA shape ride the kernel -- VERDICT r3 item 6). Ragged
    lengths past 1024 keep a bias block over ~4 MB VMEM: fall back (None)
    to the XLA path."""
    for b in (256, 128, 64, 32, 16):
        if nq % b == 0:
            return b
    return nq if nq <= 1024 else None


def _attention(p: Params, cfg: LibraConfig, h: jax.Array, flag: jax.Array,
               cos, sin, position_ids, bias, kv_flag,
               cache_slice, attn_impl: str = "xla",
               dropout_rng: Optional[jax.Array] = None,
               text_span=None, lang_only: bool = False) -> Tuple[jax.Array, Any]:
    """Routed attention with bridge. h is the (routed-)normed input.

    lang_only (decode-only; requires a cache): statically skip the vision
    q/k/v/o projections AND the bridge k/v computation+write for the new
    tokens -- their cache slots are provably never read (the cross-modality
    mask is zero for text-query/text-key pairs) while the PROMPT's bridge
    K/V stay in the cache and are still read for text->vision attention.

    cache_slice: None (no cache) or {"bufs": dict of FULL STACKED cache
    buffers (the layer-scan carry), "layer": this layer's index, "index":
    the sequence write offset}. Returns (attn_out (B,N,D), updated bufs).
    """
    H = cfg.num_attention_heads
    am = cfg.addition_mode
    a = p["attn"]
    if dropout_rng is not None:
        rng_attn, rng_o = jax.random.split(dropout_rng)
    else:
        rng_attn = rng_o = None

    if lang_only:
        assert cache_slice is not None, \
            "lang_only is a cached-decode mode (prompts need the full path)"

    def rproj(name):
        # checkpoint_name tags are identity outside a names-policy remat
        # (see forward()'s remat arg); they let training save exactly the
        # big merged projection outputs instead of recomputing them
        if lang_only:
            from libra_tpu.ops.qlinear import qdot
            return _ckpt_name(qdot(h, a[name]), "attn_" + name[0])
        vp = a["vision_" + name[0]]  # vision_q / vision_k / vision_v
        return _ckpt_name(
            routed_linear(h, flag, a[name], vp["wa"], vp["wb"], am,
                          text_span=text_span), "attn_" + name[0])

    q = _split_heads(rproj("q_proj"), H)
    k = _split_heads(rproj("k_proj"), H)
    v = _split_heads(rproj("v_proj"), H)

    rope = (functools.partial(apply_rope_2d) if cfg.use_2d_rope
            else functools.partial(apply_rope))
    q = rope(q, cos, sin, position_ids)
    k = rope(k, cos, sin, position_ids)

    kb = vb = None
    if cfg.use_bridge and not lang_only:
        kb = _split_heads(routed_low_rank(
            h, flag, a["k_bridge_lang"]["wa"], a["k_bridge_lang"]["wb"],
            a["k_bridge_vis"]["wa"], a["k_bridge_vis"]["wb"]), H)
        vb = _split_heads(routed_low_rank(
            h, flag, a["v_bridge_lang"]["wa"], a["v_bridge_lang"]["wb"],
            a["v_bridge_vis"]["wa"], a["v_bridge_vis"]["wb"]), H)
        kb = rope(kb, cos, sin, position_ids)  # rope is linear: rope(K+Kb)

    new_cache = None
    decode_kernel_out = None
    if cache_slice is not None:
        from libra_tpu.quantization import QuantizedArray
        cd = q.dtype
        li = cache_slice["layer"]
        idx = cache_slice["index"]

        def rd(buf):
            # XLA fallback (prefill, CPU, TP mesh): slice this layer out of
            # the stacked carry, dequantize for the attention dots and
            # FORCE materialisation (optimization_barrier): letting XLA
            # fuse the dequant into the dots turns them into VPU
            # multiply-reduce fusions off the MXU -- profiled at
            # ~26 ms/step on the full-32-layer decode, vs ~4 ms for
            # materialise-then-MXU-dot. (Score-folded int8 consumption was
            # also tried: slower still, and crashed the compiler at 32
            # layers.) TPU decode never runs this: the fused kernel reads
            # the raw stacked head-major int8 buffers directly.
            if isinstance(buf, QuantizedArray):
                qs = jax.lax.dynamic_index_in_dim(buf.q, li, 0,
                                                  keepdims=False)
                ss = jax.lax.dynamic_index_in_dim(buf.scale, li, 0,
                                                  keepdims=False)
                # head-major (B, H, S, d) -> sequence-major (B, S, H, d)
                deq = qs.astype(cd) * ss.astype(cd)[..., None]
                return jax.lax.optimization_barrier(deq).transpose(0, 2, 1, 3)
            return jax.lax.dynamic_index_in_dim(buf, li, 0, keepdims=False)

        bufs = cache_slice["bufs"]
        ck = _write_cache(bufs["k"], k, li, idx)
        cv = _write_cache(bufs["v"], v, li, idx)
        new_cache = {"k": ck, "v": cv}
        ckb = cvb = None
        if cfg.use_bridge:
            if lang_only:
                # no write: the new slots' bridge K/V are never attended
                ckb, cvb = bufs["kb"], bufs["vb"]
            else:
                ckb = _write_cache(bufs["kb"], kb, li, idx)
                cvb = _write_cache(bufs["vb"], vb, li, idx)
            new_cache.update({"kb": ckb, "vb": cvb})

        from libra_tpu.ops.pallas import decode_attention as DA
        if (rng_attn is None and DA.decode_kernel_active()
                and DA.decode_kernel_applicable(cfg, ck, q.shape[1])):
            # DEFAULT decode path for quantized caches on TPU: fused
            # attention reading the raw stacked head-major int8 buffers
            # once, layer selected via scalar prefetch -- no cache slices,
            # no dequant-materialise triple pass (the r2 headline
            # bottleneck, VERDICT r3 item 1). Off under a TP mesh
            # (pallas_call is opaque to GSPMD -- decode_kernel_active)
            # and via LIBRA_DECODE_ATTN_KERNEL=0 (captured at import).
            decode_kernel_out = DA.int8_decode_attention(
                q, ck.q, ck.scale, cv.q, cv.scale,
                kbq=None if ckb is None else ckb.q,
                kbs=None if ckb is None else ckb.scale,
                vbq=None if cvb is None else cvb.q,
                vbs=None if cvb is None else cvb.scale,
                flag_q=flag, kv_flag=kv_flag,
                bias=bias[:, 0], layer_idx=li, interpret=DA.INTERPRET)
        else:
            k, v = rd(ck), rd(cv)
            if cfg.use_bridge:
                kb, vb = rd(ckb), rd(cvb)

    # attention-prob dropout is only implemented on the XLA path; force it
    # when active (the Pallas flash kernel never rematerialises the probs)
    attn_drop_on = rng_attn is not None and cfg.attn_pdrop > 0.0
    block_q = (_choose_block_q(q.shape[1])
               if attn_impl == "pallas" and not attn_drop_on else None)
    if decode_kernel_out is not None:
        out = decode_kernel_out
    elif block_q is not None:
        from libra_tpu.ops.pallas.flash_bridge import flash_bridged_attention
        out = flash_bridged_attention(q, k, v, kb, vb, flag, kv_flag,
                                      bias, block_q=block_q)
    else:
        out = bridged_attention(AttentionInputs(q, k, v, kb, vb),
                                flag, kv_flag, bias,
                                dropout=(rng_attn, cfg.attn_pdrop))
    out = out.reshape(h.shape[0], h.shape[1], cfg.hidden_size)
    if lang_only:
        from libra_tpu.ops.qlinear import qdot
        return qdot(out, a["o_proj"]), new_cache
    vo = a["vision_o"]
    out = routed_linear(out, flag, a["o_proj"], vo["wa"], vo["wb"], am,
                        dropout=(rng_o, cfg.resid_pdrop,
                                 cfg.vision_resid_pdrop),
                        text_span=text_span)
    return _ckpt_name(out, "attn_o"), new_cache


def _mlp(p: Params, cfg: LibraConfig, h: jax.Array, flag: jax.Array,
         dropout_rng: Optional[jax.Array] = None,
         text_span=None, lang_only: bool = False) -> jax.Array:
    """Routed SwiGLU MLP (reference: LibraMLP, modeling_libra.py:206-238).
    Note: LibraMLP routes strictly even in addition_mode (its forward never
    consults the flag's addition variant)."""
    from libra_tpu.ops.qlinear import qdot
    m = p["mlp"]

    def lang_mlp(x):
        g = _ckpt_name(qdot(x, m["gate_proj"]), "mlp_gate")
        u = _ckpt_name(qdot(x, m["up_proj"]), "mlp_up")
        return _ckpt_name(qdot(jax.nn.silu(g) * u, m["down_proj"]),
                          "mlp_down")

    if lang_only:
        # text-only decode: the vision MLP (the largest vision-weight read,
        # ~125M params/layer) is statically skipped
        return lang_mlp(h)

    gate_v = _ckpt_name(low_rank_linear(
        h, m["vision_gate"]["wa"], m["vision_gate"]["wb"]), "mlp_vgate")
    up_v = _ckpt_name(low_rank_linear(
        h, m["vision_up"]["wa"], m["vision_up"]["wb"]), "mlp_vup")
    vis = _ckpt_name(low_rank_linear(
        jax.nn.silu(gate_v) * up_v,
        m["vision_down"]["wa"], m["vision_down"]["wb"]), "mlp_vdown")
    if text_span is not None and dropout_rng is None:
        # modality-split prefill: the full-rank language MLP (the expensive
        # path -- 60% of the layer's dot FLOPs) runs only on the gathered
        # text rows; strict routing makes this exact in every mode
        src, inv = text_span
        out = split_merge(flag, vis, lang_mlp(gather_rows(h, src)), inv)
    else:
        out = select_by_flag(flag, vis, lang_mlp(h))
    # per-path post-down_proj dropout (reference: modeling_libra.py:232-233);
    # strict routing => per-position modality rate after the merge
    return routed_dropout(dropout_rng, out, flag,
                          cfg.vision_resid_pdrop, cfg.resid_pdrop)


def decoder_layer(p: Params, cfg: LibraConfig, h: jax.Array, flag: jax.Array,
                  cos, sin, position_ids, bias, kv_flag,
                  cache_slice, attn_impl: str = "xla",
                  dropout_rng: Optional[jax.Array] = None,
                  text_span=None, lang_only: bool = False) -> Tuple[jax.Array, Any]:
    """One pre-norm decoder layer with separate vision RMSNorms
    (reference: LibraDecoderLayer, modeling_libra.py:416-491)."""
    eps = cfg.rms_norm_eps
    if dropout_rng is not None:
        rng_attn, rng_mlp = jax.random.split(dropout_rng)
    else:
        rng_attn = rng_mlp = None

    def routed_norm(x, name):
        if lang_only:
            return rms_norm(x, p[name], eps)
        return select_by_flag(flag, rms_norm(x, p["vision_" + name], eps),
                              rms_norm(x, p[name], eps))

    hn = routed_norm(h, "input_layernorm")
    attn_out, new_cache = _attention(p, cfg, hn, flag, cos, sin,
                                     position_ids, bias, kv_flag, cache_slice,
                                     attn_impl, dropout_rng=rng_attn,
                                     text_span=text_span, lang_only=lang_only)
    h = h + attn_out
    hn2 = routed_norm(h, "post_attention_layernorm")
    h = h + _mlp(p, cfg, hn2, flag, dropout_rng=rng_mlp,
                 text_span=text_span, lang_only=lang_only)
    return h, new_cache


def text_span_maps(cfg: LibraConfig, img_start: jax.Array, N: int):
    """Row maps for the modality-split prefill (see routed_linear).

    For prompts where EVERY row carries exactly one full image block of
    Mv = max_vision_token_length tokens starting at img_start[b] (the fused
    raw-pixels prefill layout, generation.py), the non-vision positions of
    each row are [0, img_start) + [img_start+Mv, N) -- exactly T = N - Mv
    of them, a STATIC width. Returns (src (B, T), inv (B, N)):
      src[b, j] = j-th non-vision position of row b;
      inv[b, n] = index into src recovering position n (clipped junk at
                  vision positions; callers select those away by flag).
    Left-padding rows is fine: pad positions are non-vision, are covered by
    src, and their (garbage either way) outputs are masked downstream.
    Returns None when the prompt has no text budget (N == Mv)."""
    Mv = cfg.max_vision_token_length
    T = N - Mv
    if T <= 0:
        return None
    start = img_start[:, None]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    src = j + Mv * (j >= start)
    n = jnp.arange(N, dtype=jnp.int32)[None, :]
    inv = jnp.clip(n - Mv * (n >= start + Mv), 0, T - 1)
    return src, inv


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

class ModelOutput(NamedTuple):
    hidden_states: jax.Array        # (B, N, D) -- routed-final-norm applied
    cache: Optional[KVCache]


# every checkpoint_name tag in the decoder layer: the merged q/k/v/o
# projection outputs and the six MLP dot outputs (language gate/up/down +
# vision-twin gate/up/down -- the twins are NOT cheap: down_ratio=4
# bottlenecks at out/4, so e.g. the vision gate is 4096->2752->11008,
# nearly the language gate's FLOPs). Saving all of these removes ~90% of
# the per-layer backward recompute at ~0.77 GB/layer (B=8, N=698, bf16).
BIG_DOT_NAMES = ("attn_q", "attn_k", "attn_v", "attn_o",
                 "mlp_gate", "mlp_up", "mlp_down",
                 "mlp_vgate", "mlp_vup", "mlp_vdown")


def _remat_policy(remat):
    """Map forward()'s remat argument to a jax.checkpoint policy.

    True/"full" -> None (save layer inputs only; backward recomputes each
    layer's forward -- lowest memory, the 11B fsdp8 pretrain fit).
    "dots" -> dots_with_no_batch_dims_saveable (measured r5: 17.0 GB
    compiled peak on the L=4/B=8 proxy -- OOMs a 16 GB v5e; kept for
    bigger-HBM parts). "big_dots" -> save_only_these_names(BIG_DOT_NAMES).
    "names:a,b,..." -> save_only_these_names of any BIG_DOT_NAMES subset
    (the memory/recompute dial; see docs/training.md for the ladder)."""
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if remat == "big_dots":
        return jax.checkpoint_policies.save_only_these_names(*BIG_DOT_NAMES)
    if isinstance(remat, str) and remat.startswith("names:"):
        names = tuple(remat[len("names:"):].split(","))
        unknown = set(names) - set(BIG_DOT_NAMES)
        if unknown:
            raise ValueError(f"unknown remat names {sorted(unknown)}; "
                             f"available: {BIG_DOT_NAMES}")
        return jax.checkpoint_policies.save_only_these_names(*names)
    if remat in (True, "full"):
        return None
    raise ValueError(f"remat must be falsy, True, 'full', 'dots', "
                     f"'big_dots' or 'names:...' -- got {remat!r}")


def forward(params: Params, cfg: LibraConfig, input_ids: jax.Array,
            attention_mask: jax.Array, vision_indices: jax.Array,
            contiguous_signal: Optional[jax.Array] = None,
            position_ids: Optional[jax.Array] = None,
            cache: Optional[KVCache] = None,
            remat=False,
            attn_impl: str = "xla",
            dropout_rng: Optional[jax.Array] = None,
            text_span=None, lang_only: bool = False) -> ModelOutput:
    """Backbone forward (reference: LibraModel.forward, modeling_libra.py:680-831).

    input_ids: (Q, B, N) combined-vocab ids.
    attention_mask: (B, N) without cache, or (B, max_cache_len) with cache
      (slots >= written prompt+generated are 0).
    vision_indices: (B, N) in [0, 578]; 578 == text.
    dropout_rng: per-step rng enabling train-time dropout at the reference's
      sites (embd/attn/resid and their vision_* twins); None = eval/decode
      (nn.Dropout identity).
    remat: False = no rematerialisation (eval/decode); True or "full" =
      per-layer `jax.checkpoint` (backward recomputes each layer's forward
      from its input -- lowest memory, the 11B fsdp8 fit in BENCH
      train_compile); "dots" = checkpoint with
      `dots_with_no_batch_dims_saveable` (matmul outputs saved, only
      elementwise/attention recomputed -- trades ~0.5 GB/layer of saved
      activations at B=8xN=698 for skipping the 2PT forward recompute in
      the backward; measured r5 on the L=4 proxy: see docs/training.md).
    lang_only: STATIC text-only decode mode (cached decode of prompts that
      END in text). Vision projections/MLP/norms/embeds and new-token bridge
      writes are skipped entirely -- EXACT, not approximate: assemble_logits
      puts -inf on the whole vision vocab (incl. BOI) at text positions, so
      a text-ending sequence can never re-enter vision during decode, and
      every skipped computation fed only discarded where() branches. Halves
      decode weight traffic for captioning/VQA serving (text answers).
    """
    flag = vision_indices < cfg.max_vision_token_length
    B, N = flag.shape
    if dropout_rng is not None and not dropout_enabled(cfg):
        dropout_rng = None       # all rates 0: skip the rng plumbing
    h = embed_inputs(params, cfg, input_ids, flag, contiguous_signal,
                     vision_indices, lang_only=lang_only)
    if dropout_rng is not None:
        dropout_rng, rng_embd = jax.random.split(dropout_rng)
        # routed embedding dropout (reference: modeling_libra.py:767)
        h = routed_dropout(rng_embd, h, flag,
                           cfg.vision_embd_pdrop, cfg.embd_pdrop)

    if cache is None:
        rope_len = max(cfg.max_position_embeddings, N)
        kv_flag = flag
        bias = causal_bias(attention_mask, N, N)
        if position_ids is None:
            position_ids = (get_2d_position_ids(cfg, vision_indices, attention_mask)
                            if cfg.use_2d_rope
                            else position_ids_from_mask(attention_mask))
    else:
        S = cache.flag.shape[1]
        rope_len = max(cfg.max_position_embeddings, S)
        kv_flag = _write_seq(cache.flag, flag, cache.index)
        # queries occupy slots [index, index+N); keys are the whole buffer.
        # index may be per-row (B,) -- each serving slot has its own timeline
        q_slots = jnp.expand_dims(cache.index, -1) + jnp.arange(N)  # (N,) | (B,N)
        causal = jnp.arange(S) <= q_slots[..., None]        # (N,S) | (B,N,S)
        if causal.ndim == 2:
            causal = causal[None]
        keep = causal[:, None] & attention_mask.astype(bool)[:, None, None, :]
        bias = jnp.where(keep, 0.0, BIG_NEG).astype(jnp.float32)
        if position_ids is None:
            raise ValueError("position_ids must be provided when using a cache")

    cos, sin = rope_cos_sin(rope_len, cfg.head_dim, cfg.rope_theta)

    layer_rngs = (jax.random.split(dropout_rng, cfg.num_hidden_layers)
                  if dropout_rng is not None else None)

    layers = params["layers"]

    def take_layer(idx):
        """Layer `idx` of the stacked params. Quantized leaves become
        zero-copy LayerViews (the Pallas int8 kernel reads straight from
        the stacked HBM buffer; a sliced copy per layer per step would
        triple decode HBM traffic); plain leaves are dynamic-index slices
        that XLA fuses into their consumers."""
        from libra_tpu.quantization import LayerView, QuantizedArray

        def pick(leaf):
            if isinstance(leaf, QuantizedArray):
                return LayerView(leaf, idx)
            return leaf[idx]

        return jax.tree_util.tree_map(
            pick, layers, is_leaf=lambda x: isinstance(x, QuantizedArray))

    def body(carry, xs):
        rng = None
        if layer_rngs is not None:
            xs, rng = xs
        idx = xs
        if cache is None:
            carry_h, cache_slice, bufs = carry, None, None
        else:
            # the cache rides the scan CARRY and each layer updates it in
            # place at its own index -- scan-xs/ys threading (r2) made XLA
            # re-materialise the full stacked buffers every decode step
            # (4x400 MB copies, ~5 ms/step profiled)
            carry_h, bufs = carry
            cache_slice = {"bufs": bufs, "layer": idx, "index": cache.index}
        new_h, new_bufs = decoder_layer(take_layer(idx), cfg, carry_h, flag,
                                        cos, sin, position_ids, bias, kv_flag,
                                        cache_slice, attn_impl,
                                        dropout_rng=rng,
                                        text_span=text_span,
                                        lang_only=lang_only)
        if cache is None:
            return new_h, None
        return (new_h, dict(bufs, **new_bufs)), None

    if remat:
        policy = _remat_policy(remat)
        body = (jax.checkpoint(body, policy=policy) if policy is not None
                else jax.checkpoint(body))

    def scan_xs(xs):
        return (xs, layer_rngs) if layer_rngs is not None else xs

    idxs = jnp.arange(cfg.num_hidden_layers)
    if cache is None:
        h, _ = jax.lax.scan(body, h, scan_xs(idxs))
        new_cache = None
    else:
        bufs0 = {"k": cache.k, "v": cache.v}
        if cfg.use_bridge:
            bufs0.update({"kb": cache.kb, "vb": cache.vb})
        (h, bufs), _ = jax.lax.scan(body, (h, bufs0), scan_xs(idxs))
        new_cache = KVCache(
            k=bufs["k"], v=bufs["v"],
            kb=bufs.get("kb"), vb=bufs.get("vb"),
            flag=kv_flag, index=cache.index + N)

    eps = cfg.rms_norm_eps
    if lang_only:
        h = rms_norm(h, params["norm"], eps)
    else:
        h = select_by_flag(flag,
                           rms_norm(h, params["vision_norm"], eps),
                           rms_norm(h, params["norm"], eps))
    return ModelOutput(hidden_states=h, cache=new_cache)


# ---------------------------------------------------------------------------
# Heads / logits / loss
# ---------------------------------------------------------------------------

def compute_text_logits(params: Params, h: jax.Array) -> jax.Array:
    from libra_tpu.ops.qlinear import qdot
    return qdot(h, params["lm_head"])


def compute_vision_logits(params: Params, h: jax.Array) -> jax.Array:
    """(Q, B, N, Vv) from the per-codebook vision heads (1d mode;
    reference: MultiLMHead, modeling_libra.py:834-843)."""
    return jnp.einsum("bnd,qdv->qbnv", h,
                      params["vision_lm_head"].astype(h.dtype))


def compute_vision_logits_2d(params: Params, cfg: LibraConfig, h: jax.Array,
                             vision_indices: jax.Array,
                             h_up: Optional[jax.Array] = None) -> jax.Array:
    """(Q, B, N, Vv) through the 2D heads (input_dim = 2*hidden).

    Reference (cal_vision_logits_train, modeling_libra.py:942-1014) builds
    an augmented (R+1)x(R+1) map per image and gathers up/left neighbours.
    Because image blocks are contiguous 578-token runs, that reduces to a
    pure masked-shift form: for the entry at vision_index i (predicting
    grid cell c=i when i<=575, row-major, R columns):
      * up(c)  = h[t-(R-1)] when c >= R else placeholder (the cell directly
        above sits R-1 sequence steps back from the entry position);
      * left(c) = h[t] itself when c==0 (BOI) or c%R != 0, else placeholder;
      * entries at i in {576, 577} (predict-EOI and EOI padding) use
        (h[t], placeholder) -- note the flipped concat order, faithfully
        preserved (reference lines 975-987 put the left-hidden first).

    This removes the reference's dynamic-shape expand-to-complete-image
    inference path (modeling_libra.py:906-940) entirely: decode only needs
    an (R-1)-deep ring of past hiddens supplied via h_up.
    """
    R = cfg.image_feature_resolution
    Mv = cfg.max_vision_token_length
    vi = vision_indices
    ph = jnp.broadcast_to(
        params["vision_hidden_placeholder"].astype(h.dtype), h.shape)
    if h_up is None:
        shift = R - 1
        h_up_src = jnp.pad(h, ((0, 0), (shift, 0), (0, 0)))[:, :h.shape[1]]
    else:
        h_up_src = h_up.astype(h.dtype)

    c = vi  # predicted cell index for entries with vi <= Mv-3
    is_grid_entry = vi <= Mv - 3                    # 0..575
    up_valid = is_grid_entry & (c >= R)
    left_valid = is_grid_entry & ((c == 0) | (c % R != 0))

    up = jnp.where(up_valid[..., None], h_up_src, ph)
    left = jnp.where(left_valid[..., None], h, ph)
    tail = vi >= Mv - 2                             # 576 (pre-EOI) and 577
    first = jnp.where(tail[..., None], h, up)
    second = jnp.where(tail[..., None], ph, left)
    inp = jnp.concatenate([first, second], axis=-1)  # (B, N, 2D)
    return jnp.einsum("bnd,qdv->qbnv", inp,
                      params["vision_lm_head"].astype(h.dtype))


def assemble_logits(cfg: LibraConfig, text_logits: jax.Array,
                    vision_logits: jax.Array, flag: jax.Array) -> jax.Array:
    """Assemble (Q, B, N, V + Vv) combined logits with -inf placeholders on
    the wrong modality's slice (reference: cal_vl_logits,
    modeling_libra.py:1018-1052). Used at decode time (N small); training
    loss avoids materialising this via `multicodebook_loss`."""
    Q = cfg.vision_codebook_num
    neg = jnp.float32(-jnp.inf)
    tl = jnp.where(flag[..., None], neg, text_logits.astype(jnp.float32))
    vl = jnp.where(flag[None, ..., None], vision_logits.astype(jnp.float32), neg)
    tl = jnp.broadcast_to(tl[None], (Q,) + tl.shape)
    return jnp.concatenate([tl, vl], axis=-1)


def multicodebook_loss_terms(cfg: LibraConfig, text_logits: jax.Array,
                             vision_logits: jax.Array, flag: jax.Array,
                             labels: jax.Array, unified: bool = False
                             ) -> Tuple[jax.Array, jax.Array]:
    """Unnormalised per-codebook CE terms: (nll_sums (Q,), valid_counts (Q,)).

    The normalised loss is mean_q(nll_q / max(valid_q, 1)); exposing the raw
    sums lets gradient accumulation normalise by GROUP totals so that
    accumulated micro-batches match the concatenated batch exactly.
    """
    V = cfg.vocab_size
    tl = text_logits.astype(jnp.float32)
    vl = vision_logits.astype(jnp.float32)
    lse_text = jax.nn.logsumexp(tl, axis=-1)          # (B, N)
    lse_vis = jax.nn.logsumexp(vl, axis=-1)           # (Q, B, N)

    # shift: logits[t] predicts labels[t+1]
    shift_flag = flag[:, :-1]
    nll_sums, valid_counts = [], []
    for q in range(cfg.vision_codebook_num):
        lab = labels[q][:, 1:]                         # (B, N-1)
        valid = lab != -100
        lab_safe = jnp.where(valid, lab, 0)
        is_text_label = lab_safe < V
        t_gather = jnp.take_along_axis(
            tl[:, :-1], jnp.clip(lab_safe, 0, V - 1)[..., None],
            axis=-1)[..., 0]
        v_gather = jnp.take_along_axis(
            vl[q][:, :-1],
            jnp.clip(lab_safe - V, 0, cfg.vision_vocab_size - 1)[..., None],
            axis=-1)[..., 0]
        if unified:
            # real combined softmax at every position
            logit = jnp.where(is_text_label, t_gather, v_gather)
            lse = jnp.logaddexp(lse_text[:, :-1], lse_vis[q][:, :-1])
        else:
            # position modality picks the head; a cross-modal label means
            # the reference would produce a -inf logit (infinite loss) --
            # such labels are masked by the data layer; we guard with a
            # large penalty.
            logit = jnp.where(shift_flag, v_gather, t_gather)
            modality_ok = jnp.where(shift_flag, ~is_text_label, is_text_label)
            logit = jnp.where(modality_ok, logit, BIG_NEG)
            lse = jnp.where(shift_flag, lse_vis[q][:, :-1], lse_text[:, :-1])
        nll = (lse - logit) * valid
        nll_sums.append(jnp.sum(nll))
        valid_counts.append(jnp.sum(valid))
    return jnp.stack(nll_sums), jnp.stack(valid_counts)


def multicodebook_loss(cfg: LibraConfig, text_logits: jax.Array,
                       vision_logits: jax.Array, flag: jax.Array,
                       labels: jax.Array, unified: bool = False) -> jax.Array:
    """Per-codebook shifted CE over the combined vocab, averaged over
    codebooks (reference: modeling_libra.py:1159-1174).

    labels: (Q, B, N) combined-vocab ids, -100 = ignore. Exploits the -inf
    placeholder structure: for a language position the combined softmax
    reduces to softmax over the text slice, and vice versa -- so we never
    materialise (Q, B, N, 32514).

    unified=True: the unified_head training variant (modeling_libra.py:
    1054-1064) has NO placeholders at train time -- the softmax runs over
    the real concatenation of both slices at every position.
    """
    nll, valid = multicodebook_loss_terms(cfg, text_logits, vision_logits,
                                          flag, labels, unified)
    return jnp.mean(nll / jnp.maximum(valid, 1))


def force_eoi_newline(cfg: LibraConfig, logits: jax.Array,
                      last_vision_indices: jax.Array) -> jax.Array:
    """After <EOI> (vision_index == 577), force the next token to be '\n'
    (reference: modeling_libra.py:1141-1144 via
    eoi_to_newline_logits_placeholder, 879-882).

    logits: (Q, B, Vc) last-position logits; last_vision_indices: (B,).
    """
    eoi = last_vision_indices == cfg.max_vision_token_length - 1
    # finite stand-ins for the reference's +-inf placeholders so that a
    # downstream softmax (sampling path) stays NaN-free
    forced = jnp.full_like(logits, -1e30)
    forced = forced.at[..., cfg.newline_token_id].set(1e30)
    return jnp.where(eoi[None, :, None], forced, logits)
