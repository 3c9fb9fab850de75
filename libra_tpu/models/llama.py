"""Text-only LLaMA decoder family.

The reference vendors a full HF LLaMA (libra/models/llama/, SURVEY.md
L1-L5) as the language substrate. Here the same family is a thin
specialisation of the Libra machinery: a standard pre-norm decoder with
RoPE attention and SwiGLU MLP, sharing ops/, the KV-cache design, and the
scan-over-stacked-layers execution. Useful for text-only LM serving and as
the import target for plain LLaMA checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.ops.attention import (AttentionInputs, BIG_NEG,
                                     bridged_attention, causal_bias)
from libra_tpu.ops.norm import rms_norm
from libra_tpu.ops.rope import apply_rope, rope_cos_sin

Params = Dict[str, Any]


def init_params(key, cfg: LibraConfig) -> Params:
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    std = cfg.initializer_range
    pd = cfg.params_dtype

    def w(k, shape):
        return std * jax.random.normal(k, shape, jnp.float32).astype(pd)

    def layer(k):
        ks = jax.random.split(k, 7)
        return {
            "q_proj": w(ks[0], (D, D)), "k_proj": w(ks[1], (D, D)),
            "v_proj": w(ks[2], (D, D)), "o_proj": w(ks[3], (D, D)),
            "gate_proj": w(ks[4], (D, I)), "up_proj": w(ks[5], (D, I)),
            "down_proj": w(ks[6], (I, D)),
            "input_layernorm": jnp.ones((D,), pd),
            "post_attention_layernorm": jnp.ones((D,), pd),
        }

    k1, k2, k3, k4 = jax.random.split(key, 4)
    layers = jax.vmap(layer)(jax.random.split(k1, cfg.num_hidden_layers))
    return {
        "embed_tokens": w(k2, (V, D)),
        "layers": layers,
        "norm": jnp.ones((D,), pd),
        "lm_head": w(k3, (D, V)),
    }


def _heads(x, h):
    B, N, D = x.shape
    return x.reshape(B, N, h, D // h)


def _layer(p, cfg: LibraConfig, h, cos, sin, position_ids, bias):
    eps = cfg.rms_norm_eps
    H = cfg.num_attention_heads
    cd = h.dtype
    hn = rms_norm(h, p["input_layernorm"], eps)
    q = apply_rope(_heads(hn @ p["q_proj"].astype(cd), H), cos, sin, position_ids)
    k = apply_rope(_heads(hn @ p["k_proj"].astype(cd), H), cos, sin, position_ids)
    v = _heads(hn @ p["v_proj"].astype(cd), H)
    flag = jnp.zeros(hn.shape[:2], bool)
    out = bridged_attention(AttentionInputs(q, k, v, None, None),
                            flag, flag, bias)
    h = h + out.reshape(h.shape) @ p["o_proj"].astype(cd)
    hn = rms_norm(h, p["post_attention_layernorm"], eps)
    mlp = (jax.nn.silu(hn @ p["gate_proj"].astype(cd))
           * (hn @ p["up_proj"].astype(cd))) @ p["down_proj"].astype(cd)
    return h + mlp


def forward_hidden(params: Params, cfg: LibraConfig, input_ids: jax.Array,
                   attention_mask: Optional[jax.Array] = None,
                   position_ids: Optional[jax.Array] = None,
                   remat: bool = False) -> jax.Array:
    """input_ids: (B, N) -> final-norm hidden states (B, N, D)."""
    B, N = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, N), jnp.int32)
    if position_ids is None:
        pos = jnp.cumsum(attention_mask, -1) - 1
        position_ids = jnp.where(attention_mask == 0, 1, pos)
    cos, sin = rope_cos_sin(max(cfg.max_position_embeddings, N),
                            cfg.head_dim, cfg.rope_theta)
    bias = causal_bias(attention_mask, N, N)
    h = params["embed_tokens"][input_ids].astype(cfg.compute_dtype)

    def body(carry, p):
        return _layer(p, cfg, carry, cos, sin, position_ids, bias), None
    if remat:
        body = jax.checkpoint(body)
    h, _ = jax.lax.scan(body, h, params["layers"])
    return rms_norm(h, params["norm"], cfg.rms_norm_eps)


def forward(params: Params, cfg: LibraConfig, input_ids: jax.Array,
            attention_mask: Optional[jax.Array] = None,
            position_ids: Optional[jax.Array] = None,
            remat: bool = False) -> jax.Array:
    """input_ids: (B, N) -> logits (B, N, V)."""
    h = forward_hidden(params, cfg, input_ids, attention_mask, position_ids,
                       remat)
    return jnp.einsum("bnd,dv->bnv", h, params["lm_head"].astype(h.dtype))


def sequence_classification_logits(
        params: Params, cfg: LibraConfig, input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """(B, num_labels) pooled at each sequence's LAST non-pad token.

    The reference vendors LlamaForSequenceClassification
    (libra/models/llama/modeling_llama.py:854-951); params need an extra
    'score' head of shape (D, num_labels)."""
    h = forward_hidden(params, cfg, input_ids, attention_mask)
    logits = jnp.einsum("bnd,dc->bnc", h, params["score"].astype(h.dtype))
    B, N = input_ids.shape
    if attention_mask is None:
        last = jnp.full((B,), N - 1, jnp.int32)
    else:
        last = jnp.maximum(jnp.sum(attention_mask, axis=-1) - 1, 0)
    return logits[jnp.arange(B), last]


def convert_hf_llama_state_dict(sd: Dict[str, np.ndarray],
                                cfg: LibraConfig) -> Params:
    """HF LlamaForCausalLM state dict -> this tree (weights transposed to
    x @ W orientation)."""
    t = lambda x: np.ascontiguousarray(np.asarray(x).T)
    L = cfg.num_hidden_layers

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([p[k] for p in per]) for k in per[0]}

    layers = stack(lambda i: {
        "q_proj": t(sd[f"model.layers.{i}.self_attn.q_proj.weight"]),
        "k_proj": t(sd[f"model.layers.{i}.self_attn.k_proj.weight"]),
        "v_proj": t(sd[f"model.layers.{i}.self_attn.v_proj.weight"]),
        "o_proj": t(sd[f"model.layers.{i}.self_attn.o_proj.weight"]),
        "gate_proj": t(sd[f"model.layers.{i}.mlp.gate_proj.weight"]),
        "up_proj": t(sd[f"model.layers.{i}.mlp.up_proj.weight"]),
        "down_proj": t(sd[f"model.layers.{i}.mlp.down_proj.weight"]),
        "input_layernorm": np.asarray(
            sd[f"model.layers.{i}.input_layernorm.weight"]),
        "post_attention_layernorm": np.asarray(
            sd[f"model.layers.{i}.post_attention_layernorm.weight"]),
    })
    tree = {
        "embed_tokens": np.asarray(sd["model.embed_tokens.weight"]),
        "layers": layers,
        "norm": np.asarray(sd["model.norm.weight"]),
        "lm_head": t(sd["lm_head.weight"]),
    }
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, cfg.params_dtype), tree)
