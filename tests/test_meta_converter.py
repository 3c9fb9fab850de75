"""Meta-format LLaMA converter: inverse-permute an HF state dict into Meta
layout, convert, and require identity with the HF-path conversion."""

import jax
import numpy as np

from libra_tpu.checkpoint import convert_meta_llama_state_dict
from libra_tpu.config import LibraConfig
from libra_tpu.models import llama as L


def _inverse_permute(w, H, hd, D):
    # inverse of (H, hd//2, 2, D).transpose(0,2,1,3): halves -> interleaved
    return (np.asarray(w).reshape(H, 2, hd // 2, D)
            .transpose(0, 2, 1, 3).reshape(D, D))


def test_meta_matches_hf_conversion():
    cfg = LibraConfig.tiny(vocab_size=64, hidden_size=32,
                           intermediate_size=48, num_hidden_layers=2,
                           num_attention_heads=4)
    D, H = cfg.hidden_size, cfg.num_attention_heads
    hd = D // H
    rng = np.random.RandomState(0)

    hf_sd = {}
    meta_sd = {}
    for i in range(cfg.num_hidden_layers):
        for hf_name, meta_name, permuted in [
                ("self_attn.q_proj", "attention.wq", True),
                ("self_attn.k_proj", "attention.wk", True),
                ("self_attn.v_proj", "attention.wv", False),
                ("self_attn.o_proj", "attention.wo", False)]:
            w = rng.randn(D, D).astype(np.float32)
            hf_sd[f"model.layers.{i}.{hf_name}.weight"] = w
            meta_sd[f"layers.{i}.{meta_name}.weight"] = (
                _inverse_permute(w, H, hd, D) if permuted else w)
        for hf_name, meta_name, shape in [
                ("mlp.gate_proj", "feed_forward.w1", (cfg.intermediate_size, D)),
                ("mlp.up_proj", "feed_forward.w3", (cfg.intermediate_size, D)),
                ("mlp.down_proj", "feed_forward.w2", (D, cfg.intermediate_size))]:
            w = rng.randn(*shape).astype(np.float32)
            hf_sd[f"model.layers.{i}.{hf_name}.weight"] = w
            meta_sd[f"layers.{i}.{meta_name}.weight"] = w
        for hf_name, meta_name in [("input_layernorm", "attention_norm"),
                                   ("post_attention_layernorm", "ffn_norm")]:
            w = rng.randn(D).astype(np.float32)
            hf_sd[f"model.layers.{i}.{hf_name}.weight"] = w
            meta_sd[f"layers.{i}.{meta_name}.weight"] = w

    emb = rng.randn(cfg.vocab_size, D).astype(np.float32)
    out_w = rng.randn(cfg.vocab_size, D).astype(np.float32)
    norm = rng.randn(D).astype(np.float32)
    hf_sd |= {"model.embed_tokens.weight": emb, "model.norm.weight": norm,
              "lm_head.weight": out_w}
    meta_sd |= {"tok_embeddings.weight": emb, "norm.weight": norm,
                "output.weight": out_w}

    a = L.convert_hf_llama_state_dict(hf_sd, cfg)
    b = convert_meta_llama_state_dict(meta_sd, cfg)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(a),
            jax.tree_util.tree_leaves_with_path(b)):
        assert pa == pb
        np.testing.assert_allclose(la, lb, atol=1e-6, err_msg=str(pa))
