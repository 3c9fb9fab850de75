"""Benchmark: greedy decode throughput of the flagship Libra decoder on one
TPU chip, plus vision encode+tokenize throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": null, "extra": {...}}

vs_baseline is null: the reference publishes no performance numbers
(BASELINE.md -- "published: {}").

The decode model is the full 4096-dim Libra architecture (routed dual-path
projections, rank-8 bridge attention, 2-codebook heads) with the layer count
trimmed to fit a single v5e chip in bf16; per-layer cost is uniform, so
32-layer full-model throughput ~= value * (layers/32) on an 8-chip mesh.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_decode(num_layers=8, B=1, text_len=32, max_new=128):
    import jax
    import jax.numpy as jnp

    from libra_tpu.generation import GenerationConfig, Generator
    from libra_tpu.models import libra as M
    from __graft_entry__ import _example_batch, _flagship_cfg, fast_random_params

    cfg = _flagship_cfg(num_layers)
    params = fast_random_params(cfg)
    ids, mask, vi, sig = _example_batch(cfg, B=B, text_len=text_len)
    inputs = {"input_ids": ids, "attention_mask": mask,
              "vision_indices": vi, "coninous_signal": sig}
    gen = GenerationConfig(max_new_tokens=max_new, eos_token_id=-1)
    g = Generator(params, cfg)

    res = g(inputs, gen)                       # compile + run
    jax.block_until_ready(res.sequences)
    t0 = time.perf_counter()
    res = g(inputs, gen)
    jax.block_until_ready(res.sequences)
    dt = time.perf_counter() - t0
    tokens = max_new * B
    return tokens / dt, dt


def bench_vision_encode(B=8, iters=4):
    import jax
    import jax.numpy as jnp

    from libra_tpu.config import VQGANConfig
    from libra_tpu.models import vqgan as vqgan_model

    cfg = VQGANConfig()
    params = vqgan_model.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    pixels = jnp.asarray(
        np.random.RandomState(0).randn(B, 336, 336, 3).astype(np.float32))

    import functools
    enc = jax.jit(functools.partial(vqgan_model.encode, cfg=cfg))
    out = enc(params, pixels=pixels.astype(jnp.bfloat16))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = enc(params, pixels=pixels.astype(jnp.bfloat16))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return B / dt


def bench_vqa_fused(num_layers=8, B=1, text_len=32):
    """North-star shape: single-image VQA with CLIP+VQGAN encode fused into
    the prefill program. Returns (ttft_s, decode_tok_s)."""
    import jax
    import jax.numpy as jnp

    from libra_tpu.config import VQGANConfig
    from libra_tpu.generation import GenerationConfig, Generator
    from __graft_entry__ import _example_batch, _flagship_cfg, fast_random_params
    from libra_tpu.models import vqgan as vqgan_model

    cfg = _flagship_cfg(num_layers)
    params = fast_random_params(cfg)
    vq_cfg = VQGANConfig()
    vq_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype")
        and x.dtype == jnp.float32 else x,
        vqgan_model.init_params(jax.random.PRNGKey(0), vq_cfg))

    ids, mask, vi, _ = _example_batch(cfg, B=B, text_len=text_len)
    img_start = np.full((B,), 8, np.int32)
    pixels = np.random.RandomState(0).randn(B, 336, 336, 3).astype(np.float32)
    inputs = {"input_ids": ids, "attention_mask": mask, "vision_indices": vi,
              "pixels": pixels, "img_start": img_start}
    g = Generator(params, cfg, vq_params=vq_params, vq_cfg=vq_cfg)

    gen1 = GenerationConfig(max_new_tokens=1, eos_token_id=-1)
    gen128 = GenerationConfig(max_new_tokens=128, eos_token_id=-1)
    jax.block_until_ready(g(inputs, gen1).sequences)    # compile
    jax.block_until_ready(g(inputs, gen128).sequences)  # compile

    t0 = time.perf_counter()
    jax.block_until_ready(g(inputs, gen1).sequences)
    ttft = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(g(inputs, gen128).sequences)
    t128 = time.perf_counter() - t0
    tok_s = 127 * B / max(t128 - ttft, 1e-9)
    return ttft, tok_s


def main():
    extra = {}
    try:
        imgs_per_s = bench_vision_encode()
        extra["vision_encode_img_s_b8"] = round(imgs_per_s, 2)
    except Exception as e:  # noqa: BLE001
        extra["vision_encode_error"] = repr(e)[:200]

    try:
        ttft, fused_tok_s = bench_vqa_fused()
        extra["vqa_fused_ttft_ms"] = round(ttft * 1000, 1)
        extra["vqa_fused_decode_tok_s"] = round(fused_tok_s, 2)
    except Exception as e:  # noqa: BLE001
        extra["vqa_fused_error"] = repr(e)[:200]

    tok_s, dt = bench_decode()
    extra["decode_wall_s_128tok"] = round(dt, 3)
    print(json.dumps({
        "metric": "decode_tokens_per_sec_8layer_bf16_b1",
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
