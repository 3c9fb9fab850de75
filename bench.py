"""Benchmark suite for the flagship Libra model on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": null, "extra": {...}}

vs_baseline is null: the reference publishes no performance numbers
(BASELINE.md -- "published: {}").

Headline metric: greedy decode tokens/sec of the FULL 32-layer 11B model
(weight-only int8 + int8 KV cache) on a single chip -- a configuration the
bf16 reference cannot run on 16 GB at all -- with a printed bytes-moved
roofline. Extras: vision encode+tokenize throughput (CLIP ViT-L + LFQ),
the full-32 fused single-image-VQA shape (TTFT + batched decode with
CLIP+VQGAN encode hidden inside the prefill program), and the fused LAION
pretrain step (tokens/s + MFU).

Every stage runs in its own subprocess with a hard timeout (a wedged
remote-TPU tunnel hangs instead of failing) and timed passes are best-of-2
(the tunnel occasionally stalls a single call).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    """Force completion with a real device->host readback of one element.

    Under the remote-TPU (axon) tunnel, jax.block_until_ready can return
    before the computation has actually run; fetching a value cannot."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf).ravel()[0]


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
    _sync(res.sequences)
    t0 = time.perf_counter()
    res = g(inputs, gen)
    _sync(res.sequences)
    dt = time.perf_counter() - t0
    tokens = max_new * B
    return tokens / dt, dt


def bench_vision_encode(B=8):
    """CLIP-tap + LFQ encode throughput (BASELINE north star #1).

    Two-point traced-loop timing (VERDICT r3 item 5): the r1-r3 versions
    timed 4 separate dispatches, so the ~13-27 ms/call axon overhead sat
    INSIDE the per-image number (at ~38 ms/call that is a 30-70% additive
    noise floor -- the whole r2 247.8 -> r3 208.6 "regression" fits inside
    it). A single compiled program scans the encode N times with a
    loop-carried pixel perturbation (defeats invariant hoisting/DCE);
    differencing two trip counts cancels dispatch + sync overhead and
    reports pure device throughput."""
    import functools

    import jax
    import jax.numpy as jnp

    from libra_tpu.config import VQGANConfig
    from libra_tpu.models import vqgan as vqgan_model
    from __graft_entry__ import fast_fill

    cfg = VQGANConfig()
    params = fast_fill(
        lambda: vqgan_model.init_params(jax.random.PRNGKey(0), cfg))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    # pin on-device once; host leaves would re-stage through the TPU
    # tunnel on every call and dominate the measurement
    params = jax.device_put(params)
    pixels = jnp.asarray(np.random.RandomState(0)
                         .randn(B, 336, 336, 3).astype(np.float32)
                         ).astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=0)
    def loop(n, p, px):
        # params MUST be an argument: a closed-over device tree is baked
        # into the program as constants, and the ~0.8 GB of literals
        # overflows the remote compiler's request-body limit (HTTP 413)
        def body(c, _):
            q, _aux, _idx, _f = vqgan_model.encode(p, cfg, px + c)
            return c + 1e-30 * q.mean().astype(c.dtype), None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0),
                            jnp.arange(n, dtype=jnp.int32))
        return c

    def run(n):
        best = None
        for _ in range(3):                 # tunnel jitter ~ tens of ms
            t0 = time.perf_counter()
            _sync(loop(n, params, pixels))
            d = time.perf_counter() - t0
            best = d if best is None else min(best, d)
        return best

    n1, n2 = 2, 12
    run(n1), run(n2)                       # compile both trip counts
    per_iter = (run(n2) - run(n1)) / (n2 - n1)
    img_s = B / per_iter

    # FLOPs-based speed-of-light (VERDICT r4 item 6): encode is
    # COMPUTE-bound (the CLIP tower is dense bf16 matmuls over 577
    # tokens), so the ceiling is matmul FLOPs / the chip's 197 TF bf16
    # peak. Per image: patch-embed conv + L_run transformer layers
    # (QKVO 8ND^2, scores+values 4N^2D, MLP 16ND^2) + quant_conv.
    c = cfg.clip
    n_tok = c.num_patches + 1
    sel = min(cfg.select_layers)
    layers_run = c.num_hidden_layers + sel + 1 if sel < 0 else sel
    D, I = c.hidden_size, c.intermediate_size
    per_layer = (8 * n_tok * D * D + 4 * n_tok * n_tok * D
                 + 4 * n_tok * D * I)
    patch = 2 * c.num_patches * (3 * c.patch_size ** 2) * D
    qconv = 2 * c.num_patches * cfg.clip_feature_dim * cfg.embed_dim
    flops = patch + layers_run * per_layer + qconv
    sol_img_s = 197e12 / flops
    return {
        "vision_encode_img_s_b8": round(img_s, 2),
        "vision_encode_gflops_per_img": round(flops / 1e9, 1),
        "vision_encode_sol_img_s": round(sol_img_s, 1),
        "vision_encode_pct_of_sol": round(100 * img_s / sol_img_s, 1),
    }


def bench_vqa_fused(num_layers=8, B=1, text_len=32):
    """North-star shape: single-image VQA with CLIP+VQGAN encode fused into
    the prefill program. Returns (ttft_s, decode_tok_s)."""
    import jax
    import jax.numpy as jnp

    from libra_tpu.config import VQGANConfig
    from libra_tpu.generation import GenerationConfig, Generator
    from __graft_entry__ import (_example_batch, _flagship_cfg, fast_fill,
                                 fast_random_params)
    from libra_tpu.models import vqgan as vqgan_model

    cfg = _flagship_cfg(num_layers)
    params = fast_random_params(cfg)
    # 2-layer CLIP tap: feature dim 2*1024 == contiguous_signal_size 2048
    # (reference: clip_encoder.py iterable select; configuration_libra.py:14)
    vq_cfg = VQGANConfig(select_layer=(-2, -1))
    vq_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype")
        and x.dtype == jnp.float32 else x,
        fast_fill(lambda: vqgan_model.init_params(jax.random.PRNGKey(0),
                                                  vq_cfg)))

    ids, mask, vi, _ = _example_batch(cfg, B=B, text_len=text_len)
    img_start = np.full((B,), 8, np.int32)
    pixels = np.random.RandomState(0).randn(B, 336, 336, 3).astype(np.float32)
    inputs = {"input_ids": ids, "attention_mask": mask, "vision_indices": vi,
              "pixels": pixels, "img_start": img_start}
    g = Generator(params, cfg, vq_params=vq_params, vq_cfg=vq_cfg)

    gen1 = GenerationConfig(max_new_tokens=1, eos_token_id=-1)
    gen128 = GenerationConfig(max_new_tokens=128, eos_token_id=-1)
    _sync(g(inputs, gen1).sequences)    # compile
    _sync(g(inputs, gen128).sequences)  # compile

    def best(f, n=2):
        # best-of-n: the remote tunnel occasionally stalls a single call
        # by hundreds of ms, which would otherwise corrupt the measurement
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            times.append(time.perf_counter() - t0)
        return min(times)

    ttft = best(lambda: _sync(g(inputs, gen1).sequences))
    t128 = best(lambda: _sync(g(inputs, gen128).sequences))
    tok_s = 127 * B / max(t128 - ttft, 1e-9)
    return ttft, tok_s


def _device_quantized_params(cfg, bits=8):
    """Build a full quantized param tree DIRECTLY on the device:
    shipping ~9.4 GB of host weights through the TPU tunnel would take
    minutes; values are throughput-irrelevant. bits=4: the int4 serving
    tree (group-int4 projections, int8 embeddings).

    The tree STRUCTURE comes from jax.eval_shape of the real
    quantize_params (so bottleneck padding, bridge bf16-skip and scale
    layouts always match production). One small compiled program PER LEAF
    (a single whole-tree init program needs multi-GB integer temps live at
    once and crashes/OOMs the compiler); uint8 random bits bitcast to
    int8, so the largest transient is 2x the leaf itself."""
    import functools

    import jax
    import jax.numpy as jnp

    from libra_tpu.models import libra as M
    from libra_tpu.quantization import (Quantized4Array, QuantizedArray,
                                        quantize_params)

    shapes = jax.eval_shape(lambda: quantize_params(
        M.init_params(jax.random.PRNGKey(0), cfg), bits=bits))
    qtypes = (QuantizedArray, Quantized4Array)

    @functools.lru_cache(maxsize=None)
    def q_init(shape):
        return jax.jit(lambda k: jax.lax.bitcast_convert_type(
            jax.random.bits(k, shape, jnp.uint8), jnp.int8))

    @functools.lru_cache(maxsize=None)
    def full_init(shape, dtype, value):
        return jax.jit(lambda: jnp.full(shape, value, dtype))

    key = jax.random.PRNGKey(0)
    counter = [0]

    def build(s):
        if isinstance(s, Quantized4Array):
            counter[0] += 1
            p = q_init(s.packed.shape)(jax.random.fold_in(key, counter[0]))
            return Quantized4Array(
                p, full_init(s.scale.shape, jnp.float32, 0.02 / 7)(),
                s.group, s.out_features, s.a8)
        if isinstance(s, QuantizedArray):
            counter[0] += 1
            q = q_init(s.q.shape)(jax.random.fold_in(key, counter[0]))
            return QuantizedArray(
                q, full_init(s.scale.shape, jnp.float32, 1.0 / 127)())
        return full_init(s.shape, s.dtype, 0.02)()

    return jax.tree_util.tree_map(
        build, shapes, is_leaf=lambda x: isinstance(x, qtypes))


# Measured single-chip streaming bandwidth (bf16 matvec chain, overhead-
# cancelled two-point fit; v5e HBM spec is 819 GB/s). The decode roofline
# is bytes_per_step / this.
ACHIEVABLE_GBPS = 733.0


def _decode_roofline(cfg, params, B, S, lang_only=False):
    """Bytes every decode step must move: every matmul weight is read once
    per step (int8 leaves count q+scale bytes; embedding tables are
    excluded -- gathers touch only B rows) + the full static KV buffers
    (k/v/kb/vb are read over their whole (B, S) extent each step).
    lang_only: text-only decode (decode_modality='text') never reads the
    vision-side weights (vision_* projections/MLP/norms, bridges,
    signal_proj) -- the same partition as the freeze policy."""
    import jax

    from libra_tpu.quantization import Quantized4Array, QuantizedArray

    skip = ("embed",)
    if lang_only:
        skip += ("vision", "bridge", "signal_proj", "signal_norm")
    weight_bytes = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            params, is_leaf=lambda x: isinstance(
                x, (QuantizedArray, Quantized4Array))):
        if any(s in str(path) for s in skip):
            continue
        if isinstance(leaf, Quantized4Array):
            weight_bytes += leaf.packed.size + leaf.scale.size * 4
        elif isinstance(leaf, QuantizedArray):
            weight_bytes += leaf.q.size + leaf.scale.size * 4
        else:
            weight_bytes += leaf.size * leaf.dtype.itemsize
    L, H, d = cfg.num_hidden_layers, cfg.num_attention_heads, cfg.head_dim
    n_buf = 4 if cfg.use_bridge else 2
    kv_bytes = n_buf * L * B * S * H * (d + 4)     # int8 data + f32 scales
    return weight_bytes, kv_bytes


def bench_decode_full_int8(B=4, text_len=32, max_new=64, text_decode=True,
                           bits=8):
    """THE north-star shape: the FULL 32-layer 11B flagship, weight-only
    int8 + int8 KV cache, single chip, batched greedy decode. bf16 cannot
    do this at all (~18 GB > 16 GB HBM); int8 weights are ~9.4 GB, and the
    int8 KV cache halves cache memory/traffic, which is what admits B=4.

    Decode matmuls stream through the fused Pallas int8 kernel
    (ops/pallas/int8_matmul.py) -- weights stay int8 in HBM and dequantize
    in VMEM into the MXU feed. Also returns a bytes-moved roofline: tokens/s
    is bounded by (weights + KV bytes per step) / achievable bandwidth.

    bits=4: the int4 serving mode (group-int4 projections through
    ops/pallas/int4_matmul, embeddings int8) -- weight bytes halve again;
    decode is weight-bandwidth-bound, so this is the speed-of-light lever
    (VERDICT r4 item 3)."""
    import jax

    from libra_tpu.generation import GenerationConfig, Generator
    from __graft_entry__ import _example_batch, _flagship_cfg

    import jax.numpy as jnp

    cfg = _flagship_cfg(32)
    params = _device_quantized_params(cfg, bits=bits)
    ids, mask, vi, sig = _example_batch(cfg, B=B, text_len=text_len)
    # text-only decode IS the north-star shape: BASELINE configs 3-4 decode
    # text answers (captioning/VQA), and the -inf vision-vocab assembly
    # makes skipping the vision weights exact (models/libra.py::forward)
    modality = "text" if text_decode else "dual"
    gen = GenerationConfig(max_new_tokens=max_new, eos_token_id=-1,
                           kv_quant=True, decode_modality=modality)
    short = 8
    gen_s = GenerationConfig(max_new_tokens=short, eos_token_id=-1,
                             kv_quant=True, decode_modality=modality)
    g = Generator(params, cfg)
    # BOTH trip counts use the SAME left-padded prompt (masked pad) so
    # their programs share prefill work and cache length (Sc 768); the
    # timing difference is then exactly (max_new - short) decode steps
    pad = max_new - short
    ids = np.pad(np.asarray(ids), ((0, 0), (0, 0), (pad, 0)),
                 constant_values=gen.pad_token_id)
    mask = np.pad(np.asarray(mask), ((0, 0), (pad, 0)))
    vi = np.pad(np.asarray(vi), ((0, 0), (pad, 0)),
                constant_values=cfg.max_vision_token_length)
    sig = np.pad(np.asarray(sig), ((0, 0), (pad, 0), (0, 0)))
    # stage inputs on-device once: numpy leaves re-ship through the TPU
    # tunnel on every call (~5 MB of signal rows alone)
    import jax
    inputs = jax.device_put({"input_ids": ids, "attention_mask": mask,
                             "vision_indices": vi, "coninous_signal": sig})
    inputs_s = inputs

    _sync(g(inputs, gen).sequences)      # compile + run
    _sync(g(inputs_s, gen_s).sequences)  # compile short program

    def best(fn, n=2):                   # best-of-n (tunnel stall guard)
        out = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            d = time.perf_counter() - t0
            out = d if out is None else min(out, d)
        return out

    dt = best(lambda: _sync(g(inputs, gen).sequences))
    dt_s = best(lambda: _sync(g(inputs_s, gen_s).sequences))
    # pure decode steps/s: the (prefill + dispatch + staging) constant
    # cancels in the difference
    step_s = max(dt - dt_s, 1e-9) / (max_new - short)
    decode_only_tok_s = B / step_s

    S = -(-(ids.shape[-1] + max_new) // 128) * 128   # the real cache length
    wb, kvb = _decode_roofline(cfg, params, B, S, lang_only=text_decode)
    bytes_per_step = wb + kvb
    sol_tok_s = B / (bytes_per_step / (ACHIEVABLE_GBPS * 1e9))
    roofline = {
        "decode_bytes_per_step_gb": round(bytes_per_step / 1e9, 3),
        "decode_weight_gb": round(wb / 1e9, 3),
        "decode_kv_gb": round(kvb / 1e9, 3),
        "decode_achieved_gb_s": round(bytes_per_step / step_s / 1e9, 1),
        "decode_sol_tok_s": round(sol_tok_s, 1),
        "decode_pct_of_sol": round(100 * decode_only_tok_s / sol_tok_s, 1),
        # whole-call number incl. the 610-token prefill (the r1/r2 metric)
        "decode_tok_s_incl_prefill": round(max_new * B / dt, 2),
    }
    return decode_only_tok_s, dt, roofline


def bench_spec_decode(B=4, text_len=32, max_new=128, gamma=3):
    """N-gram speculative text decode at full scale (full-32 int8 weights
    + int8 KV, greedy): spec vs standard decode on identical inputs.

    Two operating points (VERDICT r3 item 3):
      * `spec_decode_*` -- the real bigram drafter on the bench prompt.
        The bench weights are RANDOM, so the greedy continuation is
        pseudo-random and bigram lookup predicts ~nothing: this point
        measures the mechanism's OVERHEAD (r3: 0.998x -- neutral), the
        realistic floor. Natural copy-heavy workloads (VQA answer spans,
        quoted captions, constrained/JSON decoding) sit between floor
        and ceiling in proportion to their acceptance rate.
      * `spec_oracle_*` -- the same compiled verify machinery fed drafts
        from the model's OWN standard-decode output (acceptance -> 1):
        the mechanism's CEILING. Every accepted token is still verified
        by the target forward pass; only the draft SOURCE is swapped
        (bench-side patch of spec_decode._bigram_drafts), so the number
        is the true engine win at acceptance a=1; win(a) ~= 1 + a*gamma
        step-time permitting. Reported with its acceptance rate.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from libra_tpu import spec_decode as SD
    from libra_tpu.generation import GenerationConfig, Generator
    from __graft_entry__ import _example_batch, _flagship_cfg

    cfg = _flagship_cfg(32)
    params = _device_quantized_params(cfg)
    ids, mask, vi, sig = _example_batch(cfg, B=B, text_len=text_len)
    inputs = jax.device_put({"input_ids": np.asarray(ids),
                             "attention_mask": np.asarray(mask),
                             "vision_indices": np.asarray(vi),
                             "coninous_signal": np.asarray(sig)})
    g = Generator(params, cfg)
    base = GenerationConfig(max_new_tokens=max_new, eos_token_id=-1,
                            kv_quant=True, decode_modality="text")
    spec = dataclasses.replace(base, spec_decode=gamma)
    base_res = g(inputs, base)                  # compile + the oracle
    _sync(base_res.sequences)
    _sync(g(inputs, spec).sequences)

    def best(fn, n=2):
        out = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            d = time.perf_counter() - t0
            out = d if out is None else min(out, d)
        return out

    dt_base = best(lambda: _sync(g(inputs, base).sequences))
    res = {}

    def run_spec():
        r = g(inputs, spec)
        _sync(r.sequences)
        res["r"] = r

    dt_spec = best(run_spec)
    toks = int(np.asarray(res["r"].num_generated).sum())
    iters = max(int(np.asarray(res["r"].iterations)), 1)
    # REPORTED (not asserted) base-vs-spec token agreement (ADVICE r4
    # item 3): bf16 argmax ties on random bench weights make exact
    # equality flaky on TPU, but a genuine verify-vs-base indexing or
    # numerics divergence on real weights would show here as a LOW match
    # fraction rather than the tie-noise-dominated one
    base_toks = np.asarray(base_res.sequences)[0, :, ids.shape[-1]:
                                               ids.shape[-1] + max_new]
    spec_toks = np.asarray(res["r"].sequences)[0, :, ids.shape[-1]:
                                               ids.shape[-1] + max_new]
    out = {
        "spec_vs_base_token_match": round(
            float((base_toks == spec_toks).mean()), 3),
        "spec_decode_tok_s": round(toks / dt_spec, 2),
        "spec_decode_base_tok_s": round(max_new * B / dt_base, 2),
        "spec_decode_speedup": round(dt_base / dt_spec, 3),
        # mean tokens emitted per verify iteration (1 + accepted)
        "spec_decode_tok_per_iter": round(toks / B / iters, 3),
        "spec_decode_accept_rate": round(
            max(toks / B / iters - 1.0, 0.0) / gamma, 3),
        "spec_decode_gamma": gamma,
        # arithmetic ceiling of the SAME compiled program: a verify
        # iteration's cost is acceptance-independent (the forward runs
        # either way; acceptance only changes cnt), so at acceptance 1 it
        # emits B*(gamma+1) tokens per iteration at this measured rate
        "spec_ceiling_tok_s": round(
            B * (gamma + 1) * iters / dt_spec, 2),
    }

    # ---- oracle-draft ceiling: drafts = the SPEC run's own stream ----
    # NOT the base run's: the base decode (Nq=1) and the verify pass
    # (Nq=gamma+1) tile their reductions differently, and random bench
    # weights put bf16 argmax ties everywhere, so base-stream drafts
    # measure ~0 acceptance on TPU -- a bench artifact, not a mechanism
    # property (CPU fp32 tests accept at 1.0 and match token-for-token).
    # The spec run's own emitted stream is the greedy fixed point UNDER
    # VERIFY NUMERICS: feeding it back isolates the machinery's ceiling.
    N = ids.shape[-1]
    oracle = jnp.asarray(
        np.asarray(res["r"].sequences)[0, :, N:N + max_new])
    op = jnp.pad(oracle, ((0, 0), (0, gamma + 1)))

    def oracle_drafts(hist, valid, P, pending, g_):
        # pending sits at cache slot P; its successor in the oracle stream
        # is oracle[P - N + 1]
        start = jnp.maximum(P - N + 1, 0)
        return jax.vmap(lambda o, s: jax.lax.dynamic_slice(
            o, (s,), (g_,)))(op, start)

    SD._bigram_drafts = oracle_drafts
    g2 = Generator(params, cfg)                 # fresh compile cache
    _sync(g2(inputs, spec).sequences)

    def run_oracle():
        r = g2(inputs, spec)
        _sync(r.sequences)
        res["o"] = r

    dt_o = best(run_oracle)
    toks_o = int(np.asarray(res["o"].num_generated).sum())
    iters_o = max(int(np.asarray(res["o"].iterations)), 1)
    # the oracle run must reproduce the spec run's own stream (the greedy
    # fixed point under verify numerics) token-for-token
    same = bool(np.array_equal(
        np.asarray(res["o"].sequences)[0, :, :N + max_new],
        np.asarray(res["r"].sequences)[0, :, :N + max_new]))
    out.update({
        "spec_oracle_tok_s": round(toks_o / dt_o, 2),
        "spec_oracle_speedup": round(dt_base / dt_o, 3),
        "spec_oracle_tok_per_iter": round(toks_o / B / iters_o, 3),
        "spec_oracle_accept_rate": round(
            max(toks_o / B / iters_o - 1.0, 0.0) / gamma, 3),
        "spec_oracle_exact_match": same,
    })
    return out


def bench_vqa_fused_full32(B=4, text_len=32, max_new=64, a8=True):
    """BASELINE configs 3-4 at REAL scale: the full 32-layer 11B flagship
    (int8 weights + int8 KV) answering batched single-image VQA prompts
    with CLIP+VQGAN encode fused into the prefill program (batched
    continuous decode per BASELINE config 4). B=4 is the BASELINE-config-4
    batch (r2 ran B=2; the stage runner falls back if this OOMs). a8=True
    runs the prompt pass w8a8 (s8 x s8 MXU dots; measured TTFT 608 -> 446
    ms, decode unchanged -- decode always stays weight-only dequant).
    Returns (ttft_s, aggregate decode_tok_s)."""
    import jax
    import jax.numpy as jnp

    from libra_tpu.config import VQGANConfig
    from libra_tpu.generation import GenerationConfig, Generator
    from __graft_entry__ import _example_batch, _flagship_cfg, fast_fill
    from libra_tpu.models import vqgan as vqgan_model

    cfg = _flagship_cfg(32)
    params = _device_quantized_params(cfg)
    vq_cfg = VQGANConfig(select_layer=(-2, -1))
    vq_params = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype")
        and x.dtype == jnp.float32 else x,
        fast_fill(lambda: vqgan_model.init_params(jax.random.PRNGKey(0),
                                                  vq_cfg))))

    ids, mask, vi, _ = _example_batch(cfg, B=B, text_len=text_len)
    img_start = np.full((B,), 8, np.int32)
    # uint8 pixels: 4x fewer staging bytes; normalize runs on device
    pixels = np.random.RandomState(0).randint(
        0, 256, size=(B, 336, 336, 3)).astype(np.uint8)
    inputs = {"input_ids": ids, "attention_mask": mask, "vision_indices": vi,
              "pixels": pixels, "img_start": img_start}
    g = Generator(params, cfg, vq_params=vq_params, vq_cfg=vq_cfg)

    gen1 = GenerationConfig(max_new_tokens=1, eos_token_id=-1, kv_quant=True,
                            a8_prefill=a8, decode_modality="text")
    genN = GenerationConfig(max_new_tokens=max_new, eos_token_id=-1,
                            kv_quant=True, a8_prefill=a8,
                            decode_modality="text")
    _sync(g(inputs, gen1).sequences)    # compile
    _sync(g(inputs, genN).sequences)    # compile

    def best(f, n=2):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            times.append(time.perf_counter() - t0)
        return min(times)

    ttft = best(lambda: _sync(g(inputs, gen1).sequences))
    tN = best(lambda: _sync(g(inputs, genN).sequences))
    tok_s = (max_new - 1) * B / max(tN - ttft, 1e-9)
    return ttft, tok_s


def bench_train_step(num_layers=4, B=8, text_len=120):
    """BASELINE config 5 shape on one chip: the fused LAION pretrain step
    (device-resident CLIP+VQGAN tokenize INSIDE the compiled step, frozen
    language, AdamW on the vision side, remat). Returns
    (tokens_per_sec, mfu)."""
    import functools

    import jax
    import jax.numpy as jnp

    from libra_tpu.config import VQGANConfig
    from libra_tpu.models import libra as M
    from libra_tpu.models import vqgan as vqgan_model
    from libra_tpu.training.fused import FusedBatch, make_fused_train_step
    from libra_tpu.training.optimizer import OptimizerConfig, make_optimizer
    from libra_tpu.training.trainer import init_state
    from __graft_entry__ import _flagship_cfg, fast_fill, fast_random_params

    cfg = _flagship_cfg(num_layers)
    vq_cfg = VQGANConfig(select_layer=(-2, -1))
    params = jax.device_put(fast_random_params(cfg))
    vq_params = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype")
        and x.dtype == jnp.float32 else x,
        fast_fill(lambda: vqgan_model.init_params(jax.random.PRNGKey(0),
                                                  vq_cfg))))

    Mv = cfg.max_vision_token_length
    N = text_len + Mv                     # ~700: the pretrain seq budget
    rng = np.random.RandomState(0)
    img_start = np.full((B,), 8, np.int32)
    vi = np.full((B, N), Mv, np.int64)
    vi[:, 8:8 + Mv] = np.arange(Mv)
    labels = rng.randint(3, cfg.vocab_size,
                         size=(cfg.vision_codebook_num, B, N)).astype(np.int64)
    copy_mask = np.zeros((B, N), bool)
    copy_mask[:, 9:8 + Mv] = True         # image ids are labels (not BOI)
    labels[:, :, 8:8 + Mv] = -100
    batch = FusedBatch(
        pixels=jnp.asarray(rng.randn(B, 336, 336, 3), jnp.float32),
        text_ids=jnp.asarray(rng.randint(3, cfg.vocab_size, (B, N)), jnp.int32),
        img_start=jnp.asarray(img_start),
        attention_mask=jnp.ones((B, N), jnp.int32),
        vision_indices=jnp.asarray(vi),
        labels_static=jnp.asarray(labels),
        label_copy_mask=jnp.asarray(copy_mask),
        signal_ignore=jnp.zeros((B,), bool))
    batch = jax.device_put(batch)

    from libra_tpu.training.optimizer import trainable_mask
    opt_cfg = OptimizerConfig(frozen_language=True, total_steps=1000)
    opt = make_optimizer(opt_cfg, params)

    # r5: measure BOTH remat policies -- "full" (the r3/r4 number and the
    # proven 11B fsdp8 memory fit) and "big_dots" (save the tagged dot
    # outputs, skip ~90% of the backward recompute; 12.3 GB vs 9.2 GB
    # compiled peak on this proxy -- fits the single chip). big_dots is
    # the headline train_mfu; full is reported for round comparability.
    # The state is re-initialised per policy and FREED between them --
    # two resident optimizer states OOM'd the chip (first r5 run of this
    # dual-policy stage).
    dts = {}
    for remat in ("big_dots", "full"):
        state = jax.jit(functools.partial(init_state, opt=opt))(params)
        step = make_fused_train_step(
            cfg, vq_cfg, opt, grad_mask=trainable_mask(params, opt_cfg),
            remat=remat)
        state, m = step(state, vq_params, batch)      # compile + run
        _sync(m["loss"])
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, vq_params, batch)
        _sync(m["loss"])
        dts[remat] = (time.perf_counter() - t0) / iters
        del state, m                  # free before the next policy's init
    dt = dts["big_dots"]

    tokens = B * N
    # MFU convention: trainable matmul params cost 6*P*T (fwd + activation
    # grad + weight grad), FROZEN params 4*P*T (frozen_language skips the
    # dL/dW matmul -- the r2 bench used 6x for everything, overstating
    # utilization on the frozen fraction; VERDICT r3 item 6).
    # Embeddings/gathers excluded.
    from libra_tpu.training.optimizer import trainable_mask
    tmask = trainable_mask(params, OptimizerConfig(frozen_language=True))
    flops_per_tok = flops_legacy = 0
    for (p, l), (_, t) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(tmask)):
        if l.ndim >= 2 and "embed" not in str(p):
            flops_per_tok += (6 if t else 4) * l.size
            flops_legacy += 6 * l.size
    mfu = flops_per_tok * tokens / dt / 197e12    # v5e bf16 peak
    # r2-convention number (6x for EVERYTHING incl. frozen): reported so
    # rounds are comparable -- the r2->r3 "MFU slide" 0.4616 -> 0.4128 was
    # the CONVENTION change (VERDICT r4 check), not a speed regression
    mfu_legacy = flops_legacy * tokens / dt / 197e12
    dt_full = dts["full"]
    return {
        "train_step_tok_s": round(tokens / dt, 1),
        "train_mfu": round(mfu, 4),
        "train_mfu_legacy6x": round(mfu_legacy, 4),
        "train_step_fullremat_tok_s": round(tokens / dt_full, 1),
        "train_mfu_fullremat": round(mfu * dt / dt_full, 4),
    }


# Fixed open-loop load points (VERDICT r4 item 2): the r4 bench set the
# Poisson rate at 0.8x its OWN measured burst capacity, so every engine
# change also changed the offered load and no two rounds were comparable.
# These absolute rates are now pinned; p50/p95 TTFT at each point is
# directly comparable across rounds and across merged-prefill on/off.
FIXED_RPS = (1.5, 2.0, 2.5)


def _serving_reqs(cfg, n, max_new, B=4, stagger=False, mark0=None):
    """The canonical serving workload: mixed 594-618-token single-image
    prompts (one 640 bucket), text answers. mark0: overwrite each prompt's
    LAST token with mark0+i -- a per-request marker the oracle spec
    drafter keys on (the marker is also position bucket-1 after left-pad,
    so a traced function can recover the request id from the history)."""
    from libra_tpu.serving import Request
    from __graft_entry__ import _example_batch

    reqs = []
    for i in range(n):
        tl = 16 + (i % 4) * 8             # mixed prompt lengths, one bucket
        ids, _, vi, sig = _example_batch(cfg, B=1, text_len=tl, seed=i)
        ids = np.asarray(ids[:, 0]).copy()
        if mark0 is not None:
            ids[:, -1] = mark0 + i
        reqs.append(Request(
            request_id=i, input_ids=ids,
            vision_indices=np.asarray(vi[0]),
            contiguous_signal=np.asarray(sig[0]),
            max_new_tokens=max_new - 8 * (i % B) if stagger else max_new))
    return reqs


def _pct(xs, p):
    return xs[min(len(xs) - 1, int(len(xs) * p))]


def _poisson_point(eng, reqs, rps, seed=0):
    """One open-loop run at a FIXED arrival rate; TTFT from arrival."""
    gaps = np.random.RandomState(seed).exponential(1.0 / rps,
                                                   size=len(reqs))
    arrivals = np.cumsum(gaps)
    for r, a in zip(reqs, arrivals):
        r.arrival_s = float(a)
    t0 = time.perf_counter()
    results = eng.run(reqs)
    dt = time.perf_counter() - t0
    total = sum(r.tokens.shape[-1] for r in results)
    ttfts = sorted(r.ttft_s for r in results if r.ttft_s is not None)
    return {
        "tok_s": round(total / dt, 2),
        "p50_ttft_ms": round(1000 * _pct(ttfts, 0.5), 1),
        "p95_ttft_ms": round(1000 * _pct(ttfts, 0.95), 1),
    }


def bench_serving(B=4, n_requests=24, max_new=64, decode_chunk=16,
                  group_cap=None, merged=None, prefix="serving",
                  rps_points=FIXED_RPS):
    """ServingEngine under a mixed-length request stream at full scale:
    full-32 int8 weights + int8 KV, prompts 594-618 tokens (one 578-token
    image + text) in one 640 bucket, chunked decode dispatch. Reports the
    burst numbers (all requests queued at t=0: aggregate tokens/s is the
    capacity number; TTFT there is mostly queue wait by construction) and
    a FIXED-rps Poisson ladder (honest continuous-serving latency,
    comparable across rounds and across merged on/off -- `merged` runs
    the identical ladder with merged chunked prefill forced on/off)."""
    from libra_tpu.generation import GenerationConfig
    from libra_tpu.serving import ServingEngine
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(32)
    params = _device_quantized_params(cfg)
    gen = GenerationConfig(eos_token_id=-1, kv_quant=True, a8_prefill=True,
                           decode_modality="text")
    # merged_chunk=64: a 640-bucket install is 10 packed iterations. C=128
    # was A/B-measured SLOWER (per-iteration overhead over a plain decode
    # step is super-linear in C). Env override for A/B runs.
    import os as _os
    mc = int(_os.environ.get("LIBRA_BENCH_MERGED_CHUNK", "64"))
    eng = ServingEngine(params, cfg, max_batch=B, max_len=768, gen=gen,
                        prompt_bucket=640, decode_chunk=decode_chunk,
                        merged_chunk=mc, max_prefill_group=group_cap,
                        merged_prefill=merged)

    # engine warmup: compiles the decode chunk, the merged install/chunk
    # programs AND every dedicated-prefill group size (k=B burst + the
    # k=1/k=2 idle-pool refill shapes open-loop arrivals hit -- an
    # unwarmed k=1 compile measured 18 s INSIDE the r4 Poisson run)
    eng.warmup(_serving_reqs(cfg, 1, max_new, B)[0])
    reqs = _serving_reqs(cfg, n_requests, max_new, B)
    t0 = time.perf_counter()
    results = eng.run(reqs)
    dt = time.perf_counter() - t0
    total = sum(r.tokens.shape[-1] for r in results)
    ttfts = sorted(r.ttft_s for r in results if r.ttft_s is not None)
    out = {
        f"{prefix}_tok_s": round(total / dt, 2),
        f"{prefix}_p50_ttft_ms": round(1000 * _pct(ttfts, 0.5), 1),
        f"{prefix}_p95_ttft_ms": round(1000 * _pct(ttfts, 0.95), 1),
        f"{prefix}_requests": len(results),
        f"{prefix}_wall_s": round(dt, 2),
        f"{prefix}_merged_on": eng._merged_on,
    }

    for rps in rps_points:
        pt = _poisson_point(eng, _serving_reqs(cfg, n_requests, max_new, B),
                            rps)
        out.update({f"{prefix}_rps{rps}_{k}": v for k, v in pt.items()})
        if rps == 2.0:
            # per-branch host wall/dispatch counts of the 2.0 point (async
            # dispatches: device time lands on the branch reading back)
            out[f"{prefix}_rps2.0_breakdown"] = {
                k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in eng.last_run_stats.items()}
    out[f"{prefix}_merged_installs"] = eng.stats["merged_installs"]
    out[f"{prefix}_dedicated_prefills"] = eng.stats["dedicated_prefills"]
    return out


def bench_serving_nomerge(B=4, n_requests=24, max_new=64):
    """The merged-prefill A/B arm (VERDICT r4 item 2): the IDENTICAL
    engine and fixed-rps ladder with merged chunked prefill disabled --
    every refill is a dedicated grouped prefill dispatch. Own stage (own
    engine compile budget)."""
    out = bench_serving(B=B, n_requests=n_requests, max_new=max_new,
                        merged=False, prefix="serving_nomerge")
    # rename ladder keys to the pattern the ladder-comparison reads:
    # serving_rps{r}_nomerge_* next to serving_rps{r}_*
    ren = {}
    for k, v in out.items():
        if "_rps" in k:
            ren[k.replace("serving_nomerge_rps", "serving_rps")
                 .replace("_tok_s", "_nomerge_tok_s")
                 .replace("_p50_ttft_ms", "_nomerge_p50_ttft_ms")
                 .replace("_p95_ttft_ms", "_nomerge_p95_ttft_ms")
                 .replace("_breakdown", "_nomerge_breakdown")] = v
        else:
            ren[k] = v
    return ren


def bench_serving_spec(B=4, n_requests=24, max_new=64, decode_chunk=8,
                       gamma=3):
    """Engine-level speculative decode at an acceptance-friendly operating
    point (VERDICT r4 item 7: the old stage re-measured the known-losing
    accept~0 point every round).

    Pass 1 runs the spec engine on the canonical workload and RECORDS each
    request's emitted stream (greedy + per-row-independent math make it
    deterministic per request). Pass 2 re-runs the identical workload with
    the drafter replaced by an oracle that serves each slot the recorded
    continuation, keyed on a per-request marker token at the prompt's last
    (bucket-relative) position -- the engine-level analogue of
    bench_spec_decode's oracle point: acceptance -> 1 while every token is
    still verified by the target forward. Reports the measured acceptance
    rate and tokens/s; speedup vs the gamma=0 engine is computed against
    the serving stage's burst number on the SAME workload (read from
    BENCH_RESULTS.json, written by the earlier stage)."""
    import json as _json
    import os as _os

    import jax
    import jax.numpy as jnp

    from libra_tpu import spec_decode as SD
    from libra_tpu.generation import GenerationConfig
    from libra_tpu.serving import ServingEngine
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(32)
    params = _device_quantized_params(cfg)
    gen = GenerationConfig(eos_token_id=-1, kv_quant=True, a8_prefill=True,
                           decode_modality="text", spec_decode=gamma)
    MARK0 = 1000                       # request-id marker token base
    NB = 640                           # the workload's single bucket

    def mk(n):
        return _serving_reqs(cfg, n, max_new, B, mark0=MARK0)

    # ---- pass 1: record the greedy stream per request ----
    eng = ServingEngine(params, cfg, max_batch=B, max_len=768, gen=gen,
                        prompt_bucket=NB, decode_chunk=decode_chunk)
    eng.run(mk(2 * B - 1))             # compile chunk + refill sizes
    res1 = eng.run(mk(n_requests))
    streams = np.zeros((n_requests, max_new + gamma + 1), np.int32)
    for r in res1:
        t = np.asarray(r.tokens[0], np.int32)
        streams[r.request_id, :t.shape[0]] = t
    table = jnp.asarray(streams)

    # ---- pass 2: oracle drafter keyed on the marker token ----
    def oracle_drafts(hist, valid, P, pending, g_):
        rid = jnp.clip(hist[:, NB - 1] - MARK0, 0, n_requests - 1)
        # pending is generated token number (P - NB); its successors
        # in the recorded stream start at P - NB + 1
        start = jnp.clip(P - NB + 1, 0, table.shape[1] - g_)
        return jax.vmap(lambda r, s: jax.lax.dynamic_slice(
            table[r], (s,), (g_,)))(rid, start)

    orig = SD._bigram_drafts
    SD._bigram_drafts = oracle_drafts
    try:
        eng2 = ServingEngine(params, cfg, max_batch=B, max_len=768, gen=gen,
                             prompt_bucket=NB, decode_chunk=decode_chunk)
        eng2.run(mk(2 * B - 1))        # compile (fresh engine, own jits)
        t0 = time.perf_counter()
        res2 = eng2.run(mk(n_requests))
        dt = time.perf_counter() - t0
    finally:
        SD._bigram_drafts = orig
    total = sum(r.tokens.shape[-1] for r in res2)
    rs = eng2.last_run_stats
    # per-slot spec iterations that emitted anything; each emits 1..K
    act = max(rs["active_iters"], 1)
    accept = max(total / act - 1.0, 0.0) / gamma
    out = {
        "serving_spec_tok_s": round(total / dt, 2),
        "serving_spec_accept_rate": round(accept, 3),
        "serving_spec_gamma": gamma,
        "serving_spec_requests": len(res2),
        # fraction of pass-2 tokens equal to pass 1's recorded stream
        # (reported, not asserted: bf16 argmax ties on random weights)
        "serving_spec_stream_match": round(float(np.mean([
            np.mean(np.asarray(r.tokens[0], np.int32)
                    == streams[r.request_id, :r.tokens.shape[-1]])
            for r in res2])), 3),
    }
    # speedup vs the gamma=0 engine on the SAME burst workload: the
    # serving stage already measured it; its numbers are durable in
    # BENCH_RESULTS.json by the time this stage runs
    try:
        with open(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                "BENCH_RESULTS.json")) as f:
            base = _json.load(f)["results"].get("serving_tok_s")
        if base:
            out["serving_spec_speedup_vs_g0"] = round(
                out["serving_spec_tok_s"] / base, 3)
    except (OSError, ValueError, KeyError):
        pass
    return out


def bench_chat_multiturn(B=4, text_len=32, delta_len=24, max_len=1024):
    """Incremental multi-turn chat at full scale: B=4 parallel 32-layer
    11B conversations (int8 weights + int8 KV). Turn 1 prefills the
    610-token VQA prompt; turn 2 asks a short follow-up and prefills ONLY
    its 64-token bucketed delta against the resident cache --
    chat_turn2_ttft_ms vs chat_turn1_ttft_ms (~= the vqa_full32 TTFT
    shape) is the cache-reuse win. Wall-clock includes dispatch and the
    per-turn host staging, like the other TTFT numbers."""
    import jax
    import jax.numpy as jnp

    from libra_tpu.chat import ChatSession
    from libra_tpu.config import VQGANConfig
    from libra_tpu.generation import GenerationConfig
    from libra_tpu.models import vqgan as vqgan_model
    from __graft_entry__ import _example_batch, _flagship_cfg, fast_fill

    cfg = _flagship_cfg(32)
    params = _device_quantized_params(cfg)
    vq_cfg = VQGANConfig(select_layer=(-2, -1))
    vq_params = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype")
        and x.dtype == jnp.float32 else x,
        fast_fill(lambda: vqgan_model.init_params(jax.random.PRNGKey(0),
                                                  vq_cfg))))
    gen = GenerationConfig(eos_token_id=-1, kv_quant=True, a8_prefill=True)
    sess = ChatSession(params, cfg, batch=B, max_len=max_len, gen=gen,
                       delta_bucket=64, vq_params=vq_params, vq_cfg=vq_cfg)
    # turn 1 = the vqa_full32 shape: fused uint8-pixels prefill (encode
    # hidden behind the prompt pass; 4x fewer staging bytes than f32)
    ids, mask, vi, _ = _example_batch(cfg, B=B, text_len=text_len)
    pixels = np.random.RandomState(0).randint(
        0, 256, size=(B, 336, 336, 3)).astype(np.uint8)
    t1 = {"input_ids": ids, "attention_mask": mask, "vision_indices": vi,
          "pixels": pixels, "img_start": np.full((B,), 8, np.int32)}
    rng = np.random.RandomState(1)
    d_ids = rng.randint(3, cfg.vocab_size,
                        size=(cfg.vision_codebook_num, B, delta_len))
    d_ids[1:] = d_ids[0]
    t2 = {"input_ids": d_ids,
          "vision_indices": np.full((B, delta_len),
                                    cfg.max_vision_token_length, np.int32)}

    def cycle():
        sess.reset()
        t0 = time.perf_counter()
        sess.ask(t1, max_new_tokens=1)      # ask() blocks on a readback
        turn1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sess.ask(t2, max_new_tokens=1)
        turn2 = time.perf_counter() - t0
        return turn1, turn2

    cycle()                                 # compile both turn programs
    runs = [cycle() for _ in range(2)]
    turn1 = min(r[0] for r in runs)
    turn2 = min(r[1] for r in runs)
    return {"chat_turn1_ttft_ms": round(turn1 * 1000, 1),
            "chat_turn2_ttft_ms": round(turn2 * 1000, 1),
            "chat_delta_tokens": delta_len}


def bench_train_compile(num_layers=32, B=8, A=4, text_len=122):
    """PROOF stage (VERDICT r3 item 4): AOT-compile the FULL-WIDTH
    32-layer rematerialised accumulation step (8-micro x 4-accum, seq
    ~700, frozen_language, bf16 params -- the reference pretrain micro
    shape, libra_pretrain.yaml:95-96) against a DEVICELESS v5e-8
    topology (jax.experimental.topologies), sharded over the production
    {data, fsdp, model} mesh, and report the compiler's per-chip memory
    analysis. Nothing is materialised and nothing touches the axon
    tunnel: the compile-only TPU client runs locally, so this can never
    wedge the session (the r3 design retried a single-chip full-32
    compile that its own extrapolation proved needs 80 GB -- dropped).
    The per-chip peak-HBM number vs the 16 GB of a v5e chip IS the
    evidence for the README's "11B pretrain fits v5e-8" claim."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies

    from libra_tpu.models import libra as M
    from libra_tpu.parallel import make_mesh
    from libra_tpu.parallel.sharding import data_shardings, state_shardings
    from libra_tpu.training.optimizer import (OptimizerConfig,
                                              make_optimizer,
                                              trainable_mask)
    from libra_tpu.training.trainer import accum_train_step, init_state
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(num_layers)
    Q, Mv = cfg.vision_codebook_num, cfg.max_vision_token_length
    N = text_len + Mv                     # 700: the pretrain seq budget
    s = jax.ShapeDtypeStruct

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")

    def compile_mesh(data, fsdp, model, remat=True):
        mesh = make_mesh(data=data, fsdp=fsdp, model=model,
                         devices=topo.devices)
        ps = jax.eval_shape(
            lambda: M.init_params(jax.random.PRNGKey(0), cfg))
        ocfg = OptimizerConfig(frozen_language=True, total_steps=1000)
        opt = make_optimizer(ocfg, ps)
        gmask = trainable_mask(ps, ocfg)
        st = jax.eval_shape(functools.partial(init_state, opt=opt), ps)
        # EXPLICIT state shardings (the runtime Trainer flow): opt.init's
        # zeros_like moments have no data dependence on the params, so
        # GSPMD propagation leaves them replicated -- ~10 GB/chip of f32
        # moments on this very compile before state_shardings existed.
        st_shard = state_shardings(mesh, ps, st)
        bt = {
            "input_ids": s((A, Q, B, N), jnp.int32),
            "attention_mask": s((A, B, N), jnp.int32),
            "vision_indices": s((A, B, N), jnp.int32),
            "coninous_signal": s((A, B, N, cfg.contiguous_signal_size),
                                 jnp.float32),
            "labels": s((A, Q, B, N), jnp.int32),
        }
        bshard = data_shardings(mesh, bt, stacked=True)
        stp = functools.partial(accum_train_step, cfg=cfg, opt=opt,
                                grad_mask=gmask, remat=remat)
        compiled = jax.jit(stp, in_shardings=(st_shard, bshard),
                           donate_argnums=(0,)).lower(st, bt).compile()
        ma = compiled.memory_analysis()
        args = getattr(ma, "argument_size_in_bytes", 0)
        temp = getattr(ma, "temp_size_in_bytes", 0)
        outs = getattr(ma, "output_size_in_bytes", 0)
        alias = getattr(ma, "alias_size_in_bytes", 0)
        # memory_analysis is PER PARTITION for SPMD executables
        return (args + temp + outs - alias) / 1e9, {
            "args_gb": round(args / 1e9, 2), "temp_gb": round(temp / 1e9, 2)}

    out = {"train_compile_layers": num_layers, "train_compile_accum": A,
           "train_compile_topology": "v5e:2x4 (deviceless AOT)"}
    # fsdp8_bigdots: the r5 remat="big_dots" policy (saved dot outputs are
    # scoped to one micro inside the accumulation scan, so the 32-layer
    # cost is bounded -- measured 12.76 GB vs full's 10.13 GB) -- the
    # durable proof that the 11% faster proxy policy also FITS at 11B
    for tag, (d, f, m, r) in (("fsdp8", (1, 8, 1, True)),
                              ("fsdp4_tp2", (1, 4, 2, True)),
                              ("fsdp8_bigdots", (1, 8, 1, "big_dots"))):
        t0 = time.perf_counter()
        try:
            peak, detail = compile_mesh(d, f, m, remat=r)
        except Exception as e:  # noqa: BLE001
            out[f"train_compile_8chip_{tag}_error"] = repr(e)[:160]
            continue
        out.update({
            f"train_compile_8chip_{tag}_peak_hbm_gb": round(peak, 2),
            f"train_compile_8chip_{tag}_s": round(
                time.perf_counter() - t0, 1),
            f"train_compile_8chip_{tag}_fits_16gb": bool(peak <= 16.0),
            **{f"train_compile_8chip_{tag}_{k}": v
               for k, v in detail.items()}})
    return out


def bench_kernels():
    """Isolated weight-streaming kernel numbers on one (4096, 11008)
    decode-shaped matvec: fused Pallas int8, XLA int8-dequant, bf16, and
    the packed int4 kernel (VERDICT r3 item 10: int4 is memory-halving
    only -- its VPU unpack holds it at XLA-int8 speed; these numbers
    document that measured, not claimed)."""
    import jax
    import jax.numpy as jnp

    from libra_tpu.ops.pallas.int4_matmul import int4_matmul, pack_int4
    from libra_tpu.ops.pallas.int8_matmul import int8_matmul

    K, F, L = 4096, 11008, 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, K).astype(np.float32)).astype(jnp.bfloat16)
    # STACKED (L, K, F) weights with a rotating layer index per iteration
    # -- the real decode access pattern. A single 90 MB weight reused
    # across scan iterations gets hoisted into VMEM by XLA and "measures"
    # an impossible 1.9 TB/s; rotating through 8 layers defeats that.
    q8 = jnp.asarray(rng.randint(-127, 128, (L, K, F)).astype(np.int8))
    s8 = jnp.full((L, 1, F), 1 / 127, jnp.float32)
    wb = (q8.astype(jnp.bfloat16) / 127)
    # stacked int4 pack ON DEVICE (a host pack would stage 1.4 GB back)
    p4, s4 = jax.jit(lambda w: pack_int4(w.astype(jnp.float32)))(wb)

    # single compiled program looping the op N times; two-point
    # differencing cancels dispatch overhead and compile/hoist constants
    def timed(fn, *args):
        import functools

        @functools.partial(jax.jit, static_argnums=0)
        def loop(n, x, *rest):
            def body(c, i):
                out = fn(c, i % L, *rest)
                # epsilon-weighted dependence: a 0-coefficient version
                # was constant-folded and the matmuls DCE'd
                return c + 1e-30 * out[:, :c.shape[-1]].astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, jnp.arange(n, dtype=jnp.int32))
            return c

        def run(n):
            best = None
            for _ in range(3):             # tunnel jitter ~ tens of ms
                t0 = time.perf_counter()
                _sync(loop(n, x, *args))
                d = time.perf_counter() - t0
                best = d if best is None else min(best, d)
            return best

        n1, n2 = 48, 448                   # >> dispatch noise at ~0.1 ms/it
        run(n1), run(n2)                   # compile both trip counts
        return (run(n2) - run(n1)) / (n2 - n1)

    t_int8 = timed(lambda x, i, q, s: int8_matmul(x, q, s, idx=i), q8, s8)
    t_xla8 = timed(
        lambda x, i, q, s: jnp.einsum(
            "mk,kf->mf", x, (q[i] * s[i]).astype(jnp.bfloat16)), q8, s8)
    t_bf16 = timed(lambda x, i, w: jnp.einsum("mk,kf->mf", x, w[i]), wb)
    t_int4 = timed(lambda x, i, p, s: int4_matmul(x, p, s, idx=i), p4, s4)
    t_w4a8 = timed(lambda x, i, p, s: int4_matmul(x, p, s, idx=i, a8=True),
                   p4, s4)
    nbytes = K * F
    return {
        "matvec_int8_pallas_ms": round(t_int8 * 1e3, 3),
        "matvec_int8_pallas_gb_s": round(nbytes / t_int8 / 1e9, 1),
        "matvec_int8_xla_ms": round(t_xla8 * 1e3, 3),
        "matvec_bf16_ms": round(t_bf16 * 1e3, 3),
        "matvec_int4_ms": round(t_int4 * 1e3, 3),
        "matvec_int4_gb_s": round(nbytes / 2 / t_int4 / 1e9, 1),
        "matvec_w4a8_ms": round(t_w4a8 * 1e3, 3),
        "matvec_w4a8_gb_s": round(nbytes / 2 / t_w4a8 / 1e9, 1),
    }


def _stage(name, t0):
    import sys
    print(f"[bench] {name}: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)


# Each stage runs in its OWN subprocess with a hard timeout: a wedged TPU
# tunnel makes jax calls hang forever (not error), which would otherwise
# hang the whole bench. The child prints one JSON dict of results.
# (Timeouts budget the remote compiler: full-32-layer programs with Pallas
# kernels take 5-15 min to compile through the tunnel.)
def bench_kernel_lowering():
    """FIRST stage: jit-lower every Pallas kernel at every production
    shape family on the real TPU backend (VERDICT r3 weak #2). Lowering
    only -- no dispatch, seconds per case, cannot wedge the tunnel -- and
    it fails LOUDLY before any expensive stage runs on a kernel that can
    never compile."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.lower_check import lower_all
    return {"kernel_lowering_ok": lower_all(verbose=False)}


_STAGES = {
    # FIRST: cheap per-kernel TPU lowering smoke -- fails loudly up front
    "kernel_lowering": (lambda: bench_kernel_lowering(), 600),
    "vision_encode": (lambda: bench_vision_encode(), 480),
    "decode_full32_int8": (lambda: (lambda r: {
        "decode_full32_tok_s": round(r[0], 2),
        "decode_full32_wall_s": round(r[1], 3), **r[2]})(
            bench_decode_full_int8()), 1500),
    "spec_decode": (lambda: bench_spec_decode(), 2400),
    "vqa_full32": (lambda: _vqa_stage(), 2400),
    "serving": (lambda: bench_serving(), 2700),
    # merged-prefill A/B arm: identical ladder, merged forced OFF
    "serving_nomerge": (lambda: bench_serving_nomerge(), 2700),
    "serving_spec": (lambda: bench_serving_spec(), 3000),
    # larger slot pool: decode bytes/step are weights-dominated (6.6 GB
    # weights vs ~0.2 GB KV per slot at S=768), so doubling the pool
    # nearly doubles aggregate tokens/s at roughly equal step time.
    # Refill groups capped at 4: the k=8 full-32 prompt program crashes
    # the remote compiler (HTTP 500, observed r4)
    "serving8": (lambda: {"serving8" + k[len("serving"):]: v
                          for k, v in bench_serving(
                              B=8, n_requests=32, group_cap=4,
                              rps_points=(2.0, 2.5)).items()}, 2700),
    "chat": (lambda: bench_chat_multiturn(), 1500),
    # int4 serving mode on the north-star decode shape: group-int4
    # projections (ops/pallas/int4_matmul), weight bytes halve again.
    # Ordered LATE: a Mosaic crash on the full-32 int4 compile must not
    # wedge the tunnel before the proven stages have run.
    "decode_full32_int4": (lambda: (lambda r: {
        "decode4_full32_tok_s": round(r[0], 2),
        **{"decode4" + k[len("decode"):]: v for k, v in r[2].items()}})(
            bench_decode_full_int8(bits=4)), 2400),
    "train_step": (lambda: bench_train_step(), 1800),
    "kernels": (lambda: bench_kernels(), 900),
    # deviceless AOT against a v5e-8 topology: local compile-only client,
    # never touches the tunnel (kept last only because it is slow)
    "train_compile": (lambda: bench_train_compile(), 2400),
}


def _vqa_stage():
    """B=4 first (the BASELINE-config-4 batch); fall back to B=2 on OOM
    and record which batch ran."""
    for b in (4, 2):
        try:
            ttft, tok_s = bench_vqa_fused_full32(B=b)
            return {"vqa_full32_ttft_ms": round(ttft * 1000, 1),
                    "vqa_full32_tok_s": round(tok_s, 2),
                    "vqa_full32_batch": b}
        except Exception as e:  # noqa: BLE001
            err = repr(e)[:160]
            if "RESOURCE_EXHAUSTED" not in err and "memory" not in err.lower():
                raise
    return {"vqa_full32_error": "OOM at B=4 and B=2: " + err}


def _run_stage(name):
    out = {}
    try:
        out = _STAGES[name][0]()
    except Exception as e:  # noqa: BLE001
        out = {f"{name}_error": repr(e)[:200]}
    print("STAGE_RESULT " + json.dumps(out), flush=True)


# Curated stdout keys (VERDICT r4 item 1): the driver records only the
# LAST 2000 chars of stdout, which in r4 truncated the final JSON mid-dict
# and ate the headline numbers. The COMPLETE per-stage dict now lands in
# BENCH_RESULTS.json (rewritten after every stage, so even a crashed run
# keeps everything finished so far); stdout carries a short curated
# summary that always fits in the tail, with "value" printed LAST.
_HEADLINE = (
    "kernel_lowering_ok",
    "vision_encode_img_s_b8", "vision_encode_pct_of_sol",
    "decode_pct_of_sol", "decode_sol_tok_s",
    "vqa_full32_ttft_ms", "vqa_full32_tok_s",
    "spec_oracle_speedup", "spec_decode_speedup",
    "serving_tok_s", "serving_p50_ttft_ms",
    "serving_rps2.0_p50_ttft_ms", "serving_rps2.0_tok_s",
    "serving_rps2.0_nomerge_p50_ttft_ms",
    "serving_spec_tok_s", "serving_spec_accept_rate",
    "serving8_tok_s", "serving8_rps2.0_p50_ttft_ms",
    "chat_turn1_ttft_ms", "chat_turn2_ttft_ms",
    "train_step_tok_s", "train_mfu", "train_mfu_fullremat",
    "matvec_int8_pallas_gb_s", "matvec_int4_gb_s", "matvec_w4a8_gb_s",
    "decode4_full32_tok_s", "decode4_pct_of_sol",
    "train_compile_8chip_fsdp8_peak_hbm_gb",
    "train_compile_8chip_fsdp8_bigdots_peak_hbm_gb",
)


def main():
    import os
    import subprocess
    import sys

    results_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_RESULTS.json")
    extra = {}
    stages_meta = {}
    t_start = time.time()
    for name, (_, timeout) in _STAGES.items():
        t = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--stage", name],
                capture_output=True, text=True, timeout=timeout)
            for line in proc.stdout.splitlines():
                if line.startswith("STAGE_RESULT "):
                    extra.update(json.loads(line[len("STAGE_RESULT "):]))
                    break
            else:
                extra[f"{name}_error"] = (
                    f"no result (exit {proc.returncode}): "
                    + proc.stderr.strip()[-150:])
        except subprocess.TimeoutExpired:
            extra[f"{name}_error"] = f"timeout after {timeout}s"
        stages_meta[name] = round(time.perf_counter() - t, 1)
        # durable write after EVERY stage: a timeout/crash later in the
        # run can no longer lose the numbers already measured
        with open(results_path, "w") as f:
            json.dump({"started_unix": round(t_start, 1),
                       "stage_wall_s": stages_meta,
                       "results": extra}, f, indent=1, sort_keys=True)
            f.write("\n")
        _stage(name, t)

    headline = {k: extra[k] for k in _HEADLINE if k in extra}
    errors = {k: str(v)[:60] for k, v in extra.items()
              if k.endswith("_error")}
    final = {
        "results_file": "BENCH_RESULTS.json",
        "unit": "tokens/s",
        "vs_baseline": None,
        "errors": errors,
        "extra": headline,
        "metric": "decode_tok_s_full_11b_int8_single_chip_b4",
        "value": extra.get("decode_full32_tok_s", 0.0),
    }
    line = json.dumps(final)
    # hard guarantee: the whole line fits the driver's 2000-char tail
    while len(line) > 1900 and (final["extra"] or final["errors"]):
        (final["extra"] or final["errors"]).pop(
            next(iter(final["extra"] or final["errors"])))
        line = json.dumps(final)
    print(line)


if __name__ == "__main__":
    import sys
    if len(sys.argv) == 3 and sys.argv[1] == "--stage":
        _run_stage(sys.argv[2])
    else:
        main()
