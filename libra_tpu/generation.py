"""Autoregressive generation: jitted prefill + lax.while_loop decode.

TPU-native replacement for the reference's Python decode loop
(modeling_libra_utils.py:60-635, overriding HF greedy_search/sample):

* one jitted prefill over the (left-padded, bucketed) prompt;
* a `lax.while_loop` decode with NO host round-trips -- multi-codebook
  argmax / categorical sampling, EOS tracking on any codebook (language
  logits are identical across codebooks), eoi->newline forcing, and
  `vision_indices` auto-increment are all pure carried state;
* the reference's ZeRO-3 `synced_gpus` all-reduce handshake is unnecessary:
  SPMD decode is lockstep by construction.

Prompts must be LEFT-padded for batched generation (as in the reference
demo: padding_side='left').
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.models import libra as M


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 128
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0           # 0 = disabled
    top_p: float = 1.0       # 1.0 = disabled
    eos_token_id: int = 2
    pad_token_id: int = 0
    prompt_bucket: int = 0   # 0 = pad prompt to exact length (one jit per len)
    attn_impl: str = "auto"  # "auto" | "xla" | "pallas" (prefill kernel)
    kv_quant: bool = False   # int8 K/V cache (per-token/head scales)
    a8_prefill: bool = False  # w8a8 prefill: int8-weight matmuls quantize
    #   activations per-token and run native s8 x s8 MXU dots (2x bf16 MXU
    #   rate, no dequantized-weight traffic). Prefill only -- decode keeps
    #   exact weight-only dequant. No-op unless params are int8-quantized.
    split_prefill: bool = True  # modality-split prefill (raw-pixels path
    #   only): run the full-rank language projections on the static-width
    #   text rows instead of all N positions (the fixed 578-token image
    #   block makes the text width static). Exact -- language outputs at
    #   vision positions are discarded by the routing merge anyway.
    #   Auto-disabled in addition_mode (language path needed everywhere).
    spec_decode: int = 0  # gamma > 0 enables n-gram (prompt-lookup)
    #   speculative decoding: each decode iteration drafts `gamma` tokens
    #   by bigram lookup over the already-generated history (on device),
    #   verifies them in ONE (gamma+1)-token cached forward, and emits the
    #   accepted prefix + the model's own next token -- >= 1 token per
    #   step at ~1 step's HBM cost (decode is weight-bound). EXACT: every
    #   emitted token is the model's greedy argmax. Requires greedy
    #   (do_sample=False) and a text-mode decode (resolved
    #   decode_modality == "text"); see libra_tpu/spec_decode.py.
    decode_modality: str = "auto"  # "auto" | "text" | "dual".
    #   "text" = decode via the language path ONLY (vision projections/MLP/
    #   embeds statically skipped; ~half the weight bytes/step). EXACT for
    #   prompts that end in text: assemble_logits -inf's the whole vision
    #   vocab (incl. BOI) at text positions, so such a sequence can never
    #   re-enter vision. The Generator validates the prompt-tail invariant
    #   host-side. "dual" = both paths every step (needed for t2i prompts
    #   ending inside/at BOI). "auto" = resolve host-side: the Generator
    #   per call batch, the ServingEngine per run() stream (every request
    #   ending in text -> lang-only). The resolved value keys the
    #   compile cache.


def _filter_top_k(logits: jax.Array, k: int) -> jax.Array:
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, -jnp.inf, logits)


def _filter_top_p(logits: jax.Array, p: float) -> jax.Array:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the smallest set with cumulative prob > p (always keeps top-1):
    # token i is REMOVED iff the cumulative prob before it already exceeds p
    # (HF TopPLogitsWarper semantics used by the reference sample() path).
    # The threshold is the MINIMUM of the KEPT logits; anything strictly
    # below it goes (the boundary token itself is removed because it sits
    # below the last kept logit in sorted order).
    removed = cum - probs > p
    kept = jnp.where(removed, jnp.inf, sorted_logits)
    threshold = jnp.min(kept, axis=-1, keepdims=True)
    return jnp.where(logits < threshold, -jnp.inf, logits)


def sample_tokens(logits: jax.Array, gen: GenerationConfig,
                  rng: jax.Array) -> jax.Array:
    """logits: (Q, B, Vc) -> tokens (Q, B). Per-codebook argmax or
    independent multinomial (reference: modeling_libra_utils.py:263,
    559-563)."""
    if not gen.do_sample:
        return jnp.argmax(logits, axis=-1)
    x = logits / jnp.maximum(gen.temperature, 1e-6)
    if gen.top_k > 0:
        x = _filter_top_k(x, gen.top_k)
    if gen.top_p < 1.0:
        x = _filter_top_p(x, gen.top_p)
    Q, B, Vc = x.shape
    return jax.random.categorical(rng, x, axis=-1)


class GenerateResult(NamedTuple):
    sequences: jax.Array       # (Q, B, prompt_len + max_new_tokens)
    num_generated: jax.Array   # (B,) tokens generated incl. EOS
    iterations: Optional[jax.Array] = None  # decode-loop iterations (spec
    #   decode only: tokens/iteration - 1 is the measured acceptance rate)


def _last_position_logits(params, cfg: LibraConfig, hidden: jax.Array,
                          flag_last: jax.Array, vi_last: jax.Array,
                          h_up: Optional[jax.Array] = None,
                          lang_only: bool = False):
    """Combined-vocab logits for the last position of `hidden` (B, N, D).
    h_up: (B, D) hidden from R-1 steps back (2D prediction mode only).
    lang_only statically skips the vision heads: assemble_logits -inf's the
    vision slice at text positions regardless of its value, so zeros are
    exact there."""
    h = hidden[:, -1:]
    tl = M.compute_text_logits(params, h)
    if lang_only:
        vl = jnp.zeros((cfg.vision_codebook_num,) + h.shape[:2]
                       + (cfg.vision_vocab_size,), tl.dtype)
    elif cfg.vision_prediction_mode == "2d":
        vl = M.compute_vision_logits_2d(params, cfg, h, vi_last[:, None],
                                        h_up=h_up[:, None])
    else:
        vl = M.compute_vision_logits(params, h)
    logits = M.assemble_logits(cfg, tl, vl, flag_last[:, None])[:, :, 0]
    return M.force_eoi_newline(cfg, logits, vi_last)       # (Q, B, Vc)


def decode_micro_step(params, cfg: LibraConfig, tok, mask_buf, cache,
                      vi_last, pos_last, *, active=None, hist=None,
                      is_2d=False, lang_only=False):
    """One decode step's shared core, used by all three decode loops
    (generation._generate_impl, serving._decode, chat._turn_impl): advance
    vision_indices (auto-increment clamped at text, reference
    modeling_libra.py:1273-1281) and positions (2D-RoPE base: +1 on
    text/BOI, R+1 on EOI, 0 inside images), run the cached single-token
    forward, assemble last-position logits.

    `tok` (Q, B) is this step's input token, already emission-masked by
    the caller, and `mask_buf` already carries the caller's mask-write
    policy for the token's slot. active=None: lockstep advance
    (generation's while_loop -- finished rows emit pads but vi/pos keep
    advancing, clamped at text); active (B,) bool: frozen rows keep their
    vi/pos (serving slots, chat turns). hist: (B, R-1, D) hidden ring or
    None; is_2d selects the 2D-prediction ring update and up-neighbour.
    Returns (logits, cache, vi_new, pos_new, hist)."""
    Mv = cfg.max_vision_token_length

    def adv(new, old):
        return new if active is None else jnp.where(active, new, old)

    vi_new = adv(jnp.minimum(vi_last + 1, Mv), vi_last)
    if cfg.use_2d_rope:
        inc = jnp.where((vi_new == Mv) | (vi_new == 0), 1, 0)
        inc = jnp.where(vi_new == Mv - 1,
                        cfg.image_feature_resolution + 1, inc)
        pos_new = adv(pos_last + inc, pos_last)
        offset_tab = M.make_2d_pos_offset(cfg)
        pos_ids = (pos_new[:, None]
                   + offset_tab[jnp.clip(vi_new, 0, Mv)])[:, :, None]
    else:
        pos_new = adv(pos_last + 1, pos_last)
        pos_ids = pos_new[:, None]
    step = M.forward(params, cfg, tok[:, :, None], mask_buf,
                     vi_new[:, None], None, position_ids=pos_ids,
                     cache=cache, lang_only=lang_only)
    h_up = None if hist is None else hist[:, 0]   # R-1 steps back (2d)
    logits = _last_position_logits(params, cfg, step.hidden_states,
                                   vi_new < Mv, vi_new, h_up=h_up,
                                   lang_only=lang_only)
    if hist is not None and is_2d:
        hist = jnp.concatenate([hist[:, 1:], step.hidden_states], axis=1)
    return logits, step.cache, vi_new, pos_new, hist


class PrefillState(NamedTuple):
    """Everything the decode loop needs after the prompt pass (shared by
    the standard `_generate_impl` loop and spec_decode's verify loop)."""
    tokens: jax.Array        # (Q, B, S) prompt written at [:, :, :N]
    mask_buf: jax.Array      # (B, Sc)
    cache: Any               # M.KVCache, index == N
    logits: jax.Array        # (Q, B, Vc) last-prompt-position logits
    vi_last: jax.Array       # (B,)
    last_pos: jax.Array      # (B,) carried position counter
    hist: jax.Array          # (B, R-1, D) 2D-mode hidden ring
    h_up_last: jax.Array     # (B, D)
    offset_tab: Optional[jax.Array]   # 2D-RoPE offsets or None


def _prefill(params, input_ids, attention_mask, vision_indices,
             contiguous_signal, vq_params=None, pixels=None,
             img_start=None, *, cfg: LibraConfig, gen: GenerationConfig,
             vq_cfg=None, cache_shardings=None,
             extra_cache: int = 0) -> PrefillState:
    """Jit-traceable prompt pass: fused vision encode (raw-pixels path),
    cache init (+`extra_cache` slack positions past N + max_new_tokens --
    spec_decode's verify block may probe up to gamma slots past the
    budget), prompt forward, last-position logits, 2D carries."""
    Q, B, N = input_ids.shape
    Mv = cfg.max_vision_token_length
    S = N + gen.max_new_tokens
    text_span = None
    if (pixels is not None and gen.split_prefill
            and not cfg.addition_mode):
        # every raw-pixels row carries exactly one full Mv image block at
        # img_start, so the text width N - Mv is static -- the split is
        # exact (and bitwise so under a8_prefill: same per-token dots)
        text_span = M.text_span_maps(cfg, img_start, N)
    # Quantized caches round their length up to 128: the fused decode-
    # attention kernel (the default quantized decode path) needs S-aligned
    # blocks. Extra positions are masked; their traffic cost is bounded by
    # the kernel's one-pass read replacing the XLA triple pass. The
    # rounding depends only on GenerationConfig -- program shape is a pure
    # function of the compile-cache key (ADVICE r2 finding 2).
    Sc = S + extra_cache
    Sc = -(-Sc // 128) * 128 if gen.kv_quant else Sc

    if pixels is not None:
        # fused vision path: CLIP+VQGAN encode runs INSIDE this program, so
        # XLA overlaps it with the decoder prefill (the north-star serving
        # shape: encode+tokenize fully hidden behind prefill)
        from libra_tpu.training.fused import encode_images_to_tokens
        img_ids, img_sig = encode_images_to_tokens(vq_params, vq_cfg, cfg,
                                                   pixels)

        def scat(row, block, start):
            return jax.lax.dynamic_update_slice(
                row, block.astype(row.dtype),
                (start,) + (0,) * (row.ndim - 1))

        input_ids = jax.vmap(jax.vmap(scat, in_axes=(0, 0, 0)),
                             in_axes=(0, 0, None))(input_ids, img_ids,
                                                   img_start)
        sig = jnp.zeros((B, N, img_sig.shape[-1]), img_sig.dtype)
        contiguous_signal = jax.vmap(scat)(sig, img_sig, img_start)

    impl = gen.attn_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"

    cache = M.init_cache(cfg, B, Sc, quantized=gen.kv_quant)
    if cache_shardings is not None:
        # pin the KV cache layout: heads sharded over the "model" mesh axis
        # (decode-time KV lives distributed over ICI); the while_loop carry
        # then keeps this placement for the whole decode
        cache = jax.tree_util.tree_map(jax.lax.with_sharding_constraint,
                                       cache, cache_shardings)
    mask_buf = jnp.zeros((B, Sc), jnp.int32).at[:, :N].set(attention_mask)
    if cfg.use_2d_rope:
        # (B, 2, N) row/col positions (reference: get_2d_position_ids;
        # decode advances a carried base counter instead of re-deriving)
        pos = M.get_2d_position_ids(cfg, vision_indices, attention_mask)
        offset_tab = M.make_2d_pos_offset(cfg)
        base_last = (pos[:, 0, -1]
                     - offset_tab[jnp.clip(vision_indices[:, -1], 0,
                                           Mv)][:, 0])
    else:
        pos = M.position_ids_from_mask(attention_mask)
        offset_tab = None
        base_last = None
    from libra_tpu.ops.qlinear import a8_enabled
    with a8_enabled(gen.a8_prefill):
        # w8a8 applies to the compute-bound prompt pass only; the decode
        # body below traces OUTSIDE this context and stays on the exact
        # weight-only-dequant path
        out = M.forward(params, cfg, input_ids, mask_buf, vision_indices,
                        contiguous_signal, position_ids=pos, cache=cache,
                        attn_impl=impl, text_span=text_span)

    flag_last = vision_indices[:, -1] < Mv
    vi_last = vision_indices[:, -1]

    # 2D prediction mode: ring buffer of the last R-1 hiddens so the "up"
    # neighbour (R-1 steps back) is available during decode -- replaces the
    # reference's full past_hidden_states carry (modeling_libra.py:1147-1156)
    is_2d = cfg.vision_prediction_mode == "2d"
    Rb = max(cfg.image_feature_resolution - 1, 1)
    if is_2d:
        h = out.hidden_states
        if h.shape[1] < Rb:
            # sub-(R-1) prompts: left-pad the ring with zeros so its depth
            # stays exactly R-1 (a shorter ring would silently read the
            # wrong "up" neighbour; ADVICE r2 finding 3). Degenerate case:
            # a real image block is always >= R-1 tokens.
            h = jnp.pad(h, ((0, 0), (Rb - h.shape[1], 0), (0, 0)))
        hist = h[:, -Rb:]                          # (B, Rb, D)
        # up for the LAST prompt position: h[N-1-(R-1)]
        idx = max(h.shape[1] - 1 - Rb, 0)
        h_up_last = h[:, idx]
    else:
        hist = jnp.zeros((B, Rb, out.hidden_states.shape[-1]),
                         out.hidden_states.dtype)
        h_up_last = hist[:, 0]

    logits = _last_position_logits(params, cfg, out.hidden_states,
                                   flag_last, vi_last, h_up=h_up_last)

    tokens = jnp.zeros((Q, B, S), input_ids.dtype).at[:, :, :N].set(input_ids)
    last_pos = base_last if cfg.use_2d_rope else pos[:, -1]
    return PrefillState(tokens=tokens, mask_buf=mask_buf, cache=out.cache,
                        logits=logits, vi_last=vi_last, last_pos=last_pos,
                        hist=hist, h_up_last=h_up_last,
                        offset_tab=offset_tab)


def _generate_impl(params, input_ids, attention_mask, vision_indices,
                   contiguous_signal, rng, vq_params=None, pixels=None,
                   img_start=None, *, cfg: LibraConfig,
                   gen: GenerationConfig, vq_cfg=None,
                   cache_shardings=None):
    Q, B, N = input_ids.shape
    is_2d = cfg.vision_prediction_mode == "2d"
    st = _prefill(params, input_ids, attention_mask, vision_indices,
                  contiguous_signal, vq_params, pixels, img_start, cfg=cfg,
                  gen=gen, vq_cfg=vq_cfg, cache_shardings=cache_shardings)
    tokens, mask_buf, logits = st.tokens, st.mask_buf, st.logits
    vi_last, last_pos, hist = st.vi_last, st.last_pos, st.hist

    lang_only = gen.decode_modality == "text"

    def cond(state):
        t = state[0]
        finished = state[8]
        return (t < gen.max_new_tokens) & ~jnp.all(finished)

    def body(state):
        (t, tokens, mask_buf, cache, logits, vi_last, last_pos, rng,
         finished, num_gen, hist) = state
        rng, step_rng = jax.random.split(rng)
        next_tok = sample_tokens(logits, gen, step_rng)          # (Q, B)
        next_tok = jnp.where(finished[None, :], gen.pad_token_id, next_tok)
        # EOS on any codebook finishes (language logits identical across
        # codebooks; reference: modeling_libra_utils.py:281-285)
        newly_finished = jnp.any(next_tok == gen.eos_token_id, axis=0)
        num_gen = num_gen + jnp.where(finished, 0, 1)
        finished = finished | newly_finished

        slot = N + t
        tokens = jax.lax.dynamic_update_slice(
            tokens, next_tok[:, :, None].astype(tokens.dtype), (0, 0, slot))
        mask_buf = jax.lax.dynamic_update_slice(
            mask_buf, jnp.ones((B, 1), mask_buf.dtype), (0, slot))

        # the forward computes the NEXT iteration's logits -- skip it when
        # this token was the last one needed (t+1 == max_new or every row
        # finished). lax.cond executes only the taken branch, so the final
        # iteration of every generation saves a full weight-streaming
        # decode step; at max_new=1 (the TTFT probe) the whole body is
        # sample-only (measured r4: vqa_full32 TTFT 306 -> ~291 ms).
        need_more = ((t + 1) < gen.max_new_tokens) & ~jnp.all(finished)

        def fwd(mask_buf, cache, vi_last, last_pos, hist):
            return decode_micro_step(
                params, cfg, next_tok, mask_buf, cache, vi_last, last_pos,
                hist=hist, is_2d=is_2d, lang_only=lang_only)

        def keep(mask_buf, cache, vi_last, last_pos, hist):
            return logits, cache, vi_last, last_pos, hist

        logits2, cache, vi_new, new_pos, new_hist = jax.lax.cond(
            need_more, fwd, keep, mask_buf, cache, vi_last, last_pos, hist)
        return (t + 1, tokens, mask_buf, cache, logits2, vi_new,
                new_pos, rng, finished, num_gen, new_hist)

    init = (jnp.int32(0), tokens, mask_buf, st.cache, logits, vi_last,
            last_pos, rng, jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
            hist)
    final = jax.lax.while_loop(cond, body, init)
    tokens, num_gen = final[1], final[9]
    return GenerateResult(sequences=tokens, num_generated=num_gen)


class Generator:
    """Compiled-generation frontend. Jits one program per
    (prompt_len_bucket, generation config) and reuses it across calls.

    With vq (params, cfg) supplied, inputs may carry raw "pixels" +
    "img_start" instead of pre-encoded image ids -- the vision encode then
    runs fused inside the same compiled program as the prefill.

    With a `mesh`, params are tensor-parallel sharded over its "model" axis
    (Megatron-style column/row specs from libra_tpu.parallel.sharding) and
    the KV cache is pinned head-sharded over the same axis -- SPMD decode
    over ICI, replacing the reference's single-GPU decode + ZeRO-3
    synced_gpus handshake (modeling_libra_utils.py:215-223)."""

    def __init__(self, params, cfg: LibraConfig, vq_params=None,
                 vq_cfg=None, mesh=None):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from libra_tpu.parallel.sharding import shard_params
            params = shard_params(mesh, params)
            if vq_params is not None:
                # the vision tower is small (~0.4B): replicate
                vq_params = jax.device_put(
                    vq_params, NamedSharding(mesh, PartitionSpec()))
        else:
            # Pin params on-device ONCE. Host (numpy) leaves would otherwise
            # be re-staged on EVERY call -- through the remote-TPU tunnel
            # that is ~100s per call for an 8-layer flagship, vs ~10ms/token
            # for the decode itself.
            params = jax.device_put(params)
            if vq_params is not None:
                vq_params = jax.device_put(vq_params)
        self.params = params
        self.cfg = cfg
        self.vq_params = vq_params
        self.vq_cfg = vq_cfg
        self.mesh = mesh
        self._compiled: Dict[Any, Any] = {}
        # the Pallas int8 kernels are opaque to GSPMD: under a TP mesh the
        # sharded weights must stay on the XLA path (decided once here;
        # r2 set this inside __call__ -- needless mutable state)
        from libra_tpu.ops.qlinear import kernel_enabled
        self._qk_ctx = functools.partial(kernel_enabled, mesh is None)

    def _get_fn(self, gen: GenerationConfig):
        key = gen
        if key not in self._compiled:
            cache_sh = None
            if self.mesh is not None:
                from libra_tpu.parallel.sharding import cache_shardings
                cache_sh = cache_shardings(self.mesh, self.cfg,
                                           quantized=gen.kv_quant)
            impl = _generate_impl
            if gen.spec_decode > 0:
                if gen.do_sample or gen.decode_modality != "text":
                    raise ValueError(
                        "spec_decode requires greedy decoding and a "
                        "text-mode decode (resolved decode_modality == "
                        "'text'); got do_sample=%r, decode_modality=%r"
                        % (gen.do_sample, gen.decode_modality))
                from libra_tpu.spec_decode import _spec_generate_impl
                impl = _spec_generate_impl
            self._compiled[key] = jax.jit(functools.partial(
                impl, cfg=self.cfg, gen=gen, vq_cfg=self.vq_cfg,
                cache_shardings=cache_sh))
        return self._compiled[key]

    def __call__(self, inputs: Dict[str, Any],
                 gen: Optional[GenerationConfig] = None,
                 rng: Optional[jax.Array] = None) -> GenerateResult:
        """inputs: dict from LibraTokenizer (input_ids (Q,B,N) LEFT-padded,
        attention_mask, vision_indices, coninous_signal; optionally
        pixels (B,S,S,3) + img_start (B,) for the fused vision path)."""
        gen = gen or GenerationConfig()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ids = jnp.asarray(inputs["input_ids"])
        mask = jnp.asarray(inputs["attention_mask"])
        vi = jnp.asarray(inputs["vision_indices"])
        sig = inputs.get("coninous_signal")
        sig = None if sig is None else jnp.asarray(sig)
        tail = np.asarray(inputs["vision_indices"])[:, -1]
        ends_in_text = bool(
            (tail >= self.cfg.max_vision_token_length).all())
        if gen.decode_modality == "auto":
            # resolve host-side: all prompts end in text -> the lang-only
            # decode body (exact there, ~half the weight bytes/step); any
            # prompt ending inside an image block -> dual-path. The
            # resolved value keys the compile cache.
            gen = dataclasses.replace(
                gen, decode_modality="text" if ends_in_text else "dual")
        elif gen.decode_modality == "text" and not ends_in_text:
            raise ValueError(
                "decode_modality='text' needs prompts ending in text "
                "(a prompt ending inside an image block would continue "
                "the image); got vision_indices tail %r" % (tail,))
        pixels = inputs.get("pixels")
        img_start = inputs.get("img_start")
        if pixels is not None:
            if self.vq_params is None:
                raise ValueError("Generator needs vq_params/vq_cfg for the "
                                 "fused vision path")
            pixels = jnp.asarray(pixels)
            img_start = jnp.asarray(img_start)
            sig = None

        if gen.prompt_bucket > 1:
            N = ids.shape[-1]
            pad = (-N) % gen.prompt_bucket
            if pad:
                # left-pad to the bucket boundary
                Q, B, _ = ids.shape
                ids = jnp.concatenate(
                    [jnp.full((Q, B, pad), gen.pad_token_id, ids.dtype), ids],
                    axis=-1)
                mask = jnp.concatenate(
                    [jnp.zeros((B, pad), mask.dtype), mask], axis=-1)
                vi = jnp.concatenate(
                    [jnp.full((B, pad), self.cfg.max_vision_token_length,
                              vi.dtype), vi], axis=-1)
                if sig is not None:
                    sig = jnp.concatenate(
                        [jnp.zeros((B, pad, sig.shape[-1]), sig.dtype), sig],
                        axis=1)
                if img_start is not None:
                    img_start = img_start + pad
        with self._qk_ctx():
            return self._get_fn(gen)(self.params, ids, mask, vi, sig, rng,
                                     self.vq_params, pixels, img_start)
