"""Continuous-batching serving engine (net-new vs the reference, which
serves one static batch per `generate()` call).

v4 design (TPU-first): a fixed pool of `max_batch` slots, each owning an
INDEPENDENT per-slot timeline of the pooled KV cache (k/v buffers are
(L, B, max_len, H, d) -- int8 head-major (L, B, H, max_len, d) -- with a
(B,) write-index vector: KVCache's per-slot mode). A finished slot is
refilled by prefilling the next queued request at position 0 of the SAME
row: stale K/V from the previous occupant is never attended because every
position is rewritten before any query reaches it (causal k<=q, and
position k is written when the new request processes position k). Slots
therefore recycle indefinitely -- total generated tokens across a run are
unbounded; the only capacity rule is per-request: prompt_len +
max_new_tokens <= max_len.

Two compiled programs:
  * `_prefill` (per prompt-length bucket x group size k): a GROUP of up to
    max_batch same-bucket requests prefill as one B=k dispatch into their k
    slots (v4 -- grouped refills; slot-state rows update on device).
    Requests may carry raw `pixels` + `img_start`: the CLIP+VQGAN
    encode then runs INSIDE the prefill program and its ids/signal are
    scattered on-device (the Generator's fused path,
    tokenization_libra.py:250-294 semantics) -- VQA requests arrive as
    images, encode hides behind prefill in serving too.
  * `_decode`: a `lax.scan` of `decode_chunk` lockstep single-token steps
    in ONE dispatch (inactive slots masked, per-slot budgets decremented
    on device). Through a remote-TPU tunnel each dispatch costs ~27 ms;
    chunking amortises it K-fold, which is what makes the engine's
    host-driven loop competitive with the Generator's on-device
    `while_loop` (VERDICT r3 item 3).

The host scheduler interleaves AT MOST ONE prefill between decode chunks
while any slot is decoding (VERDICT r3 item 7): a burst of queued prompts
stalls active slots by one bucketed prefill per chunk, not by the whole
backlog; dispatches are async, so the host never blocks the device queue.

MERGED CHUNKED PREFILL (v5, default-on where eligible): when a slot frees
while the pool is busy, its next request's prompt is NOT prefilled as a
dedicated dispatch (which would stall every decoding slot for a full
prompt pass). Instead the prompt is "installed" into per-slot device
prompt buffers and consumed C = `merged_chunk` tokens per iteration by a
MERGED decode program whose forward runs over a TOKEN-PACKED flat axis of
T = B + C positions: the B decode tokens (one per slot) followed by the
next C prompt tokens of ONE prefilling slot (ids/vision indices/signal/
positions sliced on device from the installed buffers). Every dense op is
token-pointwise, so the chunk adds only C real positions of FLOPs to the
weight stream the decode tokens already stream -- prefill compute hides
inside decode's memory stalls instead of serialising in front of it
(SARATHI-style chunked prefill, re-derived for the TPU cost model; a
dense (B, C) layout was built first and measured out: its B*C garbage
positions cost more MXU time than the dedicated-prefill stall it
removes). Attention splits the packed axis into its two native shapes --
the decode segment is EXACTLY the classic per-row Nq=1 step, the chunk
segment attends its own cache row at Nq=C. Chunked prefill is EXACT:
per-position projections/norms are row-independent and each chunk's
attention reads the identical cached K/V with exact-zero masked tails,
so installed requests emit bit-equal tokens to dedicated-prefill runs
(tests assert token parity vs the Generator). Cold starts (empty pool)
and ineligible requests (raw pixels, bucket not a multiple of C, prompt
longer than the buffer) keep the dedicated grouped prefill path.
Requests may carry `arrival_s` (open-loop load): the scheduler admits each
request only once its arrival time passes, sleeping when the pool is idle,
and TTFT is measured from arrival -- a Poisson stream therefore yields
honest continuous-serving latency percentiles rather than burst queue-wait.

Multi-codebook sampling, EOI->newline forcing, vision_indices carry,
2D-RoPE position carry and the 2D-mode hidden ring match
libra_tpu.generation exactly.

Composes with the framework's other serving features:
  * mesh=...: tensor-parallel params (Megatron col/row specs) + the KV
    cache head-sharded over the "model" axis (cache_shardings);
  * int8 weights: pass a quantize_params(...) tree as params;
  * GenerationConfig(kv_quant=True): int8 K/V cache (head-major; decode
    reads it through the fused Pallas kernel on TPU);
  * vision_prediction_mode == "2d": per-slot (R-1)-deep hidden ring.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.generation import (GenerationConfig, _last_position_logits,
                                  decode_micro_step, sample_tokens)
from libra_tpu.models import libra as M


@dataclass
class Request:
    request_id: int
    input_ids: np.ndarray        # (Q, N) combined-vocab ids
    vision_indices: np.ndarray   # (N,)
    contiguous_signal: Optional[np.ndarray] = None   # (N, S) or None
    max_new_tokens: int = 128
    # raw-image VQA path: pixels (side, side, 3) + the prompt position of
    # the 578-token image block (ids there are placeholders, overwritten
    # by the on-device encode inside prefill)
    pixels: Optional[np.ndarray] = None
    img_start: int = 0
    # open-loop load: seconds AFTER run() start at which this request
    # becomes visible to the scheduler (None = already queued at start).
    # TTFT is measured from arrival, so p50/p95 under a Poisson stream are
    # honest continuous-serving numbers, not burst queue-wait.
    arrival_s: Optional[float] = None


@dataclass
class Result:
    request_id: int
    tokens: np.ndarray           # (Q, num_generated) generated ids
    finish_reason: str = "eos"   # "eos" | "length" | "capacity"
    ttft_s: Optional[float] = None   # arrival -> first-token readback
    #   (arrival = run start when the request carries no arrival_s)


def _slice_dim(buf, slot, axis):
    from libra_tpu.quantization import QuantizedArray
    if buf is None:
        return None
    if isinstance(buf, QuantizedArray):
        return QuantizedArray(_slice_dim(buf.q, slot, axis),
                              _slice_dim(buf.scale, slot, axis))
    return jax.lax.dynamic_slice_in_dim(buf, slot, 1, axis=axis)


def _put_dim(buf, new, slot, axis):
    from libra_tpu.quantization import QuantizedArray
    if buf is None:
        return None
    if isinstance(buf, QuantizedArray):
        return QuantizedArray(_put_dim(buf.q, new.q, slot, axis),
                              _put_dim(buf.scale, new.scale, slot, axis))
    return jax.lax.dynamic_update_slice_in_dim(buf, new, slot, axis=axis)


def _slot_cache(cache: M.KVCache, slot) -> M.KVCache:
    """B=1 view of one slot, with its index RESET to 0 (a new request owns
    the row's timeline from the start)."""
    return M.KVCache(
        k=_slice_dim(cache.k, slot, 1), v=_slice_dim(cache.v, slot, 1),
        kb=_slice_dim(cache.kb, slot, 1), vb=_slice_dim(cache.vb, slot, 1),
        flag=_slice_dim(cache.flag, slot, 0),
        index=jnp.zeros((1,), jnp.int32))


def _merge_slot(cache: M.KVCache, piece: M.KVCache, slot) -> M.KVCache:
    return M.KVCache(
        k=_put_dim(cache.k, piece.k, slot, 1),
        v=_put_dim(cache.v, piece.v, slot, 1),
        kb=_put_dim(cache.kb, piece.kb, slot, 1),
        vb=_put_dim(cache.vb, piece.vb, slot, 1),
        flag=_put_dim(cache.flag, piece.flag, slot, 0),
        index=jax.lax.dynamic_update_slice(cache.index, piece.index, (slot,)))


def _slot_cache_many(cache: M.KVCache, slots, k: int) -> M.KVCache:
    """B=k view of k slots (slots: traced (k,) indices), indices reset to 0.
    k is STATIC: the gather is k chained one-row dynamic slices."""
    parts = [_slot_cache(cache, slots[i]) for i in range(k)]

    def cat(get, axis):
        if get(parts[0]) is None:
            return None
        from libra_tpu.quantization import QuantizedArray
        if isinstance(get(parts[0]), QuantizedArray):
            return QuantizedArray(
                jnp.concatenate([get(p).q for p in parts], axis=axis),
                jnp.concatenate([get(p).scale for p in parts], axis=axis))
        return jnp.concatenate([get(p) for p in parts], axis=axis)

    return M.KVCache(
        k=cat(lambda c: c.k, 1), v=cat(lambda c: c.v, 1),
        kb=cat(lambda c: c.kb, 1), vb=cat(lambda c: c.vb, 1),
        flag=cat(lambda c: c.flag, 0), index=jnp.zeros((k,), jnp.int32))


def _merge_slot_many(cache: M.KVCache, piece: M.KVCache, slots,
                     k: int) -> M.KVCache:
    """Scatter the k rows of a B=k piece back to their slots (chained
    static one-row updates -- a vmapped write would transpose the pool)."""
    for i in range(k):
        one = M.KVCache(
            k=_slice_dim(piece.k, i, 1), v=_slice_dim(piece.v, i, 1),
            kb=_slice_dim(piece.kb, i, 1), vb=_slice_dim(piece.vb, i, 1),
            flag=_slice_dim(piece.flag, i, 0),
            index=jax.lax.dynamic_slice(piece.index, (i,), (1,)))
        cache = _merge_slot(cache, one, slots[i])
    return cache


class ServingEngine:
    """Lockstep continuous batching over a recycling slot pool.

    >>> eng = ServingEngine(params, cfg, max_batch=4, max_len=2048)
    >>> results = eng.run([Request(...), ...])     # any number of requests
    """

    def __init__(self, params, cfg: LibraConfig, max_batch: int = 4,
                 max_len: int = 2048,
                 gen: Optional[GenerationConfig] = None, mesh=None,
                 prompt_bucket: int = 0, decode_chunk: int = 8,
                 vq_params=None, vq_cfg=None,
                 merged_prefill: Optional[bool] = None,
                 merged_chunk: int = 64,
                 max_prefill_group: Optional[int] = None):
        """prompt_bucket > 1 rounds prompt lengths up to a multiple (left-
        padding inside the slot) so the per-prompt-length prefill compile
        cache stays bounded at S/prompt_bucket programs instead of one per
        exact length (a serving footgun flagged in VERDICT r1).
        decode_chunk: decode steps fused into one dispatch (lax.scan).
        vq_params/vq_cfg enable raw-pixels requests (fused encode).
        merged_prefill: None = auto (on when spec decode / 2D modes are
        off and the cache can hold a merged_chunk margin); True forces
        (raising if unsupported); False disables. merged_chunk: prompt
        tokens consumed per merged iteration (C; see module docstring).
        max_prefill_group caps the grouped-refill batch (a k=8 full-scale
        prompt program can crash the remote TPU compiler; k<=4 compiles)."""
        self.cfg = cfg
        self.gen = gen or GenerationConfig()
        self.mesh = mesh
        self.prompt_bucket = prompt_bucket
        self.decode_chunk = max(1, decode_chunk)
        self._cache_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from libra_tpu.parallel.sharding import (cache_shardings,
                                                     shard_params)
            params = shard_params(mesh, params)
            self._cache_sh = cache_shardings(mesh, cfg,
                                             quantized=self.gen.kv_quant)
            if vq_params is not None:
                vq_params = jax.device_put(
                    vq_params, NamedSharding(mesh, PartitionSpec()))
        else:
            params = jax.device_put(params)
            if vq_params is not None:
                vq_params = jax.device_put(vq_params)
        self.params = params
        if (vq_params is None) != (vq_cfg is None):
            raise ValueError("vq_params and vq_cfg must be given together "
                             "(raw-pixels prefill needs both)")
        self.vq_params = vq_params
        self.vq_cfg = vq_cfg
        # resolve "auto" once: the prompt pass runs the fused flash
        # bridged-attention kernel on TPU, exactly as generation._prefill
        self._attn_impl = self.gen.attn_impl
        if self._attn_impl == "auto":
            self._attn_impl = ("pallas"
                               if jax.default_backend() not in ("cpu",)
                               else "xla")
        self.B = max_batch
        # quantized caches round up to 128 so the fused int8 decode-
        # attention kernel (the default quantized decode path) always
        # has its S alignment; capacity only grows
        self.S = -(-max_len // 128) * 128 if self.gen.kv_quant else max_len
        self._prefill_fns: Dict[Any, Any] = {}
        # grouped-refill sizes: powers of two up to max_batch (optionally
        # capped), so the per-bucket prefill compile cache stays at
        # log2(B)+1 programs
        self._group_sizes = [1]
        cap = min(max_batch, max_prefill_group or max_batch)
        while self._group_sizes[-1] * 2 <= cap:
            self._group_sizes.append(self._group_sizes[-1] * 2)
        self._decode_fns: Dict[bool, Any] = {}   # keyed on lang_only
        # speculative decoding (gen.spec_decode = gamma > 0): the decode
        # chunk becomes a scan of draft+verify iterations emitting up to
        # gamma+1 tokens per slot per step -- same restrictions as the
        # Generator (greedy, text-resolved streams)
        self._gamma = int(self.gen.spec_decode or 0)
        if self._gamma:
            if self.gen.do_sample:
                raise ValueError("spec_decode requires greedy decoding")
            if self.gen.decode_modality == "dual":
                raise ValueError(
                    "spec_decode is text-mode only (decode_modality "
                    "'text' or 'auto' over an all-text stream)")
        self._spec_fn = None
        self._is_2d = cfg.vision_prediction_mode == "2d"
        self._Rb = max(cfg.image_feature_resolution - 1, 1)
        # merged chunked prefill (module docstring). Np: the prompt-buffer
        # width -- the largest C-multiple an installed request can carry
        # while leaving >= 1 decode slot inside its own C-1 margin.
        self._C = int(merged_chunk)
        self._Np = max(0, (self.S - self._C) // self._C * self._C)
        # merged dispatch length: when every merged-eligible prompt is
        # exactly one bucket (bucket % C == 0), an install takes exactly
        # bucket/C iterations and installs only start at dispatch
        # boundaries -- sizing the merged scan to bucket/C makes installs
        # complete precisely at dispatch end, eliminating "park"
        # iterations (each costs ~2x a plain decode iteration: the packed
        # body streams the dual-path weights; measured r4 33 vs 17
        # ms/iter at full-32). Longer prompts (multi-bucket) simply take
        # several merged dispatches. _Km is the largest DIVISOR of
        # bucket/C that fits decode_chunk (ADVICE r4 item 1: a plain
        # min() left the tail dispatch of a multi-dispatch install parked
        # for its remainder iterations, each ~2x plain-decode cost) --
        # installs always complete exactly at a dispatch boundary.
        if self.prompt_bucket > 1 and self.prompt_bucket % self._C == 0:
            n_iters = self.prompt_bucket // self._C
            self._Km = max(
                d for d in range(1, min(self.decode_chunk, n_iters) + 1)
                if n_iters % d == 0)
        else:
            self._Km = self.decode_chunk
        supported = (self._gamma == 0 and not self._is_2d
                     and not cfg.use_2d_rope and self._Np >= self._C)
        if merged_prefill is None:
            self._merged_on = supported
        elif merged_prefill:
            if not supported:
                raise ValueError(
                    "merged_prefill needs spec_decode == 0, 1d prediction, "
                    "1d RoPE and max_len >= 2 * merged_chunk")
            self._merged_on = True
        else:
            self._merged_on = False
        self._merged_fn = None
        self._install_fns: Dict[int, Any] = {}
        self.stats = {"merged_installs": 0, "merged_chunks": 0,
                      "dedicated_prefills": 0}
        # the Pallas int8 kernel is opaque to GSPMD: under a TP mesh the
        # sharded weights must stay on the XLA path
        from libra_tpu.ops.qlinear import kernel_enabled
        self._qk_ctx = lambda: kernel_enabled(mesh is None)

    def _init_cache(self) -> M.KVCache:
        cache = M.init_cache(self.cfg, self.B, self.S,
                             quantized=self.gen.kv_quant)
        cache = cache._replace(index=jnp.zeros((self.B,), jnp.int32))
        if self._cache_sh is not None:
            # pin the pooled KV layout head-sharded over "model" (ICI);
            # the per-slot index vector replicates (P() covers (B,))
            cache = jax.device_put(cache, self._cache_sh)
        return cache

    # -- compiled pieces ----------------------------------------------------

    def _prefill(self, N: int, has_pixels: bool = False, k: int = 1):
        """One compiled prefill per (prompt-length bucket, pixels?, group
        size k): k same-bucket requests' prompt forward as ONE B=k program,
        written back at their k slots' positions [0, N). Grouped refills
        amortize the per-request prefill latency (the prompt pass is
        compute-bound, so B=k costs far less than k dispatches) -- group
        sizes are restricted to powers of two (self._group_sizes) to bound
        the compile cache. `pmask` carries each request's real extent
        (zeros on the left bucket padding). With pixels, the CLIP+VQGAN
        encode runs inside this program and its ids/signal are scattered
        over the placeholder blocks at `img_start`. Slot-side state
        (logits/vi/pos/hist rows) updates ON DEVICE: the host's previous
        4-per-refill eager `.at[]` updates were 4 extra ~27 ms dispatches
        through the remote-TPU tunnel."""
        key = (N, has_pixels, k)
        if key not in self._prefill_fns:
            cfg = self.cfg

            def f(params, cache, mask_buf, logits_buf, vi_buf, pos_buf,
                  hist_buf, hist_ids, reqs, slots, vq_params=None):
                # reqs: tuple of k per-request dicts, PRE-STAGED on device
                # at enqueue time (async device_put overlapping the decode
                # chunks) -- stacking happens inside the program, so the
                # refill dispatch never waits on host->device staging
                ids = jnp.stack([r["ids"] for r in reqs], axis=1)
                vi = jnp.stack([r["vi"] for r in reqs])
                pmask = jnp.stack([r["pm"] for r in reqs])
                img_start = None
                if has_pixels:
                    from libra_tpu.training.fused import (
                        _scatter_block, encode_images_to_tokens)
                    pixels = jnp.stack([r["px"] for r in reqs])
                    img_start = jnp.stack([r["st"] for r in reqs])
                    img_ids, img_sig = encode_images_to_tokens(
                        vq_params, self.vq_cfg, cfg, pixels)
                    ids = jax.vmap(jax.vmap(_scatter_block,
                                            in_axes=(0, 0, 0)),
                                   in_axes=(0, 0, None))(ids, img_ids,
                                                         img_start)
                    sig = jax.vmap(_scatter_block)(
                        jnp.zeros((k, N, img_sig.shape[-1]), img_sig.dtype),
                        img_sig, img_start)
                else:
                    sig = jnp.stack([r["sig"] for r in reqs])
                piece = _slot_cache_many(cache, slots, k)
                S = piece.flag.shape[1]
                row = jnp.zeros((k, S), jnp.int32).at[:, :N].set(pmask)
                if cfg.use_2d_rope:
                    pos = M.get_2d_position_ids(cfg, vi, pmask)
                    offset_tab = M.make_2d_pos_offset(cfg)
                    base_last = (pos[:, 0, -1]
                                 - offset_tab[jnp.clip(
                                     vi[:, -1], 0,
                                     cfg.max_vision_token_length)][:, 0])
                else:
                    pos = M.position_ids_from_mask(pmask)
                    base_last = pos[:, -1]
                text_span = None
                if (has_pixels and self.gen.split_prefill
                        and not cfg.addition_mode):
                    # raw-pixels rows carry one full image block: run the
                    # full-rank language projections on the static-width
                    # text rows only (exact; see generation.py)
                    text_span = M.text_span_maps(cfg, img_start, N)
                from libra_tpu.ops.qlinear import a8_enabled
                with a8_enabled(self.gen.a8_prefill):
                    # w8a8 on the compute-bound prompt pass only (decode
                    # keeps exact weight-only dequant), as in generation.py
                    out = M.forward(params, cfg, ids, row,
                                    vi, sig, position_ids=pos, cache=piece,
                                    attn_impl=self._attn_impl,
                                    text_span=text_span)
                flag_last = vi[:, -1] < cfg.max_vision_token_length
                if self._is_2d:
                    h = out.hidden_states
                    if h.shape[1] < self._Rb:
                        # sub-(R-1) prompts: left-pad the hidden ring with
                        # zeros (ADVICE r2 finding 3); a real image block
                        # is always >= R-1 tokens, so padded rows are only
                        # read in degenerate prompts
                        h = jnp.pad(h, ((0, 0), (self._Rb - h.shape[1], 0),
                                        (0, 0)))
                    h_rows = h[:, -self._Rb:]
                    idx = max(h.shape[1] - 1 - self._Rb, 0)
                    h_up = h[:, idx]
                else:
                    h_rows = jnp.zeros(
                        (k, self._Rb, out.hidden_states.shape[-1]),
                        out.hidden_states.dtype)
                    h_up = h_rows[:, 0]
                logits = _last_position_logits(
                    params, cfg, out.hidden_states, flag_last, vi[:, -1],
                    h_up=h_up)
                dus = jax.lax.dynamic_update_slice
                for i in range(k):
                    s_i = slots[i]
                    mask_buf = jax.lax.dynamic_update_slice_in_dim(
                        mask_buf, row[i:i + 1], s_i, axis=0)
                    logits_buf = dus(
                        logits_buf, logits[:, i:i + 1].astype(
                            logits_buf.dtype), (0, s_i, 0))
                    vi_buf = dus(vi_buf,
                                 vi[i:i + 1, -1].astype(vi_buf.dtype), (s_i,))
                    pos_buf = dus(pos_buf,
                                  base_last[i:i + 1].astype(pos_buf.dtype),
                                  (s_i,))
                    hist_buf = jax.lax.dynamic_update_slice_in_dim(
                        hist_buf, h_rows[i:i + 1].astype(hist_buf.dtype),
                        s_i, axis=0)
                    # codebook-0 token history row (spec-decode drafting;
                    # bucket-padding slots carry mask 0 => never drafted)
                    hist_ids = dus(hist_ids,
                                   ids[0, i:i + 1].astype(hist_ids.dtype),
                                   (s_i, 0))
                cache = _merge_slot_many(cache, out.cache, slots, k)
                return (cache, mask_buf, logits_buf, vi_buf, pos_buf,
                        hist_buf, hist_ids)

            # donate every carried buffer: prefill updates the ~1.6 GB
            # pooled cache and the slot-state rows in place
            self._prefill_fns[key] = jax.jit(
                f, donate_argnums=(1, 2, 3, 4, 5, 6, 7))
        return self._prefill_fns[key]

    def _decode(self, lang_only: bool):
        """`decode_chunk` lockstep single-token steps in one dispatch
        (lax.scan). Per-slot cache indices advance independently; inactive
        slots compute garbage that the host ignores (their stale cache
        rows are never attended after refill). Per-slot budgets decrement
        on device so active-flag transitions are reproducible host-side
        from the returned (tokens, actives) alone.

        `lang_only` selects the text-only decode body (run() resolves it:
        explicit decode_modality='text', or 'auto' with every request in
        the stream ending in text)."""
        if lang_only not in self._decode_fns:
            cfg, gen = self.cfg, self.gen
            K = self.decode_chunk

            def step(params, carry):
                (cache, mask_buf, last_logits, vi_last, pos_last, active,
                 budget, hist, rng) = carry
                rng, step_rng = jax.random.split(rng)
                tok = sample_tokens(last_logits, gen, step_rng)   # (Q, B)
                tok = jnp.where(active[None], tok, gen.pad_token_id)
                eos_hit = jnp.any(tok == gen.eos_token_id, axis=0) & active
                budget = budget - active.astype(budget.dtype)
                active_next = active & ~eos_hit & (budget > 0)
                mask_buf = M._write_seq(
                    mask_buf, active[:, None].astype(mask_buf.dtype),
                    cache.index)
                logits, cache, vi_new, pos_new, new_hist = decode_micro_step(
                    params, cfg, tok, mask_buf, cache, vi_last, pos_last,
                    active=active, hist=hist, is_2d=self._is_2d,
                    lang_only=lang_only)
                carry = (cache, mask_buf, logits, vi_new, pos_new,
                         active_next, budget, new_hist, rng)
                return carry, (tok, active)

            import functools

            def f(params, cache, mask_buf, last_logits, vi_last, pos_last,
                  active, budget, hist, rng):
                carry = (cache, mask_buf, last_logits, vi_last, pos_last,
                         active, budget, hist, rng)
                body = functools.partial(step, params)
                carry, (toks, acts) = jax.lax.scan(
                    lambda c, _: body(c), carry, None, length=K)
                (cache, mask_buf, logits, vi_last, pos_last, active,
                 budget, hist, _) = carry
                return (toks, acts, cache, mask_buf, logits, vi_last,
                        pos_last, hist)

            # donate every carried buffer (cache, mask, logits, vi, pos,
            # hist): the chunk updates them in place across dispatches --
            # without donation each chunk copied the full cache pool
            self._decode_fns[lang_only] = jax.jit(
                f, donate_argnums=(1, 2, 3, 4, 5, 8))
        return self._decode_fns[lang_only]

    def _spec_decode(self):
        """Speculative decode chunk: `decode_chunk` draft+verify iterations
        in one dispatch. Each iteration, per slot: the PENDING token (the
        greedy argmax of the carried logits -- already known, K/V not yet
        cached) is emitted, gamma bigram prompt-lookup drafts are guessed
        from the slot's own token history (spec_decode._bigram_drafts),
        and ONE (gamma+1)-token cached forward verifies them -- the
        accepted prefix is emitted too, so every iteration emits 1..K
        tokens per active slot at ~one token's weight traffic (decode is
        weights-bound at pool sizes; see libra_tpu/spec_decode.py).
        Exactness: every emitted token is the target model's own greedy
        argmax (parity with the standard engine is tested token-for-token).

        Differences vs spec_decode._spec_generate_impl: the bonus token is
        NOT emitted in the iteration that computes it -- it becomes the
        next iteration's pending (the carried logits row selects it), so
        slot refills need no special casing. Inactive slots run the verify
        on garbage confined to their own cache rows (cnt=0 restores their
        mask window to zeros), exactly like the standard chunk."""
        if self._spec_fn is None:
            from libra_tpu.spec_decode import _bigram_drafts, _update_window
            cfg, gen = self.cfg, self.gen
            gamma, K = self._gamma, self._gamma + 1
            Mv = cfg.max_vision_token_length
            Q = cfg.vision_codebook_num
            offset_tab = (M.make_2d_pos_offset(cfg) if cfg.use_2d_rope
                          else None)

            def step(params, carry):
                (cache, mask_buf, hist_ids, last_logits, pos_last, active,
                 budget) = carry
                B = mask_buf.shape[0]
                P = cache.index                                   # (B,)
                pending = jnp.argmax(last_logits[0], axis=-1).astype(
                    hist_ids.dtype)                               # (B,)
                pending = jnp.where(active, pending, gen.pad_token_id)
                # stage pending at slot P for the bigram matcher
                hist_ids = jax.vmap(_update_window,
                                    in_axes=(0, 0, 0, 0))(
                    hist_ids, pending[:, None], P, active[:, None])
                idx = jnp.arange(hist_ids.shape[1])
                valid = (mask_buf > 0) | (idx[None] == P[:, None])
                drafts = _bigram_drafts(hist_ids, valid, P, pending, gamma)
                x = jnp.concatenate([pending[:, None], drafts], axis=1)

                # one (gamma+1)-token verify forward at per-row windows
                all_w = jnp.ones((K,), bool)
                mask_v = jax.vmap(_update_window,
                                  in_axes=(0, None, 0, None))(
                    mask_buf, jnp.ones((K,), mask_buf.dtype), P, all_w)
                pos_new = pos_last[:, None] + 1 + jnp.arange(K)[None]
                if cfg.use_2d_rope:
                    pos_ids = (pos_new[:, None, :]
                               + offset_tab[Mv][None, :, None])
                else:
                    pos_ids = pos_new
                vi_blk = jnp.full((B, K), Mv, jnp.int32)
                ids_blk = jnp.broadcast_to(x[None], (Q, B, K))
                out = M.forward(params, cfg, ids_blk, mask_v, vi_blk, None,
                                position_ids=pos_ids, cache=cache,
                                lang_only=True)
                tl = M.compute_text_logits(params, out.hidden_states)
                c = jnp.argmax(tl, axis=-1).astype(x.dtype)       # (B, K)

                # accepted draft prefix; emitted block = pending + accepts
                ok = drafts == c[:, :gamma]
                a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1),
                            axis=1)
                ar = jnp.arange(K)[None]
                eos_in = (x == gen.eos_token_id) & (ar <= a[:, None])
                any_eos = jnp.any(eos_in, axis=1)
                first_eos = jnp.argmax(eos_in, axis=1)
                cnt = jnp.where(any_eos, first_eos + 1, a + 1)
                cnt = jnp.minimum(cnt, budget)
                cnt = jnp.where(active, cnt, 0)
                budget = budget - cnt
                active = active & ~(any_eos & (first_eos < cnt)) \
                    & (budget > 0)

                # persist emitted tokens + keep exactly cnt cached slots
                hist_ids = jax.vmap(_update_window,
                                    in_axes=(0, 0, 0, 0))(
                    hist_ids, x, P, ar < cnt[:, None])
                mask_buf = jax.vmap(_update_window,
                                    in_axes=(0, 0, 0, None))(
                    mask_v, (ar < cnt[:, None]).astype(mask_buf.dtype),
                    P, all_w)
                cache = out.cache._replace(index=P + cnt)
                pos_last = pos_last + cnt

                # next pending rides the carried logits: the verify output
                # at the last kept position predicts the token after the
                # accepted prefix (the bonus when nothing truncated)
                h_sel = jnp.take_along_axis(
                    out.hidden_states,
                    jnp.maximum(cnt - 1, 0)[:, None, None], axis=1)
                last_logits = _last_position_logits(
                    params, cfg, h_sel,
                    jnp.zeros((B,), bool),           # vision flag: text rows
                    jnp.full((B,), Mv, jnp.int32), lang_only=True)
                carry = (cache, mask_buf, hist_ids, last_logits, pos_last,
                         active, budget)
                return carry, (x, cnt)

            import functools

            def f(params, cache, mask_buf, hist_ids, last_logits, pos_last,
                  active, budget):
                carry = (cache, mask_buf, hist_ids, last_logits, pos_last,
                         active, budget)
                body = functools.partial(step, params)
                carry, (toks, cnts) = jax.lax.scan(
                    lambda c, _: body(c), carry, None,
                    length=self.decode_chunk)
                (cache, mask_buf, hist_ids, logits, pos_last, active,
                 budget) = carry
                return (toks, cnts, cache, mask_buf, hist_ids,
                        logits, pos_last)

            self._spec_fn = jax.jit(f, donate_argnums=(1, 2, 3, 4, 5))
        return self._spec_fn

    def _install(self, Nb: int):
        """One compiled install per prompt bucket: write one staged request
        into the per-slot device prompt buffers (row `slot` of pids/pvi/
        ppm/ppos/psig), zero the slot's attention-mask row and reset its
        cache index -- a handful of small writes, one ~free dispatch, vs a
        full dedicated prompt pass. The prompt is then consumed C tokens
        per merged iteration while the other slots keep decoding."""
        if Nb not in self._install_fns:
            def f(cache, mask_buf, pids, pvi, ppm, ppos, psig, req, slot):
                z = jnp.zeros((1, mask_buf.shape[1]), mask_buf.dtype)
                mask_buf = jax.lax.dynamic_update_slice_in_dim(
                    mask_buf, z, slot, axis=0)
                index = jax.lax.dynamic_update_slice(
                    cache.index, jnp.zeros((1,), cache.index.dtype), (slot,))
                dus = jax.lax.dynamic_update_slice
                pids = dus(pids, req["ids"][:, None].astype(pids.dtype),
                           (0, slot, 0))
                pvi = dus(pvi, req["vi"][None].astype(pvi.dtype), (slot, 0))
                ppm = dus(ppm, req["pm"][None].astype(ppm.dtype), (slot, 0))
                ppos = dus(ppos, req["pos"][None].astype(ppos.dtype),
                           (slot, 0))
                psig = dus(psig, req["sig"][None].astype(psig.dtype),
                           (slot, 0, 0))
                return (cache._replace(index=index), mask_buf, pids, pvi,
                        ppm, ppos, psig)

            self._install_fns[Nb] = jax.jit(
                f, donate_argnums=(0, 1, 2, 3, 4, 5, 6))
        return self._install_fns[Nb]

    def _merged(self):
        """Merged chunked-prefill decode chunk, TOKEN-PACKED: each of
        `decode_chunk` iterations runs ONE forward over a flat packed
        token axis of T = B + C positions -- the B decode tokens (one per
        slot, column b belongs to cache row b) followed by the next C
        prompt tokens of ONE prefilling slot. Every dense op (embeds,
        projections, norms, MLP) is token-pointwise, so the prompt chunk
        adds only C real positions of FLOPs to the weight stream the
        decode tokens already pay for (a (B, C)-dense layout would pay
        B*C positions -- 4x garbage at B=4 -- which costs MORE than the
        dedicated-prefill stall it removes; measured cost model in
        docs/serving.md). Attention splits the packed axis back into its
        two native shapes: the decode segment is EXACTLY the classic
        Nq=1-per-row step (same fused int8 kernel call), and the chunk
        segment attends its own row's cache slice at Nq=C.

        One prefilling slot advances per iteration (FIFO by slot index);
        queued installs wait their turn, and iterations after the last
        chunk "park" the segment on the just-finished row at its prompt
        end, where the junk K/V is overwritten by that row's own decode
        writes before any mask bit turns 1 (mask/flag parking writes are
        value-masked outright).

        A prefilling row's final chunk leaves its prompt-end logits in
        the carried last_logits, flips it to decoding ON DEVICE, and it
        samples its first token the very next iteration -- no dedicated
        prefill dispatch, no stall of the other slots. Exactness: see the
        module docstring (chunked prefill computes bitwise the wide pass);
        decode tokens run the full dual-path body, value-identical to the
        lang-only body on text rows (models.libra.forward docstring).
        Layer-body math mirrors models.libra.decoder_layer/_attention --
        that file is canonical; parity tests pin this copy to it."""
        if self._merged_fn is None:
            import functools

            from libra_tpu.ops.attention import (AttentionInputs, BIG_NEG,
                                                 bridged_attention)
            from libra_tpu.ops.norm import rms_norm
            from libra_tpu.ops.pallas import decode_attention as DA
            from libra_tpu.ops.rope import apply_rope, rope_cos_sin
            from libra_tpu.ops.routed import (routed_linear, routed_low_rank,
                                              select_by_flag)
            from libra_tpu.quantization import (LayerView, QuantizedArray)

            cfg, gen = self.cfg, self.gen
            B, C, K = self.B, self._C, self._Km
            T = B + C
            Mv = cfg.max_vision_token_length
            Q = cfg.vision_codebook_num
            H = cfg.num_attention_heads
            D = cfg.hidden_size
            eps = cfg.rms_norm_eps
            am = cfg.addition_mode

            def take_layer(layers, idx):
                # models.libra.forward::take_layer (stacked-params pick)
                def pick(leaf):
                    if isinstance(leaf, QuantizedArray):
                        return LayerView(leaf, idx)
                    return leaf[idx]
                return jax.tree_util.tree_map(
                    pick, layers,
                    is_leaf=lambda x: isinstance(x, QuantizedArray))

            def packed_layer(p, bufs, li, h, flag, cos, sin, pos, P_dec,
                             pf_slot, off_w, has_pf, kv_flag, bias_dec,
                             bias_ch):
                # h (1, T, D); decode tokens [0, B), chunk tokens [B, T)
                def rnorm(x, name):
                    return select_by_flag(
                        flag, rms_norm(x, p["vision_" + name], eps),
                        rms_norm(x, p[name], eps))

                hn = rnorm(h, "input_layernorm")
                a = p["attn"]

                def rproj(name):
                    vp = a["vision_" + name[0]]
                    return routed_linear(hn, flag, a[name], vp["wa"],
                                         vp["wb"], am)

                q = M._split_heads(rproj("q_proj"), H)
                k = M._split_heads(rproj("k_proj"), H)
                v = M._split_heads(rproj("v_proj"), H)
                q = apply_rope(q, cos, sin, pos)
                k = apply_rope(k, cos, sin, pos)
                kb = vb = None
                if cfg.use_bridge:
                    kb = M._split_heads(routed_low_rank(
                        hn, flag, a["k_bridge_lang"]["wa"],
                        a["k_bridge_lang"]["wb"], a["k_bridge_vis"]["wa"],
                        a["k_bridge_vis"]["wb"]), H)
                    vb = M._split_heads(routed_low_rank(
                        hn, flag, a["v_bridge_lang"]["wa"],
                        a["v_bridge_lang"]["wb"], a["v_bridge_vis"]["wa"],
                        a["v_bridge_vis"]["wb"]), H)
                    kb = apply_rope(kb, cos, sin, pos)

                def seg(x):   # (1, T, H, d) -> (B, 1, H, d), (1, C, H, d)
                    return x[0, :B][:, None], x[:, B:]

                def wr(buf, x):
                    d_, c_ = seg(x)
                    out = M._write_cache(buf, d_, li, P_dec)
                    # value-masked when parked: the park window overlaps
                    # the just-finished row's decode territory, and the
                    # decode-token write above must survive
                    return M._write_cache_row(out, c_, li, pf_slot, off_w,
                                              write=has_pf)

                q_dec, q_ch = seg(q)
                new_bufs = {"k": wr(bufs["k"], k), "v": wr(bufs["v"], v)}
                if cfg.use_bridge:
                    new_bufs["kb"] = wr(bufs["kb"], kb)
                    new_bufs["vb"] = wr(bufs["vb"], vb)
                ck, cv = new_bufs["k"], new_bufs["v"]
                ckb, cvb = new_bufs.get("kb"), new_bufs.get("vb")
                flag_dec = flag[0, :B]
                flag_ch = flag[:, B:]

                # ---- decode segment: EXACTLY the classic Nq=1 step ----
                if (DA.decode_kernel_active()
                        and DA.decode_kernel_applicable(cfg, ck, 1)):
                    dec_out = DA.int8_decode_attention(
                        q_dec, ck.q, ck.scale, cv.q, cv.scale,
                        kbq=None if ckb is None else ckb.q,
                        kbs=None if ckb is None else ckb.scale,
                        vbq=None if cvb is None else cvb.q,
                        vbs=None if cvb is None else cvb.scale,
                        flag_q=flag_dec, kv_flag=kv_flag,
                        bias=bias_dec, layer_idx=li, interpret=DA.INTERPRET)
                else:
                    def rd(buf):
                        # models.libra._attention::rd (dequant-materialise)
                        if isinstance(buf, QuantizedArray):
                            qs = jax.lax.dynamic_index_in_dim(
                                buf.q, li, 0, keepdims=False)
                            ss = jax.lax.dynamic_index_in_dim(
                                buf.scale, li, 0, keepdims=False)
                            deq = qs.astype(q.dtype) * ss.astype(
                                q.dtype)[..., None]
                            return jax.lax.optimization_barrier(
                                deq).transpose(0, 2, 1, 3)
                        return jax.lax.dynamic_index_in_dim(
                            buf, li, 0, keepdims=False)

                    kf, vf = rd(ck), rd(cv)
                    kbf = vbf = None
                    if cfg.use_bridge:
                        kbf, vbf = rd(ckb), rd(cvb)
                    dec_out = bridged_attention(
                        AttentionInputs(q_dec, kf, vf, kbf, vbf),
                        flag_dec[:, None], kv_flag, bias_dec[:, None])

                # ---- chunk segment: Nq=C against its own cache row ----
                def rdrow(buf):
                    if buf is None:
                        return None
                    if isinstance(buf, QuantizedArray):
                        qs = jax.lax.dynamic_index_in_dim(
                            buf.q, li, 0, keepdims=False)
                        qs = jax.lax.dynamic_index_in_dim(
                            qs, pf_slot, 0, keepdims=True)   # (1, H, S, d)
                        ss = jax.lax.dynamic_index_in_dim(
                            buf.scale, li, 0, keepdims=False)
                        ss = jax.lax.dynamic_index_in_dim(
                            ss, pf_slot, 0, keepdims=True)
                        deq = qs.astype(q.dtype) * ss.astype(
                            q.dtype)[..., None]
                        return jax.lax.optimization_barrier(
                            deq).transpose(0, 2, 1, 3)       # (1, S, H, d)
                    x = jax.lax.dynamic_index_in_dim(buf, li, 0,
                                                     keepdims=False)
                    return jax.lax.dynamic_index_in_dim(x, pf_slot, 0,
                                                        keepdims=True)

                kvf_row = jax.lax.dynamic_index_in_dim(kv_flag, pf_slot, 0,
                                                       keepdims=True)
                ch_out = bridged_attention(
                    AttentionInputs(q_ch, rdrow(ck), rdrow(cv),
                                    rdrow(ckb), rdrow(cvb)),
                    flag_ch, kvf_row, bias_ch)

                attn = jnp.concatenate([dec_out[:, 0][None], ch_out],
                                       axis=1).reshape(1, T, D)
                vo = a["vision_o"]
                attn = routed_linear(attn, flag, a["o_proj"], vo["wa"],
                                     vo["wb"], am)
                h = h + attn
                hn2 = rnorm(h, "post_attention_layernorm")
                h = h + M._mlp(p, cfg, hn2, flag)
                return h, new_bufs

            def step(params, pids, pvi, ppm, ppos, psig, pf_len, pf_budget,
                     carry):
                (cache, mask_buf, last_logits, vi_last, pos_last, active,
                 budget, pf, pf_off_v, pf_slot_c, park_off, rng) = carry
                S = mask_buf.shape[1]
                has_pf = jnp.any(pf)
                pf_slot = jnp.where(has_pf, jnp.argmax(pf), pf_slot_c)
                off = jnp.take(pf_off_v, pf_slot)
                plen = jnp.take(pf_len, pf_slot)
                # park on the just-finished row at its prompt end: junk
                # K/V there is overwritten by that row's own decode write
                # at each position before its mask bit turns 1
                off_w = jnp.where(has_pf, off, park_off)

                # re-anchor prefilling rows at pf_off: classic dispatches
                # advance EVERY row's index (forward's unconditional +N)
                P_dec = jnp.where(pf, pf_off_v, cache.index)      # (B,)

                rng, step_rng = jax.random.split(rng)
                tok = sample_tokens(last_logits, gen, step_rng)   # (Q, B)
                tok = jnp.where(active[None], tok, gen.pad_token_id)
                eos_hit = jnp.any(tok == gen.eos_token_id, axis=0) & active
                vi_dec = jnp.where(active, jnp.minimum(vi_last + 1, Mv),
                                   vi_last)
                pos_dec = jnp.where(active, pos_last + 1, pos_last)

                ch_ids = jax.lax.dynamic_slice(
                    pids, (0, pf_slot, off_w), (Q, 1, C))[:, 0]   # (Q, C)
                ch_vi = jax.lax.dynamic_slice(
                    pvi, (pf_slot, off_w), (1, C))[0]
                ch_pm = jax.lax.dynamic_slice(
                    ppm, (pf_slot, off_w), (1, C))[0]
                ch_pos = jax.lax.dynamic_slice(
                    ppos, (pf_slot, off_w), (1, C))[0]
                ch_sig = jax.lax.dynamic_slice(
                    psig, (pf_slot, off_w, 0),
                    (1, C, psig.shape[-1]))[0]

                ids_p = jnp.concatenate(
                    [tok.astype(ch_ids.dtype), ch_ids], axis=1)[:, None]
                vi_p = jnp.concatenate([vi_dec, ch_vi])[None]     # (1, T)
                pos_p = jnp.concatenate([pos_dec, ch_pos])[None]
                sig_p = jnp.concatenate(
                    [jnp.zeros((B, psig.shape[-1]), psig.dtype),
                     ch_sig])[None]
                flag_p = vi_p < Mv

                # mask/flag writes: decode columns exactly as the classic
                # chunk; the prompt window value-masked (no-op when parked)
                mask_buf = M._write_seq(
                    mask_buf, active[:, None].astype(mask_buf.dtype), P_dec)
                old_m = jax.lax.dynamic_slice(mask_buf, (pf_slot, off_w),
                                              (1, C))
                mask_buf = jax.lax.dynamic_update_slice(
                    mask_buf, jnp.where(has_pf, ch_pm[None], old_m),
                    (pf_slot, off_w))
                kvf = M._write_seq(cache.flag, (vi_dec < Mv)[:, None],
                                   P_dec)
                old_f = jax.lax.dynamic_slice(kvf, (pf_slot, off_w), (1, C))
                kvf = jax.lax.dynamic_update_slice(
                    kvf, jnp.where(has_pf, (ch_vi < Mv)[None], old_f),
                    (pf_slot, off_w))

                idxS = jnp.arange(S)
                mrows = mask_buf.astype(bool)
                bias_dec = jnp.where(
                    (idxS[None] <= P_dec[:, None]) & mrows,
                    0.0, BIG_NEG).astype(jnp.float32)[:, None]    # (B,1,S)
                m_pf = jax.lax.dynamic_index_in_dim(mrows, pf_slot, 0,
                                                    keepdims=False)
                qs_ch = off_w + jnp.arange(C)
                bias_ch = jnp.where(
                    (idxS[None] <= qs_ch[:, None]) & m_pf[None],
                    0.0, BIG_NEG).astype(jnp.float32)[None, None]  # (1,1,C,S)

                h = M.embed_inputs(params, cfg, ids_p, flag_p, sig_p, vi_p)
                cos, sin = rope_cos_sin(
                    max(cfg.max_position_embeddings, S), cfg.head_dim,
                    cfg.rope_theta)

                bufs0 = {"k": cache.k, "v": cache.v}
                if cfg.use_bridge:
                    bufs0.update({"kb": cache.kb, "vb": cache.vb})

                def body(carry_l, li):
                    h_, bufs = carry_l
                    h_, bufs2 = packed_layer(
                        take_layer(params["layers"], li), bufs, li, h_,
                        flag_p, cos, sin, pos_p, P_dec, pf_slot, off_w,
                        has_pf, kvf, bias_dec, bias_ch)
                    return (h_, dict(bufs, **bufs2)), None

                (h, bufs), _ = jax.lax.scan(
                    body, (h, bufs0), jnp.arange(cfg.num_hidden_layers))
                h = select_by_flag(flag_p,
                                   rms_norm(h, params["vision_norm"], eps),
                                   rms_norm(h, params["norm"], eps))

                logits_dec = _last_position_logits(
                    params, cfg, h[0, :B][:, None], vi_dec < Mv, vi_dec)
                vi_ch_last = ch_vi[-1][None]
                logits_ch = _last_position_logits(
                    params, cfg, h[0, T - 1][None, None],
                    vi_ch_last < Mv, vi_ch_last)

                pf_done = has_pf & (off + C >= plen)
                rowsel = (jnp.arange(B) == pf_slot) & has_pf
                new_last = jnp.where(active[None, :, None],
                                     logits_dec.astype(last_logits.dtype),
                                     last_logits)
                new_last = jnp.where(rowsel[None, :, None],
                                     logits_ch.astype(last_logits.dtype),
                                     new_last)
                vi_last = jnp.where(active, vi_dec, vi_last)
                vi_last = jnp.where(rowsel, ch_vi[-1], vi_last)
                pos_last = jnp.where(active, pos_dec, pos_last)
                pos_last = jnp.where(rowsel, ch_pos[-1], pos_last)

                index = jnp.where(rowsel, off + C,
                                  P_dec + active.astype(P_dec.dtype))
                cache = M.KVCache(k=bufs["k"], v=bufs["v"],
                                  kb=bufs.get("kb"), vb=bufs.get("vb"),
                                  flag=kvf, index=index)

                budget = budget - active.astype(budget.dtype)
                active_next = active & ~eos_hit & (budget > 0)
                pf_off_v = jnp.where(rowsel, off + C, pf_off_v)
                budget = jnp.where(rowsel & pf_done, pf_budget, budget)
                active_next = active_next | (rowsel & pf_done)
                pf = pf & ~(rowsel & pf_done)
                park_off = jnp.where(pf_done, off + C, park_off)
                carry = (cache, mask_buf, new_last, vi_last, pos_last,
                         active_next, budget, pf, pf_off_v, pf_slot,
                         park_off, rng)
                return carry, (tok, active)

            def f(params, cache, mask_buf, last_logits, vi_last, pos_last,
                  pids, pvi, ppm, ppos, psig,
                  active, budget, pf_active, pf_off, pf_len, pf_budget,
                  rng):
                carry = (cache, mask_buf, last_logits, vi_last, pos_last,
                         active, budget, pf_active, pf_off,
                         jnp.argmax(pf_active), jnp.int32(0), rng)
                body = functools.partial(step, params, pids, pvi, ppm,
                                         ppos, psig, pf_len, pf_budget)
                carry, (toks, acts) = jax.lax.scan(
                    lambda c, _: body(c), carry, None, length=K)
                (cache, mask_buf, logits, vi_last, pos_last,
                 *_rest) = carry
                return (toks, acts, cache, mask_buf, logits, vi_last,
                        pos_last)

            # prompt buffers (6..10) are read-only here: installed by
            # _install, sliced per iteration -- NOT donated
            self._merged_fn = jax.jit(f, donate_argnums=(1, 2, 3, 4, 5))
        return self._merged_fn

    def warmup(self, example: Request, max_new: Optional[int] = None):
        """Compile EVERY program the scheduler can dispatch, up front.

        Mid-run compiles are the single worst serving-latency event: a
        full-32 dedicated-prefill program takes ~18 s through the remote
        compiler, and the first open-loop request to reach an idle pool
        pays it head-of-line (measured r4: it alone pushed the Poisson
        p50 TTFT from ~2 s to ~19 s because the whole arrival backlog
        queued behind the compile). This runs `example`-shaped synthetic
        requests through run() in patterns that exercise each program:

          * a 2B-1 staggered burst: the k=B grouped dedicated prefill,
            the merged install + merged chunk programs (slots free one at
            a time while others decode), and the plain decode chunk (and
            the spec draft+verify chunk when gamma > 0);
          * one g-request idle-pool run per SMALLER dedicated group size
            g: open-loop refills land on an idle pool as k=1 (or k=2)
            dedicated prefills, shapes the burst never hits.

        `example` fixes the (prompt bucket, pixels?) program shape --
        call once per shape class the deployment serves. Results are
        discarded; the engine's slot state fully resets per run().
        """
        import copy

        B = self.B
        mn = max_new if max_new is not None else self.decode_chunk

        def mk(n, stagger=False):
            reqs = []
            for i in range(n):
                r = copy.copy(example)
                r.request_id = -1 - i
                r.arrival_s = None
                # staggered budgets must span MULTIPLE decode dispatches:
                # the scheduler only observes completions at dispatch
                # readback (decode_chunk steps), so budgets that all fit
                # one dispatch free every slot at the SAME boundary -- a
                # grouped dedicated refill -- and the merged install +
                # merged chunk programs never compile (measured r5: the
                # first real open-loop run then eats a 10.8 s install
                # compile + a 3.6 s merged compile head-of-line, p50 TTFT
                # 5.9 s at 1.5 rps vs 0.8 s once warm)
                r.max_new_tokens = self.decode_chunk * (i % B + 1) \
                    if stagger else mn
                reqs.append(r)
            return reqs

        self.run(mk(2 * B - 1, stagger=True))
        for g in self._group_sizes:
            if g != B:
                self.run(mk(g))

    # -- host-side scheduler -------------------------------------------------

    def run(self, requests: List[Request],
            on_token=None) -> List[Result]:
        """on_token(request_id, token, finish_reason): streaming callback,
        called from this thread per emitted token. `token` is the (Q,)
        generated ids (None for zero-token capacity rejections);
        `finish_reason` is None mid-stream and "eos"/"length"/"capacity"
        on the request's final event."""
        cfg, gen, B, S = self.cfg, self.gen, self.B, self.S
        Q = cfg.vision_codebook_num
        tails_text = [np.asarray(r.vision_indices)[-1]
                      >= cfg.max_vision_token_length for r in requests]
        if gen.decode_modality == "text":
            for r, ok in zip(requests, tails_text):
                if not ok:
                    raise ValueError(
                        "decode_modality='text' needs prompts ending in "
                        "text; request %r ends inside an image block"
                        % (r.request_id,))
        # 'auto': the whole stream is known at entry -- if every request
        # ends in text, this run's shared decode program can be the exact
        # lang-only body (~half the weight bytes/step)
        lang_only = (gen.decode_modality == "text"
                     or (gen.decode_modality == "auto" and all(tails_text)))
        if self._gamma and not lang_only:
            raise ValueError(
                "spec_decode is text-mode only: this stream carries a "
                "request ending inside an image block")
        # validate up front: raising from inside the scheduling loop would
        # discard every already-completed Result
        for r in requests:
            if r.pixels is None:
                continue
            if self.vq_params is None:
                raise ValueError(
                    "request %r carries pixels but the engine was "
                    "built without vq_params/vq_cfg" % (r.request_id,))
            side = self.vq_cfg.clip.image_size
            if tuple(r.pixels.shape) != (side, side, 3):
                raise ValueError(
                    "request %r pixels shape %r != the engine's CLIP "
                    "input (%d, %d, 3)" % (r.request_id,
                                           tuple(r.pixels.shape),
                                           side, side))
        # stable sort by arrival: ties (and the all-None burst case) keep
        # submission order, so the no-arrivals path is byte-identical
        queue = sorted(requests, key=lambda r: r.arrival_s or 0.0)
        results: List[Result] = []
        # per-run breakdown (host wall per branch + occupancy): dispatches
        # are async, so device time lands on the branch that READS BACK --
        # with LIBRA_SERVE_PROFILE=1 prefill/install branches force a tiny
        # sync readback so their device time is attributed to them.
        import os as _os
        prof_sync = bool(int(_os.environ.get("LIBRA_SERVE_PROFILE", "0")))
        rs = self.last_run_stats = {
            "t_decode": 0.0, "t_merged": 0.0, "t_spec": 0.0,
            "t_prefill": 0.0, "t_install": 0.0, "t_sleep": 0.0,
            "n_decode": 0, "n_merged": 0, "n_spec": 0, "n_prefill": 0,
            "n_install": 0, "tokens": 0, "active_iters": 0, "iters": 0}
        t0 = time.perf_counter()

        def n_arrived():
            """Length of the leading queue prefix visible to the scheduler
            (queue is arrival-sorted, so visibility is a prefix)."""
            now = time.perf_counter() - t0
            n = 0
            for r in queue:
                if r.arrival_s is not None and r.arrival_s > now:
                    break
                n += 1
            return n

        cache = self._init_cache()
        D = cfg.hidden_size
        mask_buf = jnp.zeros((B, S), jnp.int32)
        logits = jnp.zeros((Q, B, cfg.combined_vocab_size), jnp.float32)
        vi_last = jnp.full((B,), cfg.max_vision_token_length, jnp.int32)
        pos_last = jnp.zeros((B,), jnp.int32)
        hist = jnp.zeros((B, self._Rb, D), cfg.compute_dtype)
        hist_ids = jnp.zeros((B, S), jnp.int32)   # codebook-0 token history
        active = np.zeros((B,), bool)
        budget = np.zeros((B,), np.int32)
        slot_req: List[Optional[Request]] = [None] * B
        slot_toks: List[List[np.ndarray]] = [[] for _ in range(B)]
        slot_ttft: List[Optional[float]] = [None] * B
        rng = jax.random.PRNGKey(0)
        # merged chunked prefill: device prompt buffers + host mirrors of
        # the on-device pf state (transitions are deterministic, so the
        # host replays them from the returned (tokens, actives) alone)
        mg, C, Np = self._merged_on, self._C, self._Np
        if mg:
            pids = jnp.zeros((Q, B, Np), jnp.int32)
            pvi = jnp.full((B, Np), cfg.max_vision_token_length, jnp.int32)
            ppm = jnp.zeros((B, Np), jnp.int32)
            ppos = jnp.ones((B, Np), jnp.int32)
            psig = jnp.zeros((B, Np, cfg.contiguous_signal_size),
                             jnp.float32)
        pf_active = np.zeros((B,), bool)
        pf_rem = np.zeros((B,), np.int32)     # merged chunks left
        pf_off = np.zeros((B,), np.int32)
        pf_len = np.zeros((B,), np.int32)
        pf_budget = np.zeros((B,), np.int32)

        def merged_eligible(req) -> bool:
            # Nb <= Np already implies the parking-window margin
            # Nb + C <= S (Np = (S - C) // C * C); decode-token cache
            # writes in the packed step are width-1, so coexisting
            # classic-path requests need no extra headroom.
            if not mg or req.pixels is not None:
                return False
            Nb = bucketed(req.input_ids.shape[-1])
            return Nb % C == 0 and Nb <= Np

        def bucketed(n):
            b = self.prompt_bucket
            return n if b <= 1 else -(-n // b) * b

        staged: Dict[int, Any] = {}

        def stage(req):
            """Pad one request's arrays to its bucket and device_put them.
            device_put is ASYNC: called ahead of need (prestage), the
            host->device copies overlap the decode chunks instead of
            serialising in front of the grouped refill dispatch (through a
            remote-TPU tunnel that staging is hundreds of ms per wave)."""
            n = req.input_ids.shape[-1]
            pad = bucketed(n) - n
            pm = np.zeros((bucketed(n),), np.int32)
            pm[pad:] = 1
            d = {"ids": np.pad(np.asarray(req.input_ids), ((0, 0), (pad, 0)),
                               constant_values=gen.pad_token_id),
                 "vi": np.pad(np.asarray(req.vision_indices), ((pad, 0),),
                              constant_values=cfg.max_vision_token_length),
                 "pm": pm}
            if req.pixels is not None:
                d["px"] = np.asarray(req.pixels)
                d["st"] = np.int32(req.img_start + pad)
            else:
                s = req.contiguous_signal
                s = (np.asarray(s, np.float32) if s is not None
                     else np.zeros((n, cfg.contiguous_signal_size),
                                   np.float32))
                d["sig"] = np.pad(s, ((pad, 0), (0, 0)))
                if self._merged_on:
                    # host-side position ids for the merged chunk slices
                    # (position_ids_from_mask semantics: pads pinned to 1)
                    pos = np.cumsum(d["pm"], -1).astype(np.int32) - 1
                    d["pos"] = np.where(d["pm"] == 0, 1, pos)
            return jax.device_put(d)

        def prestage():
            n = 0
            for r in queue[:n_arrived()]:
                if n >= 2 * B:
                    break
                if (bucketed(r.input_ids.shape[-1]) + r.max_new_tokens
                        + self._gamma > S):
                    continue    # try_fill will reject it; don't ship bytes
                if r.request_id not in staged:
                    staged[r.request_id] = stage(r)
                n += 1

        def try_fill(limit: Optional[int] = None):
            """Fill free slots from the queue. Merged-eligible head
            requests are INSTALLED (one ~free dispatch each) whenever the
            pool is busy, so their prompts ride the merged decode chunks
            instead of stalling it; everything else prefills a GROUP of
            up-to-len(free) head-of-queue requests that share a (prompt
            bucket, pixels?) program shape, as one B=k dispatch (k
            restricted to self._group_sizes). `limit` bounds the number
            of DEDICATED prefill dispatches (1 while slots are decoding;
            installs are never the stall they guard against)."""
            nonlocal cache, mask_buf, logits, vi_last, pos_last, hist, \
                hist_ids, pids, pvi, ppm, ppos, psig
            dispatches = 0
            while True:
                na = n_arrived()
                while na:
                    req = queue[0]
                    # spec decode needs a gamma-slot margin: the last
                    # verify window writes K/V at [P, P + gamma + 1)
                    if (bucketed(req.input_ids.shape[-1])
                            + req.max_new_tokens + self._gamma <= S):
                        break
                    # can never fit any slot: reject up front
                    queue.pop(0)
                    na -= 1
                    staged.pop(req.request_id, None)
                    results.append(Result(req.request_id,
                                          np.zeros((Q, 0), np.int64),
                                          "capacity"))
                    emit(req.request_id, None, True, "capacity")
                free = [s for s in range(B) if not active[s]
                        and not pf_active[s]]
                if not na or not free:
                    return
                # merged installs: pool busy + eligible head-of-queue +
                # EXACTLY ONE free slot (the staggered-refill case merged
                # prefill is built for). With >= 2 slots free, a grouped
                # dedicated prefill batches all of them in ONE ~400 ms
                # dispatch; serial installs (one slot advances per packed
                # iteration) cost k * chunks * ~2x-a-decode-iteration and
                # measured out (r4 A/B: the burst bistably fell into the
                # serial-install mode at 90-140 tok/s vs ~175 batched)
                while (na and len(free) == 1
                       and (active.any() or pf_active.any())
                       and merged_eligible(queue[0])):
                    req = queue.pop(0)
                    na -= 1
                    slot = free.pop(0)
                    Nb = bucketed(req.input_ids.shape[-1])
                    d = staged.pop(req.request_id, None) or stage(req)
                    t_br = time.perf_counter()
                    with self._qk_ctx():
                        (cache, mask_buf, pids, pvi, ppm, ppos,
                         psig) = self._install(Nb)(
                            cache, mask_buf, pids, pvi, ppm, ppos, psig,
                            d, jnp.int32(slot))
                    if prof_sync:
                        np.asarray(mask_buf[0, 0])
                    rs["t_install"] += time.perf_counter() - t_br
                    rs["n_install"] += 1
                    pf_active[slot] = True
                    pf_rem[slot] = Nb // C
                    pf_off[slot] = 0
                    pf_len[slot] = Nb
                    pf_budget[slot] = req.max_new_tokens
                    active[slot] = False
                    budget[slot] = 0
                    slot_req[slot] = req
                    slot_toks[slot] = []
                    slot_ttft[slot] = None
                    self.stats["merged_installs"] += 1
                if not na or not free:
                    return
                if limit is not None and dispatches >= limit:
                    return
                head = queue[0]
                Nb = bucketed(head.input_ids.shape[-1])
                has_px = head.pixels is not None
                if has_px and self.vq_params is None:
                    raise ValueError("pixels requests need vq_params/vq_cfg")
                group = [head]
                for r in queue[1:na]:
                    if (len(group) >= len(free)
                            or bucketed(r.input_ids.shape[-1]) != Nb
                            or (r.pixels is not None) != has_px
                            # pixel SHAPES are part of the program shape:
                            # mixed resolutions must not share a group
                            or (has_px
                                and r.pixels.shape != head.pixels.shape)
                            or Nb + r.max_new_tokens + self._gamma > S):
                        break
                    group.append(r)
                k = max(g for g in self._group_sizes if g <= len(group))
                group, slots = group[:k], free[:k]
                del queue[:k]

                reqs = tuple(staged.pop(r.request_id, None) or stage(r)
                             for r in group)
                extra = (self.vq_params,) if has_px else ()
                t_br = time.perf_counter()
                with self._qk_ctx():
                    (cache, mask_buf, logits, vi_last, pos_last, hist,
                     hist_ids) = self._prefill(Nb, has_px, k)(
                            self.params, cache, mask_buf, logits, vi_last,
                            pos_last, hist, hist_ids, reqs,
                            jnp.asarray(slots, jnp.int32), *extra)
                if prof_sync:
                    np.asarray(mask_buf[0, 0])
                rs["t_prefill"] += time.perf_counter() - t_br
                rs["n_prefill"] += 1
                for i, slot in enumerate(slots):
                    active[slot] = True
                    budget[slot] = group[i].max_new_tokens
                    slot_req[slot] = group[i]
                    slot_toks[slot] = []
                    slot_ttft[slot] = None
                dispatches += 1
                self.stats["dedicated_prefills"] += 1

        def finish(slot, reason):
            req = slot_req[slot]
            toks = (np.stack(slot_toks[slot], axis=-1)
                    if slot_toks[slot] else np.zeros((Q, 0), np.int64))
            results.append(Result(req.request_id, toks, reason,
                                  ttft_s=slot_ttft[slot]))
            active[slot] = False
            budget[slot] = 0
            slot_req[slot] = None

        def emit(rid, tok, done, reason):
            if on_token is not None:
                on_token(rid, tok, reason if done else None)

        prestage()
        try_fill()
        while active.any() or pf_active.any() or queue:
            if not active.any() and not pf_active.any():
                # pool idle, work still queued: the head either hasn't
                # arrived yet (sleep until it does) or just became visible
                nxt = queue[0].arrival_s or 0.0
                wait = t0 + nxt - time.perf_counter()
                if wait > 0:
                    rs["t_sleep"] += wait
                    time.sleep(wait)
                prestage()
                try_fill()
                continue
            if pf_active.any():
                rng, step_rng = jax.random.split(rng)
                t_br = time.perf_counter()
                with self._qk_ctx():
                    (toks, acts, cache, mask_buf, logits, vi_last,
                     pos_last) = self._merged()(
                        self.params, cache, mask_buf, logits, vi_last,
                        pos_last, pids, pvi, ppm, ppos, psig,
                        jnp.asarray(active), jnp.asarray(budget),
                        jnp.asarray(pf_active), jnp.asarray(pf_off),
                        jnp.asarray(pf_len), jnp.asarray(pf_budget),
                        step_rng)
                self.stats["merged_chunks"] += 1
                prestage()
                toks_np = np.asarray(toks)              # (K, Q, B)
                acts_np = np.asarray(acts)              # (K, B)
                t_now = time.perf_counter()
                rs["t_merged"] += t_now - t_br
                rs["n_merged"] += 1
                rs["iters"] += acts_np.shape[0]
                rs["active_iters"] += int(acts_np.sum())
                # replay the on-device transitions: emissions from the
                # returned (tokens, actives); pf completion/off/budget are
                # deterministic in (pf_len, C, iteration). Exactly ONE
                # prefilling slot advances per iteration (FIFO by slot
                # index), mirroring the packed step's argmax(pf) pick.
                for k in range(acts_np.shape[0]):
                    pf_idx = np.nonzero(pf_active)[0]
                    first_pf = int(pf_idx[0]) if len(pf_idx) else -1
                    for slot in range(B):
                        if slot == first_pf:
                            pf_rem[slot] -= 1
                            pf_off[slot] += C
                            if pf_rem[slot] <= 0:
                                pf_active[slot] = False
                                active[slot] = True
                                budget[slot] = pf_budget[slot]
                            continue
                        if pf_active[slot]:
                            continue      # queued install: waits its turn
                        if not acts_np[k, slot] or not active[slot]:
                            continue
                        req = slot_req[slot]
                        if slot_ttft[slot] is None:
                            slot_ttft[slot] = (t_now - t0
                                               - (req.arrival_s or 0.0))
                        tok_q = toks_np[k, :, slot]
                        slot_toks[slot].append(tok_q)
                        budget[slot] -= 1
                        if (tok_q == gen.eos_token_id).any():
                            finish(slot, "eos")
                            emit(req.request_id, tok_q, True, "eos")
                        elif budget[slot] <= 0:
                            finish(slot, "length")
                            emit(req.request_id, tok_q, True, "length")
                        else:
                            emit(req.request_id, tok_q, False, None)
                try_fill(limit=1 if (active.any() or pf_active.any())
                         else None)
                continue
            if self._gamma:
                t_br = time.perf_counter()
                with self._qk_ctx():
                    (toks, cnts, cache, mask_buf, hist_ids, logits,
                     pos_last) = self._spec_decode()(
                        self.params, cache, mask_buf, hist_ids, logits,
                        pos_last, jnp.asarray(active), jnp.asarray(budget))
                prestage()
                toks_np = np.asarray(toks)              # (K, B, gamma+1)
                cnts_np = np.asarray(cnts)              # (K, B)
                t_now = time.perf_counter()
                rs["t_spec"] += t_now - t_br
                rs["n_spec"] += 1
                rs["iters"] += cnts_np.shape[0]
                rs["active_iters"] += int((cnts_np > 0).sum())
                for slot in range(B):
                    if not active[slot]:
                        continue
                    req = slot_req[slot]
                    for k in range(cnts_np.shape[0]):
                        done = False
                        for j in range(int(cnts_np[k, slot])):
                            if slot_ttft[slot] is None:
                                slot_ttft[slot] = (t_now - t0
                                                   - (req.arrival_s or 0.0))
                            tok = toks_np[k, slot, j]
                            # text tokens are identical across codebooks
                            tok_q = np.full((Q,), tok, np.int64)
                            slot_toks[slot].append(tok_q)
                            budget[slot] -= 1
                            if tok == gen.eos_token_id:
                                finish(slot, "eos")
                                emit(req.request_id, tok_q, True, "eos")
                                done = True
                                break
                            if budget[slot] <= 0:
                                finish(slot, "length")
                                emit(req.request_id, tok_q, True, "length")
                                done = True
                                break
                            emit(req.request_id, tok_q, False, None)
                        if done:
                            break
                try_fill(limit=1 if active.any() else None)
                continue
            rng, step_rng = jax.random.split(rng)
            t_br = time.perf_counter()
            with self._qk_ctx():
                (toks, acts, cache, mask_buf, logits, vi_last, pos_last,
                 hist) = self._decode(lang_only)(
                    self.params, cache, mask_buf, logits, vi_last, pos_last,
                    jnp.asarray(active), jnp.asarray(budget), hist,
                    step_rng)
            # stage upcoming requests WHILE the decode chunk runs: the
            # np.asarray readback below blocks anyway, so the copies ride
            # along for free
            prestage()
            toks_np = np.asarray(toks)                  # (K, Q, B)
            acts_np = np.asarray(acts)                  # (K, B)
            t_now = time.perf_counter()
            rs["t_decode"] += t_now - t_br
            rs["n_decode"] += 1
            rs["iters"] += acts_np.shape[0]
            rs["active_iters"] += int(acts_np.sum())
            for slot in range(B):
                if not active[slot]:
                    continue
                req = slot_req[slot]
                for k in range(acts_np.shape[0]):
                    if not acts_np[k, slot]:
                        break
                    if slot_ttft[slot] is None:
                        slot_ttft[slot] = t_now - t0 - (req.arrival_s or 0.0)
                    tok_q = toks_np[k, :, slot]
                    slot_toks[slot].append(tok_q)
                    budget[slot] -= 1
                    if (tok_q == gen.eos_token_id).any():
                        finish(slot, "eos")
                        emit(req.request_id, tok_q, True, "eos")
                        break
                    if budget[slot] <= 0:
                        finish(slot, "length")
                        emit(req.request_id, tok_q, True, "length")
                        break
                    emit(req.request_id, tok_q, False, None)
            # interleave at most ONE prefill while slots are decoding so a
            # prompt burst can't stall the pool; drain freely when idle
            try_fill(limit=1 if active.any() else None)

        return sorted(results, key=lambda r: r.request_id)
