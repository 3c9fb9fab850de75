"""Continuous-batching serving engine (net-new vs the reference, which
serves one static batch per `generate()` call).

Design (TPU-first): a fixed pool of `max_batch` slots shares ONE bridged KV
cache and ONE global write index. All slots advance in lockstep through a
single compiled decode step; a finished slot is immediately refilled by
prefilling the next queued request so that its prompt's K/V land at
positions [t-N, t) of the shared timeline (per-slot attention masks hide
other history). Two compiled programs total:

  * `_prefill(cache, ...)`  -- one request's prompt forward on a B=1 slice
    of the pooled cache (sliced out, run, written back);
  * `_decode(...)`          -- one token for ALL slots (inactive slots
    masked), with multi-codebook sampling, EOI->newline forcing and
    vision_indices carry identical to libra_tpu.generation.

Static shapes throughout: prompts are right-aligned at the global index so
a single scalar cache index suffices (no per-slot scatter). The engine's
timeline capacity is `max_len` TOTAL tokens across the run; production
deployments size it to the context budget and recycle engines (documented
limitation of the v1 design).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.generation import GenerationConfig, _last_position_logits, sample_tokens
from libra_tpu.models import libra as M


@dataclass
class Request:
    request_id: int
    input_ids: np.ndarray        # (Q, N) combined-vocab ids
    vision_indices: np.ndarray   # (N,)
    contiguous_signal: Optional[np.ndarray] = None   # (N, S) or None
    max_new_tokens: int = 128


@dataclass
class Result:
    request_id: int
    tokens: np.ndarray           # (Q, num_generated) generated ids
    finish_reason: str = "eos"   # "eos" | "length" | "capacity"


def _slot_cache(cache: M.KVCache, slot):
    def slc(buf):
        if buf is None:
            return None
        return jax.lax.dynamic_slice_in_dim(buf, slot, 1, axis=1)
    return M.KVCache(k=slc(cache.k), v=slc(cache.v), kb=slc(cache.kb),
                     vb=slc(cache.vb),
                     flag=jax.lax.dynamic_slice_in_dim(cache.flag, slot, 1, 0),
                     index=cache.index)


def _merge_slot(cache: M.KVCache, piece: M.KVCache, slot):
    def put(buf, new):
        if buf is None:
            return None
        return jax.lax.dynamic_update_slice_in_dim(buf, new, slot, axis=1)
    return M.KVCache(k=put(cache.k, piece.k), v=put(cache.v, piece.v),
                     kb=put(cache.kb, piece.kb), vb=put(cache.vb, piece.vb),
                     flag=jax.lax.dynamic_update_slice_in_dim(
                         cache.flag, piece.flag, slot, 0),
                     index=piece.index)


class ServingEngine:
    """Lockstep continuous batching over a fixed slot pool.

    >>> eng = ServingEngine(params, cfg, max_batch=4, max_len=2048)
    >>> results = eng.run([Request(...), ...])     # any number of requests
    """

    def __init__(self, params, cfg: LibraConfig, max_batch: int = 4,
                 max_len: int = 2048,
                 gen: Optional[GenerationConfig] = None):
        if cfg.vision_prediction_mode == "2d":
            raise NotImplementedError(
                "the serving engine does not carry the 2D-mode hidden ring "
                "buffer; use libra_tpu.generation.Generator for 2D "
                "checkpoints (default checkpoints are 1d)")
        if cfg.use_2d_rope:
            raise NotImplementedError(
                "the serving engine derives 1D position ids; 2D-RoPE "
                "checkpoints need the 2D position carry of "
                "libra_tpu.generation.Generator")
        self.cfg = cfg
        self.params = jax.device_put(params)
        self.B = max_batch
        self.S = max_len
        self.gen = gen or GenerationConfig()
        self._prefill_fns: Dict[int, Any] = {}
        self._decode_fn = None

    # -- compiled pieces ----------------------------------------------------

    def _prefill(self, N: int):
        """One compiled prefill per prompt-length bucket."""
        if N not in self._prefill_fns:
            cfg, gen = self.cfg, self.gen

            def f(params, cache, mask_buf, ids, vi, sig, slot):
                # slice this slot's row out of the pooled cache
                piece = _slot_cache(cache, slot)
                # prompt occupies [index, index+N) of the shared timeline
                row = jax.lax.dynamic_slice(
                    mask_buf, (slot, 0), (1, mask_buf.shape[1]))
                pos = M.position_ids_from_mask(
                    jax.lax.dynamic_slice(row, (0, cache.index), (1, N)))
                out = M.forward(params, cfg, ids, row, vi, sig,
                                position_ids=pos, cache=piece)
                flag_last = vi[:, -1] < cfg.max_vision_token_length
                logits = _last_position_logits(
                    params, cfg, out.hidden_states, flag_last, vi[:, -1],
                    h_up=out.hidden_states[:, -1])
                return _merge_slot(cache, out.cache, slot), logits, \
                    pos[:, -1]

            self._prefill_fns[N] = jax.jit(f)
        return self._prefill_fns[N]

    def _decode(self):
        if self._decode_fn is None:
            cfg, gen = self.cfg, self.gen

            def f(params, cache, mask_buf, last_logits, vi_last, pos_last,
                  active, rng):
                tok = sample_tokens(last_logits, gen, rng)       # (Q, B)
                tok = jnp.where(active[None], tok, gen.pad_token_id)
                slot_idx = cache.index
                mask_buf = jax.lax.dynamic_update_slice(
                    mask_buf, active[:, None].astype(mask_buf.dtype),
                    (0, slot_idx))
                vi_new = jnp.where(
                    active, jnp.minimum(vi_last + 1,
                                        cfg.max_vision_token_length),
                    vi_last)
                pos_new = jnp.where(active, pos_last + 1, pos_last)
                step = M.forward(params, cfg, tok[:, :, None], mask_buf,
                                 vi_new[:, None], None,
                                 position_ids=pos_new[:, None], cache=cache)
                logits = _last_position_logits(
                    params, cfg, step.hidden_states,
                    vi_new < cfg.max_vision_token_length, vi_new,
                    h_up=step.hidden_states[:, -1])
                return tok, step.cache, mask_buf, logits, vi_new, pos_new

            self._decode_fn = jax.jit(f)
        return self._decode_fn

    # -- host-side scheduler -------------------------------------------------

    def run(self, requests: List[Request]) -> List[Result]:
        cfg, gen, B, S = self.cfg, self.gen, self.B, self.S
        Q = cfg.vision_codebook_num
        queue = list(requests)
        results: List[Result] = []

        cache = M.init_cache(cfg, B, S)
        mask_buf = jnp.zeros((B, S), jnp.int32)
        logits = jnp.full((Q, B, cfg.combined_vocab_size), 0.0, jnp.float32)
        vi_last = jnp.full((B,), cfg.max_vision_token_length, jnp.int32)
        pos_last = jnp.zeros((B,), jnp.int32)
        active = np.zeros((B,), bool)
        slot_req: List[Optional[Request]] = [None] * B
        slot_toks: List[List[np.ndarray]] = [[] for _ in range(B)]
        rng = jax.random.PRNGKey(0)

        def capacity_left(n):
            return int(cache.index) + n + 1 <= S

        def try_fill():
            nonlocal cache, mask_buf, logits, vi_last, pos_last
            for slot in range(B):
                if active[slot] or not queue:
                    continue
                req = queue[0]
                N = req.input_ids.shape[-1]
                if not capacity_left(N):
                    continue
                queue.pop(0)
                idx = int(cache.index)
                # retire the slot's previous history and mark the new
                # prompt's window (a reused slot must NOT attend to the
                # finished request's positions)
                mask_buf = mask_buf.at[slot].set(0)
                mask_buf = jax.lax.dynamic_update_slice(
                    mask_buf, jnp.ones((1, N), jnp.int32), (slot, idx))
                sig = req.contiguous_signal
                sig = (jnp.asarray(sig, jnp.float32)[None]
                       if sig is not None else
                       jnp.zeros((1, N, cfg.contiguous_signal_size),
                                 jnp.float32))
                cache, lg, p_last = self._prefill(N)(
                    self.params, cache, mask_buf,
                    jnp.asarray(req.input_ids)[:, None],
                    jnp.asarray(req.vision_indices)[None], sig,
                    slot)
                logits = logits.at[:, slot].set(lg[:, 0])
                vi_last = vi_last.at[slot].set(int(req.vision_indices[-1]))
                pos_last = pos_last.at[slot].set(p_last[0])
                active[slot] = True
                slot_req[slot] = req
                slot_toks[slot] = []

        def finish(slot, reason):
            req = slot_req[slot]
            toks = (np.stack(slot_toks[slot], axis=-1)
                    if slot_toks[slot] else np.zeros((Q, 0), np.int64))
            results.append(Result(req.request_id, toks, reason))
            active[slot] = False
            slot_req[slot] = None

        try_fill()
        while active.any():
            if not capacity_left(0):
                for slot in range(B):
                    if active[slot]:
                        finish(slot, "capacity")
                break
            rng, step_rng = jax.random.split(rng)
            act_dev = jnp.asarray(active)
            tok, cache, mask_buf, logits, vi_last, pos_last = self._decode()(
                self.params, cache, mask_buf, logits, vi_last, pos_last,
                act_dev, step_rng)
            tok_np = np.asarray(tok)                        # (Q, B)
            for slot in range(B):
                if not active[slot]:
                    continue
                slot_toks[slot].append(tok_np[:, slot])
                req = slot_req[slot]
                if (tok_np[:, slot] == gen.eos_token_id).any():
                    finish(slot, "eos")
                elif len(slot_toks[slot]) >= req.max_new_tokens:
                    finish(slot, "length")
            try_fill()

        for req in queue:   # never scheduled (capacity)
            results.append(Result(req.request_id, np.zeros((Q, 0), np.int64),
                                  "capacity"))
        return sorted(results, key=lambda r: r.request_id)
