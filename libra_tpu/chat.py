"""Incremental multi-turn chat: KV-cache reuse across turns.

The reference's multi-turn flow rebuilds the whole conversation string
every turn and re-runs the full prompt through the model (demo notebook:
re-render the v1 template, tokenization_libra.py:162-316, then the
generate loop over the entire history). A ChatSession instead keeps the
conversation's KV cache resident on device: each ask() prefills ONLY the
new turn's tokens (bucketed delta) and decodes the answer in one jitted
while_loop, so turn-k TTFT costs O(new tokens), not O(history). At the
11B scale a 600-token history re-prefill is ~220 ms of device time; a
32-token question delta is a small fraction of that.

Exactness: a session's greedy tokens equal a fresh full-prompt Generator
run over the SAME concatenated token history (tests/test_chat_session.py)
-- causal attention makes prefix-cached continuation mathematically
identical to full re-prefill. The session operates at the TOKEN level:
the reference's string-rebuild flow can retokenize an answer/separator
boundary differently than the generated tokens, which is a property of
retokenization, not of cache reuse (a generated answer followed by the
</s> EOS id is exactly the v1 template's "answer</s>" rendering).

Batched lockstep: B independent conversations advance together (BASELINE
config 4's batched multi-turn VQA). Rows that hit EOS early stop
attending -- their post-finish pad writes are mask-zeroed forever -- and
the shared scalar cache index advances in lockstep, so a turn consumes
max-over-rows slots (bounded waste, no per-row timelines needed).

vision_prediction_mode="2d" is not supported (its hidden-state ring
would need dynamic-length stitching across the turn boundary); the
flagship checkpoints ship "1d" (reference libra_pretrain.yaml:6).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.generation import (GenerationConfig, _last_position_logits, decode_micro_step,
                                  sample_tokens)
from libra_tpu.models import libra as M
from libra_tpu.spec_decode import spec_decode_loop


class TurnResult(NamedTuple):
    tokens: jax.Array          # (Q, B, max_new) generated ids (pad-filled)
    num_generated: jax.Array   # (B,) tokens generated incl. EOS


def _rope_inc(cfg: LibraConfig, vi: jax.Array) -> jax.Array:
    """2D-RoPE base increment contributed by a token with vision index
    `vi`: 1 on text/BOI, R+1 on EOI, 0 inside an image (the decode-body
    rule in generation._generate_impl, reference get_2d_position_ids)."""
    Mv = cfg.max_vision_token_length
    inc = jnp.where((vi == Mv) | (vi == 0), 1, 0)
    return jnp.where(vi == Mv - 1, cfg.image_feature_resolution + 1, inc)


def _delta_prefill(params, cache, mask_buf, ids, vi, sig, pmask, pos_last,
                   vq_params=None, pixels=None, img_start=None, *,
                   cfg: LibraConfig, gen: GenerationConfig, vq_cfg=None):
    """The delta prompt pass shared by the standard and speculative turn
    bodies: mask write at the carried cache index, optional fused
    CLIP+VQGAN encode (raw-pixels turns), carried 2D-RoPE positions, the
    bucketed forward, and last-position logits. Returns
    (out, logits, mask_buf, vi_last, pos_last_new, offset_tab)."""
    Q, B, Nb = ids.shape
    Mv = cfg.max_vision_token_length
    start = cache.index
    mask_buf = M._write_seq(mask_buf, pmask, start)

    text_span = None
    if pixels is not None:
        from libra_tpu.training.fused import (_scatter_block,
                                              encode_images_to_tokens)
        img_ids, img_sig = encode_images_to_tokens(vq_params, vq_cfg, cfg,
                                                   pixels)
        ids = jax.vmap(jax.vmap(_scatter_block, in_axes=(0, 0, 0)),
                       in_axes=(0, 0, None))(ids, img_ids, img_start)
        sig = jax.vmap(_scatter_block)(
            jnp.zeros((B, Nb, img_sig.shape[-1]), img_sig.dtype),
            img_sig, img_start)
        if gen.split_prefill and not cfg.addition_mode:
            # one full image block per row makes the text width static:
            # full-rank language projections run on text rows only (exact)
            text_span = M.text_span_maps(cfg, img_start, Nb)

    if cfg.use_2d_rope:
        offset_tab = M.make_2d_pos_offset(cfg)
        base = pos_last[:, None] + jnp.cumsum(_rope_inc(cfg, vi) * pmask,
                                              axis=1)
        pos = jnp.swapaxes(base[:, :, None]
                           + offset_tab[jnp.clip(vi, 0, Mv)], 1, 2)
        pos_last_new = base[:, -1]
    else:
        offset_tab = None
        pos = pos_last[:, None] + jnp.cumsum(pmask, axis=1)
        pos_last_new = pos[:, -1]

    impl = gen.attn_impl
    if impl == "auto":
        # the delta prompt pass runs the fused flash bridged-attention
        # kernel on TPU, exactly as generation._prefill resolves it
        impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    from libra_tpu.ops.qlinear import a8_enabled
    with a8_enabled(gen.a8_prefill):
        # w8a8 on the compute-bound delta pass only; the decode body below
        # traces OUTSIDE this context (exact weight-only dequant), as in
        # generation._generate_impl
        out = M.forward(params, cfg, ids, mask_buf, vi, sig,
                        position_ids=pos, cache=cache, attn_impl=impl,
                        text_span=text_span)

    vi_last = vi[:, -1]          # delta is LEFT-padded: last column is real
    logits = _last_position_logits(params, cfg, out.hidden_states,
                                   vi_last < Mv, vi_last)
    return out, logits, mask_buf, vi_last, pos_last_new, offset_tab


def _turn_impl(params, cache, mask_buf, ids, vi, sig, pmask, pos_last,
               rng, vq_params=None, pixels=None, img_start=None, *,
               cfg: LibraConfig, gen: GenerationConfig,
               lang_only: bool, max_new: int, vq_cfg=None):
    """One conversation turn: delta prefill at the carried cache index,
    then an active-masked decode loop. Returns the turn's tokens plus the
    updated carried state. With `pixels`, the CLIP+VQGAN encode runs
    INSIDE this program and hides behind the delta prefill (the
    Generator's fused vision path, generation._generate_impl)."""
    Q, B, Nb = ids.shape
    out, logits, mask_buf, vi_last, pos_last_new, _ = _delta_prefill(
        params, cache, mask_buf, ids, vi, sig, pmask, pos_last,
        vq_params, pixels, img_start, cfg=cfg, gen=gen, vq_cfg=vq_cfg)
    toks0 = jnp.full((Q, B, max_new), gen.pad_token_id, jnp.int32)
    if max_new == 0:
        # prefill-only turn: context injected, nothing generated (the
        # while_loop body can't even trace over a zero-width buffer)
        return (toks0, jnp.zeros((B,), jnp.int32), out.cache, mask_buf,
                vi_last, pos_last_new)

    def cond(st):
        return (st[0] < max_new) & ~jnp.all(st[7])

    def body(st):
        (t, toks, mask_buf, cache, logits, vi_last, pos_last, finished,
         num_gen, rng) = st
        rng, srng = jax.random.split(rng)
        tok = sample_tokens(logits, gen, srng)                  # (Q, B)
        active = ~finished
        tok = jnp.where(active[None], tok, gen.pad_token_id)
        eos = jnp.any(tok == gen.eos_token_id, axis=0) & active
        num_gen = num_gen + active.astype(num_gen.dtype)
        finished = finished | eos
        toks = jax.lax.dynamic_update_slice(
            toks, tok[:, :, None].astype(toks.dtype), (0, 0, t))
        # the emitted token (incl. EOS -- it doubles as the v1 template's
        # </s> separator) stays visible to future turns; post-finish pad
        # writes are mask-zeroed out of attention forever
        mask_buf = M._write_seq(mask_buf,
                                active[:, None].astype(mask_buf.dtype),
                                cache.index)
        logits, cache, vi_new, pos_new, _ = decode_micro_step(
            params, cfg, tok, mask_buf, cache, vi_last, pos_last,
            active=active, lang_only=lang_only)
        return (t + 1, toks, mask_buf, cache, logits, vi_new, pos_new,
                finished, num_gen, rng)

    st = (jnp.int32(0), toks0, mask_buf, out.cache, logits, vi_last,
          pos_last_new, jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
          rng)
    (_, toks, mask_buf, cache, _, vi_last, pos_last, _, num_gen,
     _) = jax.lax.while_loop(cond, body, st)
    return toks, num_gen, cache, mask_buf, vi_last, pos_last


def _spec_turn_impl(params, cache, mask_buf, hist, ids, vi, sig, pmask,
                    pos_last, rng, vq_params=None, pixels=None,
                    img_start=None, *, cfg: LibraConfig,
                    gen: GenerationConfig, max_new: int, vq_cfg=None):
    """Speculative conversation turn: the same delta prefill, then the
    shared draft/verify loop (spec_decode.spec_decode_loop) against the
    conversation's RESIDENT cache at PER-ROW indices (VERDICT r3 item 8 --
    the serving engine's per-slot mode), then a lockstep resync.

    `hist` (B, Sh) is the session's codebook-0 token history, carried
    across turns so the bigram drafter can copy from EARLIER turns too
    (the chat shape the drafter exists for: answers quote the question and
    prior answers). Rows desync inside the loop (each accepts a different
    draft count); at turn end the final pending token's K/V is flushed
    with one per-row micro step (every emitted token's K/V lands in the
    standard body too) and the cache index resyncs to the scalar
    max-over-rows -- the gap slots stay mask-zeroed forever, the same
    bounded-waste contract as the lockstep decode body. Exactness is
    unchanged: every emitted token is the target model's own greedy
    argmax (tests/test_chat_session.py spec parity)."""
    Q, B, Nb = ids.shape
    Mv = cfg.max_vision_token_length
    start = cache.index                                   # scalar lockstep
    out, logits, mask_buf, vi_last, pos_last_new, offset_tab = \
        _delta_prefill(params, cache, mask_buf, ids, vi, sig, pmask,
                       pos_last, vq_params, pixels, img_start, cfg=cfg,
                       gen=gen, vq_cfg=vq_cfg)
    # record the delta's codebook-0 ids (pad slots stay mask-invalid)
    hist = M._write_seq(hist, ids[0], start)
    toks0 = jnp.full((Q, B, max_new), gen.pad_token_id, jnp.int32)
    if max_new == 0:
        return (toks0, jnp.zeros((B,), jnp.int32), out.cache, mask_buf,
                hist, vi_last, pos_last_new)

    # text-mode greedy: codebook 0's combined-vocab argmax IS the answer
    pending = jnp.argmax(logits[0], axis=-1).astype(hist.dtype)   # (B,)
    P0 = start + Nb                     # scalar slot of the pending token
    hist = M._write_seq(hist, pending[:, None], P0)
    P = jnp.full((B,), 0, jnp.int32) + P0
    res = spec_decode_loop(params, hist, mask_buf, out.cache._replace(index=P),
                           pending, pos_last_new, P, offset_tab, cfg=cfg,
                           gen=gen, max_new=max_new)

    # flush the final pending token (slot res.P, emitted but K/V absent)
    # so future turns can attend to it -- incl. the EOS </s> separator
    xf = jnp.take_along_axis(res.hist, res.P[:, None], axis=1)    # (B, 1)
    mask_f = M._write_seq(res.mask_buf,
                          jnp.ones((B, 1), res.mask_buf.dtype), res.P)
    pos_f = res.last_pos[:, None] + 1
    if cfg.use_2d_rope:
        pos_ids = pos_f[:, None, :] + offset_tab[Mv][None, :, None]
    else:
        pos_ids = pos_f
    outf = M.forward(params, cfg, jnp.broadcast_to(xf[None], (Q, B, 1)),
                     mask_f, jnp.full((B, 1), Mv, jnp.int32), None,
                     position_ids=pos_ids, cache=res.cache, lang_only=True)
    cache = outf.cache._replace(index=jnp.max(res.P) + 1)  # lockstep resync

    # the turn's tokens: history slots [P0, P0 + max_new), pad past num_gen
    seq = jax.lax.dynamic_slice(res.hist, (jnp.int32(0), P0), (B, max_new))
    seq = jnp.where(jnp.arange(max_new)[None] < res.num_gen[:, None],
                    seq, gen.pad_token_id)
    toks = jnp.broadcast_to(seq[None], (Q, B, max_new)).astype(jnp.int32)
    return (toks, res.num_gen, cache, mask_f, res.hist,
            jnp.full((B,), Mv, vi_last.dtype), res.last_pos + 1)


class ChatSession:
    """Batched incremental multi-turn generation over one resident cache.

    params/cfg as for Generator; `max_len` is the whole conversation's
    token capacity (prompt deltas + answers across ALL turns). Deltas are
    left-padded to `delta_bucket` multiples so the per-turn compile cache
    stays bounded. With a `mesh`, params/cache shard tensor-parallel over
    its "model" axis exactly as the Generator does."""

    def __init__(self, params, cfg: LibraConfig, batch: int, max_len: int,
                 gen: Optional[GenerationConfig] = None, delta_bucket: int = 64,
                 mesh=None, vq_params=None, vq_cfg=None):
        if cfg.vision_prediction_mode == "2d":
            raise NotImplementedError(
                "ChatSession supports vision_prediction_mode='1d' only "
                "(the 2d hidden ring would need dynamic stitching across "
                "turns); use Generator/pipeline.chat for 2d checkpoints")
        self.cfg = cfg
        self.gen = gen or GenerationConfig()
        if self.gen.spec_decode:
            if self.gen.do_sample:
                raise ValueError("speculative chat turns are greedy-only "
                                 "(as Generator spec decode)")
            if self.gen.decode_modality == "dual":
                raise ValueError(
                    "spec_decode needs text-mode decode; "
                    "decode_modality='dual' never drafts from history")
        self.B = batch
        self.delta_bucket = max(delta_bucket, 1)
        # spec turns probe/write up to gamma+1 slots past a row's budget:
        # over-allocate the cache/mask so the verify windows stay in bounds
        extra = int(self.gen.spec_decode) + 1 if self.gen.spec_decode else 0
        self.S = (-(-(max_len + extra) // 128) * 128 if self.gen.kv_quant
                  else max_len + extra)
        self._cap = self.S - extra      # usable conversation slots
        self.mesh = mesh
        self._cache_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from libra_tpu.parallel.sharding import (cache_shardings,
                                                     shard_params)
            params = shard_params(mesh, params)
            self._cache_sh = cache_shardings(mesh, cfg,
                                             quantized=self.gen.kv_quant)
            if vq_params is not None:
                # the vision tower is small: replicate (as Generator does)
                vq_params = jax.device_put(
                    vq_params, NamedSharding(mesh, PartitionSpec()))
        else:
            params = jax.device_put(params)
            if vq_params is not None:
                vq_params = jax.device_put(vq_params)
        self.params = params
        if (vq_params is None) != (vq_cfg is None):
            raise ValueError("vq_params and vq_cfg must be given together "
                             "(raw-pixels turns need both)")
        self.vq_params = vq_params
        self.vq_cfg = vq_cfg
        from libra_tpu.ops.qlinear import kernel_enabled
        self._qk_ctx = functools.partial(kernel_enabled, mesh is None)
        self._fns: Dict[Any, Any] = {}
        self.reset()

    # -- state -------------------------------------------------------------

    def reset(self) -> None:
        """Fresh conversation: zeroed cache/mask, positions at -1."""
        cache = M.init_cache(self.cfg, self.B, self.S,
                             quantized=self.gen.kv_quant)
        if self._cache_sh is not None:
            cache = jax.device_put(cache, self._cache_sh)
        self._cache = cache
        self._mask_buf = jnp.zeros((self.B, self.S), jnp.int32)
        self._pos_last = jnp.full((self.B,), -1, jnp.int32)
        # spec sessions carry the conversation's codebook-0 token history
        # so the bigram drafter can copy from earlier turns
        self._hist = (jnp.zeros((self.B, self.S), jnp.int32)
                      if self.gen.spec_decode else None)
        self._n = 0                 # host-side upper bound on cache.index

    @property
    def used(self) -> int:
        """Upper bound on occupied cache slots (exact when every turn ran
        to max_new; early-EOS turns leave it conservative)."""
        return self._n

    # -- per-turn ----------------------------------------------------------

    def _fn(self, Nb: int, lang_only: bool, max_new: int,
            has_pixels: bool = False, spec: bool = False,
            has_sig: bool = True):
        key = (Nb, lang_only, max_new, has_pixels, spec, has_sig)
        if key not in self._fns:
            if spec:
                f = functools.partial(_spec_turn_impl, cfg=self.cfg,
                                      gen=self.gen, max_new=max_new,
                                      vq_cfg=self.vq_cfg)
                # carried device state incl. the token-history buffer
                self._fns[key] = jax.jit(f, donate_argnums=(1, 2, 3))
            else:
                f = functools.partial(_turn_impl, cfg=self.cfg, gen=self.gen,
                                      lang_only=lang_only, max_new=max_new,
                                      vq_cfg=self.vq_cfg)
                # donate the carried device state (cache dominates: the
                # session updates it in place turn over turn)
                self._fns[key] = jax.jit(f, donate_argnums=(1, 2))
        return self._fns[key]

    def ask(self, inputs: Dict[str, Any],
            max_new_tokens: Optional[int] = None,
            rng: Optional[jax.Array] = None) -> TurnResult:
        """Run one turn. `inputs` is a LibraTokenizer-style dict for the
        DELTA only: input_ids (Q, B, Nd), vision_indices (B, Nd), optional
        attention_mask (left padding from batched tokenization) and
        coninous_signal (image turns). Returns the turn's generated
        tokens; the cache/history advances in place."""
        cfg, gen = self.cfg, self.gen
        # None-check, not truthiness: max_new_tokens=0 is a legal
        # prefill-only turn (inject context, generate nothing)
        max_new = (gen.max_new_tokens if max_new_tokens is None
                   else max_new_tokens)
        ids = np.asarray(inputs["input_ids"])
        vi = np.asarray(inputs["vision_indices"])
        Q, B, Nd = ids.shape
        if B != self.B:
            raise ValueError(f"session batch is {self.B}, got {B}")
        pm = inputs.get("attention_mask")
        pm = (np.ones((B, Nd), np.int32) if pm is None
              else np.asarray(pm, np.int32))
        pixels = inputs.get("pixels")
        img_start = inputs.get("img_start")
        if pixels is not None:
            if self.vq_params is None:
                raise ValueError("pixels turns need vq_params/vq_cfg")
            pixels = jnp.asarray(np.asarray(pixels))
            side = self.vq_cfg.clip.image_size
            if tuple(pixels.shape) != (B, side, side, 3):
                raise ValueError(
                    "pixels shape %r != the session's CLIP input "
                    "(%d, %d, %d, 3)" % (tuple(pixels.shape), B, side, side))
            img_start = np.asarray(img_start, np.int32)
            # pixels turns NEVER ship a host signal: _delta_prefill
            # replaces it with the on-device CLIP scatter. The r4 bench's
            # unexplained 300 ms of chat turn-1 TTFT over the same-shape
            # vqa_full32 prefill was exactly this -- a (B, 640, 2048) fp32
            # ZEROS placeholder (21 MB at B=4) staged through the TPU
            # tunnel every turn (VERDICT r4 item 5).
            sig = None
        else:
            sig = inputs.get("coninous_signal")
            # all-zero signals (plain text turns) also stay host-side None
            sig = None if sig is None else np.asarray(sig, np.float32)

        pad = (-Nd) % self.delta_bucket
        if pad:
            ids = np.pad(ids, ((0, 0), (0, 0), (pad, 0)),
                         constant_values=gen.pad_token_id)
            vi = np.pad(vi, ((0, 0), (pad, 0)),
                        constant_values=cfg.max_vision_token_length)
            pm = np.pad(pm, ((0, 0), (pad, 0)))
            if sig is not None:
                sig = np.pad(sig, ((0, 0), (pad, 0), (0, 0)))
            if img_start is not None:
                img_start = img_start + pad
        Nb = Nd + pad
        if self._n + Nb + max_new > self._cap:
            raise ValueError(
                f"turn needs {Nb}+{max_new} slots but only "
                f"{self._cap - self._n} of {self._cap} remain; raise "
                f"max_len or reset() the session")

        # lang-only decode body when every delta ends in text (chat
        # answers); a delta ending inside an image block (t2i turn)
        # decodes dual-path -- same resolution rule as Generator/serving
        modality = gen.decode_modality
        if modality == "auto":
            modality = ("text" if bool((vi[:, -1] >= cfg.max_vision_token_length).all())
                        else "dual")
        elif modality == "text":
            if (vi[:, -1] < cfg.max_vision_token_length).any():
                raise ValueError(
                    "decode_modality='text' needs deltas ending in text")
        rng = rng if rng is not None else jax.random.PRNGKey(self._n)

        px_args = ((self.vq_params, pixels, jnp.asarray(img_start))
                   if pixels is not None else ())
        spec = bool(gen.spec_decode)
        if spec and modality != "text":
            raise ValueError(
                "a spec_decode session decodes text only; this turn "
                "resolved decode_modality='dual' (delta ends inside an "
                "image block) -- use a non-spec session for t2i turns")
        sig_dev = None if sig is None else jnp.asarray(sig)
        with self._qk_ctx():
            if spec:
                (toks, num_gen, cache, mask_buf, hist, vi_last,
                 pos_last) = self._fn(Nb, True, max_new,
                                      pixels is not None, spec=True,
                                      has_sig=sig is not None)(
                    self.params, self._cache, self._mask_buf, self._hist,
                    jnp.asarray(ids), jnp.asarray(vi), sig_dev,
                    jnp.asarray(pm), self._pos_last, rng, *px_args)
                self._hist = hist
            else:
                toks, num_gen, cache, mask_buf, vi_last, pos_last = self._fn(
                    Nb, modality == "text", max_new, pixels is not None,
                    has_sig=sig is not None)(
                        self.params, self._cache, self._mask_buf,
                        jnp.asarray(ids), jnp.asarray(vi), sig_dev,
                        jnp.asarray(pm), self._pos_last, rng, *px_args)
        self._cache, self._mask_buf = cache, mask_buf
        self._pos_last = pos_last
        # exact occupancy readback (the tokens readback below blocks on
        # the same computation anyway)
        self._n = int(np.asarray(cache.index))
        return TurnResult(tokens=toks, num_generated=num_gen)
