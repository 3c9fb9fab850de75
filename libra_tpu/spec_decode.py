"""N-gram (prompt-lookup) speculative decoding -- net-new vs the reference
(whose decode loop is strictly one token per forward pass,
modeling_libra_utils.py:60-635).

Decode at batch<=8 is HBM-bandwidth-bound on weights (the full-32 11B int8
step moves ~6.6 GB of weights vs ~1.7 GB of KV), so a forward pass over
gamma+1 tokens costs nearly the same wall time as one token: if we can
GUESS the next gamma tokens cheaply and verify them all in one pass, every
accepted guess is a free token. The drafts come from bigram lookup over
the sequence's own history ("prompt lookup" / vLLM's ngram speculator):
text answers copy heavily from their prompts (VQA answer spans, code,
quoted captions), and the lookup is O(B*S) integer compares on the VPU --
no draft model, no extra weights, no host round-trips.

EXACTNESS: every emitted token is the target model's own greedy argmax.
The verify pass computes, at every position of the drafted block, what the
model WOULD have produced given the accepted prefix; the first mismatch
truncates acceptance, and the model's own token at the mismatch position
is emitted instead (the "bonus" token -- so each iteration always emits
>= 1 token and the loop terminates in <= max_new_tokens iterations).
`tests/test_spec_decode.py` asserts token-for-token parity with the
standard decode loop.

Restrictions (enforced by Generator._get_fn / ChatSession): greedy only
(sampling would need distribution-preserving rejection sampling) and
text-mode decode only (resolved decode_modality == "text": image blocks
are multi-codebook and never copy from history). Works with int8 KV
caches: the fused decode-attention kernel accepts query blocks up to
Nq=8, so (gamma+1)-token verify steps with gamma <= 7 read the int8 cache
through the kernel just like the standard Nq=1 decode (per-query flags
and in-block causality ride the bias; larger gammas fall back to the XLA
dequant path).

Batch rows desync (each accepts a different prefix), which the model
already supports: KVCache.index may be a (B,) vector (the serving engine's
per-slot timelines), and attention masks/causality are per-row. The core
loop (`spec_decode_loop`) is shared by the Generator path here and by
ChatSession's spec turns (libra_tpu/chat.py), which run it against a
conversation's RESIDENT cache at per-row turn offsets.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from libra_tpu.config import LibraConfig
from libra_tpu.generation import GenerateResult, GenerationConfig, _prefill
from libra_tpu.models import libra as M


def _update_window(row: jax.Array, seg: jax.Array, start: jax.Array,
                   write: jax.Array) -> jax.Array:
    """Write seg[i] at row[start+i] where write[i], keep old elsewhere.
    Window must be statically in bounds (callers pad their buffers)."""
    K = seg.shape[0]
    old = jax.lax.dynamic_slice(row, (start,), (K,))
    return jax.lax.dynamic_update_slice(
        row, jnp.where(write, seg.astype(row.dtype), old), (start,))


def _bigram_drafts(hist: jax.Array, valid: jax.Array, P: jax.Array,
                   pending: jax.Array, gamma: int) -> jax.Array:
    """Draft gamma tokens per row by most-recent bigram match.

    hist: (B, St) codebook-0 token history (prompt + generated; position P
    holds `pending`, positions > P are stale). valid: (B, St) bool --
    positions whose tokens are real. Finds the latest j with
    (hist[j], hist[j+1]) == (hist[P-1], pending) and j+1 < P, and proposes
    hist[j+2 : j+2+gamma]. No match (or a match whose continuation runs
    into unwritten territory) just yields junk drafts -- the verify pass
    rejects them; correctness never depends on draft quality."""
    B, St = hist.shape
    idx = jnp.arange(St - 1)
    prev = jnp.take_along_axis(hist, jnp.maximum(P - 1, 0)[:, None],
                               axis=1)  # (B, 1)
    m = ((hist[:, :-1] == prev) & (hist[:, 1:] == pending[:, None])
         & valid[:, :-1] & valid[:, 1:]
         & (idx[None] + 1 < P[:, None]))
    j = jnp.max(jnp.where(m, idx[None], -1), axis=1)            # (B,)
    src = jnp.clip(j + 2, 0, St - 1)
    hist_pad = jnp.pad(hist, ((0, 0), (0, gamma)))
    return jax.vmap(
        lambda h, s: jax.lax.dynamic_slice(h, (s,), (gamma,)))(hist_pad, src)


class SpecLoopResult(NamedTuple):
    hist: jax.Array        # (B, St) history buffer with emitted tokens
    mask_buf: jax.Array    # (B, Sc) -- 1 exactly on KV-valid slots
    cache: Any             # per-row index == P (pending's slot, KV absent)
    last_pos: jax.Array    # (B,) position id of slot P-1
    P: jax.Array           # (B,) slot of the final pending token
    finished: jax.Array    # (B,)
    num_gen: jax.Array     # (B,) emitted tokens INCLUDING the pending one
    iterations: jax.Array  # scalar verify iterations run


def spec_decode_loop(params, hist, mask_buf, cache, pending, last_pos, P,
                     offset_tab, *, cfg: LibraConfig, gen: GenerationConfig,
                     max_new: int) -> SpecLoopResult:
    """The draft/verify loop over PER-ROW cache indices, shared by
    Generator spec decode and ChatSession spec turns.

    Preconditions: hist (B, St) holds the real token history up to and
    including `pending` at slot P (positions > P stale); St >= max(P) +
    max_new + gamma + 1; mask_buf is 1 exactly on KV-valid slots (slot P
    is NOT yet valid -- pending's K/V lands during its verify pass);
    cache.index == P (B,); last_pos is slot P-1's position id. num_gen
    starts at 1 (the pending token is already emitted)."""
    assert gen.spec_decode > 0 and not gen.do_sample
    gamma = int(gen.spec_decode)
    K = gamma + 1
    B, St = hist.shape
    Q = cfg.vision_codebook_num
    Mv = cfg.max_vision_token_length

    finished = pending == gen.eos_token_id
    num_gen = jnp.ones((B,), jnp.int32)

    def cond(state):
        it, finished = state[0], state[6]
        return (it < max_new) & ~jnp.all(finished)

    def body(state):
        (it, hist, mask_buf, cache, pending, last_pos, finished, P,
         num_gen) = state
        idx = jnp.arange(St)
        # mask_buf may be longer than the history buffer (quantized caches
        # round their length up to 128); validity only needs the hist span
        valid = (mask_buf[:, :St] > 0) | (idx[None] == P[:, None])
        drafts = _bigram_drafts(hist, valid, P, pending, gamma)  # (B, gamma)

        # ---- verify: one (gamma+1)-token cached forward ----
        x = jnp.concatenate([pending[:, None], drafts], axis=1)  # (B, K)
        all_w = jnp.ones((K,), bool)
        mask_v = jax.vmap(_update_window, in_axes=(0, None, 0, None))(
            mask_buf, jnp.ones((K,), mask_buf.dtype), P, all_w)
        pos_new = last_pos[:, None] + 1 + jnp.arange(K)[None]    # (B, K)
        if cfg.use_2d_rope:
            pos_ids = (pos_new[:, None, :]
                       + offset_tab[Mv][None, :, None])          # (B, 2, K)
        else:
            pos_ids = pos_new
        vi_blk = jnp.full((B, K), Mv, jnp.int32)
        ids_blk = jnp.broadcast_to(x[None], (Q, B, K)).astype(hist.dtype)
        out = M.forward(params, cfg, ids_blk, mask_v, vi_blk, None,
                        position_ids=pos_ids, cache=cache, lang_only=True)
        # text-mode argmax over the combined vocab == argmax over the
        # language head alone: assemble_logits -inf's the entire vision
        # slice (which sits AFTER the text slice, so ids coincide), and
        # force_eoi_newline is identity at vision_index == text
        tl = M.compute_text_logits(params, out.hidden_states)
        c = jnp.argmax(tl, axis=-1).astype(hist.dtype)           # (B, K)

        # ---- accept the longest matching draft prefix + the bonus ----
        ok = drafts == c[:, :gamma]                              # (B, gamma)
        a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
        bonus = jnp.take_along_axis(c, a[:, None], axis=1)[:, 0]
        ar = jnp.arange(K)[None]
        dpad = jnp.concatenate([drafts, drafts[:, -1:]], axis=1)
        e = jnp.where(ar == a[:, None], bonus[:, None], dpad)    # (B, K)

        # EOS / budget truncation (num_gen already counts the pending tok)
        eos_in = (e == gen.eos_token_id) & (ar <= a[:, None])
        any_eos = jnp.any(eos_in, axis=1)
        first_eos = jnp.argmax(eos_in, axis=1)
        cnt = jnp.where(any_eos, first_eos + 1, a + 1)
        cnt = jnp.minimum(cnt, max_new - num_gen)
        cnt = jnp.where(finished, 0, cnt)
        num_gen = num_gen + cnt
        new_finished = (finished
                        | (any_eos & (first_eos < cnt))
                        | (num_gen >= max_new))

        # ---- write back ----
        write = ar < cnt[:, None]                                # (B, K)
        hist = jax.vmap(_update_window)(hist, e, P + 1, write)
        # keep mask 1 only on the cnt kept K/V slots [P, P+cnt); the new
        # pending (bonus) slot P+cnt stays 0 until it is fed next iteration
        mask_buf = jax.vmap(_update_window, in_axes=(0, 0, 0, None))(
            mask_v, write.astype(mask_buf.dtype), P, all_w)
        cache = out.cache._replace(index=P + cnt)
        pending = jnp.where(cnt > 0, bonus, pending)
        last_pos = last_pos + cnt
        P = P + cnt
        return (it + 1, hist, mask_buf, cache, pending, last_pos,
                new_finished, P, num_gen)

    init = (jnp.int32(0), hist, mask_buf, cache, pending, last_pos,
            finished, P, num_gen)
    (it, hist, mask_buf, cache, pending, last_pos, finished, P,
     num_gen) = jax.lax.while_loop(cond, body, init)
    return SpecLoopResult(hist=hist, mask_buf=mask_buf, cache=cache,
                          last_pos=last_pos, P=P, finished=finished,
                          num_gen=num_gen, iterations=it)


def _spec_generate_impl(params, input_ids, attention_mask, vision_indices,
                        contiguous_signal, rng, vq_params=None, pixels=None,
                        img_start=None, *, cfg: LibraConfig,
                        gen: GenerationConfig, vq_cfg=None,
                        cache_shardings=None):
    """Drop-in replacement for generation._generate_impl (same signature,
    same GenerateResult contract) when gen.spec_decode = gamma > 0."""
    assert gen.spec_decode > 0 and not gen.do_sample \
        and gen.decode_modality == "text"
    K = int(gen.spec_decode) + 1
    Q, B, N = input_ids.shape
    S = N + gen.max_new_tokens

    st = _prefill(params, input_ids, attention_mask, vision_indices,
                  contiguous_signal, vq_params, pixels, img_start, cfg=cfg,
                  gen=gen, vq_cfg=vq_cfg, cache_shardings=cache_shardings,
                  extra_cache=K)
    if gen.max_new_tokens == 0:
        return GenerateResult(sequences=st.tokens,
                              num_generated=jnp.zeros((B,), jnp.int32))

    # verify blocks probe up to K-1 slots past a row's budget end: pad the
    # history buffer so the per-row window writes stay statically in bounds
    hist = jnp.pad(st.tokens[0], ((0, 0), (0, K)))
    # batch rows accept different counts per iteration: switch the cache to
    # per-row (B,) write indices (the serving engine's per-slot mode)
    cache = st.cache._replace(index=jnp.full((B,), N, jnp.int32))

    # the pending token: already emitted (written + counted) but its K/V is
    # not in the cache yet; it is fed as the verify block's first input
    pending = jnp.argmax(st.logits[0], axis=-1).astype(hist.dtype)  # (B,)
    hist = hist.at[:, N].set(pending)
    P = jnp.full((B,), N, jnp.int32)          # cache slot of the pending tok

    res = spec_decode_loop(params, hist, st.mask_buf, cache, pending,
                           st.last_pos, P, st.offset_tab, cfg=cfg, gen=gen,
                           max_new=gen.max_new_tokens)
    # the generated region is identical across codebooks (text decode);
    # the prompt region keeps each codebook's own ids
    sequences = st.tokens.at[:, :, N:].set(
        jnp.broadcast_to(res.hist[None, :, N:S], (Q, B, S - N)))
    return GenerateResult(sequences=sequences, num_generated=res.num_gen,
                          iterations=res.iterations)
