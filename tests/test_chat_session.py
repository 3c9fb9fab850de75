"""Incremental multi-turn ChatSession: every turn's tokens must equal a
fresh full-prompt Generator run over the same concatenated token history
(causal attention makes prefix-cached continuation exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.chat import ChatSession
from libra_tpu.config import LibraConfig
from libra_tpu.generation import GenerationConfig, Generator
from libra_tpu.models import libra as M

from tests.test_core_model import make_inputs


@pytest.fixture(scope="module")
def tiny():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _turn1_inputs(cfg, B, text_len=4, seed=0):
    ids, mask, vi, sig = make_inputs(cfg, B=B, text_len=text_len, seed=seed)
    return {"input_ids": np.asarray(ids),
            "attention_mask": np.ones_like(np.asarray(mask)),
            "vision_indices": np.asarray(vi),
            "coninous_signal": np.asarray(sig)}


def _text_delta(cfg, B, n, seed):
    rng = np.random.RandomState(seed)
    Q = cfg.vision_codebook_num
    ids = rng.randint(3, cfg.vocab_size, size=(Q, B, n)).astype(np.int64)
    ids[1:] = ids[0]
    return {"input_ids": ids,
            "vision_indices": np.full((B, n), cfg.max_vision_token_length,
                                      np.int64)}


def _concat_history(cfg, turns, answers):
    """Token-level history: turn deltas interleaved with generated answers
    (per-row answer lengths may differ; pad slots carry mask 0)."""
    Q = cfg.vision_codebook_num
    B = turns[0]["input_ids"].shape[1]
    Mv = cfg.max_vision_token_length
    ids, mask, vi, sig = [], [], [], []

    def push(d, m=None):
        n = d["input_ids"].shape[-1]
        ids.append(np.asarray(d["input_ids"]))
        if m is None:
            dm = d.get("attention_mask")
            m = (np.ones((B, n), np.int64) if dm is None
                 else np.asarray(dm, np.int64))
        mask.append(m)
        vi.append(np.asarray(d["vision_indices"]))
        s = d.get("coninous_signal")
        sig.append(np.zeros((B, n, cfg.contiguous_signal_size), np.float32)
                   if s is None else np.asarray(s))

    for i, t in enumerate(turns):
        push(t)
        if i < len(answers):
            toks, num = answers[i]            # (Q, B, T), (B,)
            T = toks.shape[-1]
            m = (np.arange(T)[None] < num[:, None]).astype(np.int64)
            # vision_indices advance inside generated image blocks exactly
            # as the decode loop advances them: clamp(prev_vi + k, Mv)
            prev_vi = vi[-1][:, -1]
            steps = np.arange(1, T + 1)[None]
            gvi = np.minimum(prev_vi[:, None] + steps, Mv)
            # rows keep their final vi on masked (post-EOS) slots
            last_real = np.take_along_axis(
                gvi, np.maximum(num[:, None] - 1, 0), axis=1)
            gvi = np.where(m == 1, gvi, last_real)
            push({"input_ids": toks, "vision_indices": gvi}, m=m)
    return {"input_ids": np.concatenate(ids, axis=-1),
            "attention_mask": np.concatenate(mask, axis=-1),
            "vision_indices": np.concatenate(vi, axis=-1),
            "coninous_signal": np.concatenate(sig, axis=1)}


def test_two_turns_match_full_reprefill(tiny):
    cfg, params = tiny
    B, max_new = 2, 5
    gen = GenerationConfig(eos_token_id=-1)
    sess = ChatSession(params, cfg, batch=B, max_len=128, gen=gen,
                       delta_bucket=4)       # bucket forces delta padding
    t1 = _turn1_inputs(cfg, B)
    r1 = sess.ask(t1, max_new_tokens=max_new)
    N1 = t1["input_ids"].shape[-1]
    Nb1 = N1 + (-N1) % 4
    assert list(sess._fns) == [(Nb1, True, max_new, False, False, True)]

    # turn 1 must equal a plain Generator run on the same prompt
    g = Generator(params, cfg)
    want1 = g(t1, GenerationConfig(max_new_tokens=max_new, eos_token_id=-1))
    np.testing.assert_array_equal(
        np.asarray(r1.tokens),
        np.asarray(want1.sequences)[:, :, t1["input_ids"].shape[-1]:])

    # turn 2 (text question) must equal full re-prefill of the history
    t2 = _text_delta(cfg, B, 5, seed=9)      # pads 5 -> 8 in the bucket
    r2 = sess.ask(t2, max_new_tokens=max_new)
    a1 = (np.asarray(r1.tokens), np.asarray(r1.num_generated))
    t2p = dict(t2)
    pad = (-5) % 4
    t2p["input_ids"] = np.pad(t2["input_ids"], ((0, 0), (0, 0), (pad, 0)))
    t2p["vision_indices"] = np.pad(
        t2["vision_indices"], ((0, 0), (pad, 0)),
        constant_values=cfg.max_vision_token_length)
    t2p["attention_mask"] = np.pad(np.ones((B, 5), np.int64),
                                   ((0, 0), (pad, 0)))
    full = _concat_history(cfg, [t1, t2p], [a1])
    want2 = g(full, GenerationConfig(max_new_tokens=max_new,
                                     eos_token_id=-1))
    np.testing.assert_array_equal(
        np.asarray(r2.tokens),
        np.asarray(want2.sequences)[:, :, full["input_ids"].shape[-1]:])


def test_eos_row_freezes_and_next_turn_matches(tiny):
    cfg, params = tiny
    g = Generator(params, cfg)
    t1 = _turn1_inputs(cfg, 1, seed=3)
    first = int(np.asarray(g(t1, GenerationConfig(
        max_new_tokens=1, eos_token_id=-1)).sequences)[0, 0, -1])

    sess = ChatSession(params, cfg, batch=1, max_len=128,
                       gen=GenerationConfig(eos_token_id=first),
                       delta_bucket=1)
    r1 = sess.ask(t1, max_new_tokens=4)
    assert int(r1.num_generated[0]) == 1          # stopped at "EOS"
    assert int(np.asarray(r1.tokens)[0, 0, 0]) == first

    t2 = _text_delta(cfg, 1, 3, seed=11)
    r2 = sess.ask(t2, max_new_tokens=4)
    # full history: prompt + the one emitted token (visible, like the v1
    # template's answer</s>) + the next question
    a1 = (np.asarray(r1.tokens)[:, :, :1], np.ones((1,), np.int32))
    full = _concat_history(cfg, [t1, t2], [a1])
    want = g(full, GenerationConfig(max_new_tokens=4, eos_token_id=first))
    got = np.asarray(r2.tokens)[:, :, :int(r2.num_generated[0])]
    N = full["input_ids"].shape[-1]
    np.testing.assert_array_equal(
        got, np.asarray(want.sequences)[:, :, N:N + got.shape[-1]])


def test_session_int8_kv_matches_generator(tiny):
    from libra_tpu.quantization import quantize_params

    cfg, params = tiny
    qparams = quantize_params(params, min_elems=0)
    gen = GenerationConfig(eos_token_id=-1, kv_quant=True)
    sess = ChatSession(qparams, cfg, batch=2, max_len=96, gen=gen,
                       delta_bucket=1)
    t1 = _turn1_inputs(cfg, 2, seed=5)
    r1 = sess.ask(t1, max_new_tokens=4)
    g = Generator(qparams, cfg)
    want = g(t1, GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                                  kv_quant=True))
    np.testing.assert_array_equal(
        np.asarray(r1.tokens),
        np.asarray(want.sequences)[:, :, t1["input_ids"].shape[-1]:])

    t2 = _text_delta(cfg, 2, 4, seed=6)
    r2 = sess.ask(t2, max_new_tokens=4)
    full = _concat_history(cfg, [t1, t2],
                           [(np.asarray(r1.tokens),
                             np.asarray(r1.num_generated))])
    want2 = g(full, GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                                     kv_quant=True))
    np.testing.assert_array_equal(
        np.asarray(r2.tokens),
        np.asarray(want2.sequences)[:, :, full["input_ids"].shape[-1]:])


def test_t2i_turn_decodes_dual_path(tiny):
    """A later turn ending at BOI auto-resolves to the dual-path body and
    continues the image block."""
    cfg, params = tiny
    Mv = cfg.max_vision_token_length
    sess = ChatSession(params, cfg, batch=1, max_len=128,
                       gen=GenerationConfig(eos_token_id=-1),
                       delta_bucket=1)
    t1 = _text_delta(cfg, 1, 4, seed=21)
    r1 = sess.ask(t1, max_new_tokens=3)

    t2 = _text_delta(cfg, 1, 3, seed=22)
    t2["input_ids"][:, :, -1] = cfg.vocab_size + cfg.vision_vocab_size - 2
    t2["vision_indices"][:, -1] = 0               # delta ends at BOI
    r2 = sess.ask(t2, max_new_tokens=4)
    assert (3, False, 4, False, False, False) in sess._fns   # dual-path body
    new = np.asarray(r2.tokens)
    assert (new >= cfg.vocab_size).all()          # image continues

    full = _concat_history(cfg, [t1, t2],
                           [(np.asarray(r1.tokens),
                             np.asarray(r1.num_generated))])
    want = Generator(params, cfg)(
        full, GenerationConfig(max_new_tokens=4, eos_token_id=-1))
    np.testing.assert_array_equal(
        new, np.asarray(want.sequences)[:, :, full["input_ids"].shape[-1]:])


def test_session_2d_rope(tiny):
    cfg2r = LibraConfig.tiny(use_2d_rope=True)
    params = M.init_params(jax.random.PRNGKey(2), cfg2r)
    sess = ChatSession(params, cfg2r, batch=1, max_len=128,
                       gen=GenerationConfig(eos_token_id=-1),
                       delta_bucket=1)
    t1 = _turn1_inputs(cfg2r, 1, seed=7)
    r1 = sess.ask(t1, max_new_tokens=4)
    g = Generator(params, cfg2r)
    want1 = g(t1, GenerationConfig(max_new_tokens=4, eos_token_id=-1))
    np.testing.assert_array_equal(
        np.asarray(r1.tokens),
        np.asarray(want1.sequences)[:, :, t1["input_ids"].shape[-1]:])

    t2 = _text_delta(cfg2r, 1, 3, seed=8)
    r2 = sess.ask(t2, max_new_tokens=4)
    full = _concat_history(cfg2r, [t1, t2],
                           [(np.asarray(r1.tokens),
                             np.asarray(r1.num_generated))])
    want2 = g(full, GenerationConfig(max_new_tokens=4, eos_token_id=-1))
    np.testing.assert_array_equal(
        np.asarray(r2.tokens),
        np.asarray(want2.sequences)[:, :, full["input_ids"].shape[-1]:])


def test_session_guards(tiny):
    cfg, params = tiny
    with pytest.raises(NotImplementedError):
        ChatSession(params, LibraConfig.tiny(vision_prediction_mode="2d"),
                    batch=1, max_len=64)
    sess = ChatSession(params, cfg, batch=1, max_len=32,
                       gen=GenerationConfig(eos_token_id=-1))
    with pytest.raises(ValueError, match="batch"):
        sess.ask(_text_delta(cfg, 2, 3, seed=0))
    with pytest.raises(ValueError, match="slots"):
        sess.ask(_text_delta(cfg, 1, 3, seed=0), max_new_tokens=64)


def test_turn_with_pixels_matches_preencoded(tiny):
    """A raw-pixels turn (CLIP+VQGAN encode fused into the delta prefill)
    emits exactly the tokens of the same turn pre-encoded on the host."""
    from libra_tpu.config import VQGANConfig
    from libra_tpu.data.caption_format import IMG_PH
    from libra_tpu.models import vqgan as vqgan_model
    from libra_tpu.tokenization import (ImageTokenizer, LibraTokenizer,
                                        SimpleTextTokenizer)

    cfg, params = tiny
    vq_cfg = VQGANConfig.tiny()
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
    img_tok = ImageTokenizer(vq_cfg, vq_params, token_offset=cfg.vocab_size,
                             max_vision_token_length=cfg.max_vision_token_length)
    joint = LibraTokenizer(text_tok, img_tok)
    Mv = cfg.max_vision_token_length
    gen = GenerationConfig(eos_token_id=-1)

    img = np.random.RandomState(0).randn(28, 28, 3).astype(np.float32)
    prompt = " ".join([IMG_PH] * Mv) + " describe:"
    pre = joint([{"language": [prompt], "vision": [img]}])

    sess_a = ChatSession(params, cfg, batch=1, max_len=96, gen=gen,
                         delta_bucket=4)
    ra = sess_a.ask({"input_ids": np.asarray(pre["input_ids"]),
                     "vision_indices": np.asarray(pre["vision_indices"]),
                     "coninous_signal": np.asarray(pre["coninous_signal"])},
                    max_new_tokens=4)

    t = text_tok([prompt])
    ids = np.asarray(t["input_ids"], np.int64)
    pos = int(np.nonzero(ids[0] == text_tok.img_ph_token_id)[0][0])
    vi = np.full((1, ids.shape[-1]), Mv, np.int64)
    vi[0, pos:pos + Mv] = np.arange(Mv)
    sess_b = ChatSession(params, cfg, batch=1, max_len=96, gen=gen,
                         delta_bucket=4, vq_params=vq_params, vq_cfg=vq_cfg)
    rb = sess_b.ask({"input_ids": np.broadcast_to(
                        ids[None], (cfg.vision_codebook_num,) + ids.shape),
                     "vision_indices": vi,
                     "pixels": img[None], "img_start": np.array([pos])},
                    max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(rb.tokens),
                                  np.asarray(ra.tokens))

    with pytest.raises(ValueError, match="vq_params"):
        sess_a.ask({"input_ids": ids[None].repeat(2, 0),
                    "vision_indices": vi,
                    "pixels": img[None], "img_start": np.array([pos])})


def test_prefill_only_turn(tiny):
    """max_new_tokens=0 is a legal prefill-only turn (inject context,
    generate nothing): zero tokens come back, the cache/history advance,
    and the NEXT turn equals a full re-prefill of both deltas."""
    cfg, params = tiny
    B, max_new = 2, 4
    gen = GenerationConfig(eos_token_id=-1)
    sess = ChatSession(params, cfg, batch=B, max_len=128, gen=gen,
                       delta_bucket=1)
    t1 = _turn1_inputs(cfg, B)
    r1 = sess.ask(t1, max_new_tokens=0)
    assert np.asarray(r1.tokens).shape[-1] == 0
    assert (np.asarray(r1.num_generated) == 0).all()

    t2 = _text_delta(cfg, B, 3, seed=11)
    r2 = sess.ask(t2, max_new_tokens=max_new)
    full = _concat_history(cfg, [t1, t2], [])
    want = Generator(params, cfg)(
        full, GenerationConfig(max_new_tokens=max_new, eos_token_id=-1))
    np.testing.assert_array_equal(
        np.asarray(r2.tokens),
        np.asarray(want.sequences)[:, :, full["input_ids"].shape[-1]:])


def test_spec_session_matches_full_reprefill(tiny):
    """Speculative chat turns (per-row acceptance inside the resident
    cache, VERDICT r3 item 8): every turn's tokens must equal the plain
    session AND a fresh full-history Generator run -- spec decode is
    exact, so the cache-reuse parity contract is unchanged."""
    cfg, params = tiny
    B, max_new = 2, 6
    gen = GenerationConfig(eos_token_id=-1)
    sgen = GenerationConfig(eos_token_id=-1, spec_decode=3)
    plain = ChatSession(params, cfg, batch=B, max_len=128, gen=gen,
                        delta_bucket=4)
    spec = ChatSession(params, cfg, batch=B, max_len=128, gen=sgen,
                       delta_bucket=4)
    t1 = _turn1_inputs(cfg, B)
    r1p = plain.ask(t1, max_new_tokens=max_new)
    r1s = spec.ask(t1, max_new_tokens=max_new)
    np.testing.assert_array_equal(np.asarray(r1s.tokens),
                                  np.asarray(r1p.tokens))
    np.testing.assert_array_equal(np.asarray(r1s.num_generated),
                                  np.asarray(r1p.num_generated))

    t2 = _text_delta(cfg, B, 5, seed=9)
    r2p = plain.ask(t2, max_new_tokens=max_new)
    r2s = spec.ask(t2, max_new_tokens=max_new)
    np.testing.assert_array_equal(np.asarray(r2s.tokens),
                                  np.asarray(r2p.tokens))

    # and against ground truth: full re-prefill of the token history
    g = Generator(params, cfg)
    t2p = dict(t2)
    pad = (-5) % 4
    t2p["input_ids"] = np.pad(t2["input_ids"], ((0, 0), (0, 0), (pad, 0)))
    t2p["vision_indices"] = np.pad(
        t2["vision_indices"], ((0, 0), (pad, 0)),
        constant_values=cfg.max_vision_token_length)
    t2p["attention_mask"] = np.pad(np.ones((B, 5), np.int64),
                                   ((0, 0), (pad, 0)))
    full = _concat_history(cfg, [t1, t2p],
                           [(np.asarray(r1p.tokens),
                             np.asarray(r1p.num_generated))])
    want = g(full, GenerationConfig(max_new_tokens=max_new,
                                    eos_token_id=-1))
    np.testing.assert_array_equal(
        np.asarray(r2s.tokens),
        np.asarray(want.sequences)[:, :, full["input_ids"].shape[-1]:])


def test_spec_session_eos_and_int8_kv(tiny):
    """Spec turns over the int8 KV cache; a row stopping at EOS freezes
    exactly as in the lockstep body and the EOS stays visible."""
    from libra_tpu.quantization import quantize_params

    cfg, params = tiny
    qparams = quantize_params(params, min_elems=0)
    g = Generator(qparams, cfg)
    t1 = _turn1_inputs(cfg, 1, seed=3)
    first = int(np.asarray(g(t1, GenerationConfig(
        max_new_tokens=1, eos_token_id=-1,
        kv_quant=True)).sequences)[0, 0, -1])

    sess = ChatSession(qparams, cfg, batch=1, max_len=128,
                       gen=GenerationConfig(eos_token_id=first,
                                            kv_quant=True, spec_decode=2),
                       delta_bucket=1)
    r1 = sess.ask(t1, max_new_tokens=4)
    assert int(r1.num_generated[0]) == 1          # stopped at "EOS"
    assert int(np.asarray(r1.tokens)[0, 0, 0]) == first

    t2 = _text_delta(cfg, 1, 3, seed=11)
    r2 = sess.ask(t2, max_new_tokens=4)
    a1 = (np.asarray(r1.tokens)[:, :, :1], np.ones((1,), np.int32))
    full = _concat_history(cfg, [t1, t2], [a1])
    want = g(full, GenerationConfig(max_new_tokens=4, eos_token_id=first,
                                    kv_quant=True))
    got = np.asarray(r2.tokens)[:, :, :int(r2.num_generated[0])]
    N = full["input_ids"].shape[-1]
    np.testing.assert_array_equal(
        got, np.asarray(want.sequences)[:, :, N:N + got.shape[-1]])


def test_spec_session_guards(tiny):
    """Spec sessions are greedy text-only: sampling and dual-modality
    turns fail loudly."""
    cfg, params = tiny
    with pytest.raises(ValueError, match="greedy"):
        ChatSession(params, cfg, batch=1, max_len=64,
                    gen=GenerationConfig(eos_token_id=-1, spec_decode=2,
                                         do_sample=True))
    sess = ChatSession(params, cfg, batch=1, max_len=64,
                       gen=GenerationConfig(eos_token_id=-1, spec_decode=2),
                       delta_bucket=1)
    t = _text_delta(cfg, 1, 3, seed=0)
    t["input_ids"][:, :, -1] = cfg.vocab_size + 1
    t["vision_indices"][:, -1] = 0                # delta ends at BOI
    with pytest.raises(ValueError, match="dual"):
        sess.ask(t, max_new_tokens=2)
