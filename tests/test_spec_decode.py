"""N-gram speculative decoding: exact parity with the standard greedy
decode loop (libra_tpu/spec_decode.py).

Spec decode must be invisible in outputs: every emitted token is the target
model's own greedy argmax, so sequences and num_generated match the plain
`_generate_impl` while_loop token-for-token -- whatever the draft quality."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import LibraConfig
from libra_tpu.generation import GenerationConfig, Generator
from libra_tpu.models import libra as M
from libra_tpu.spec_decode import _bigram_drafts


def _prompt_with_image(cfg, B, text_len, seed=0):
    Mv = cfg.max_vision_token_length
    N = text_len + Mv
    rs = np.random.RandomState(seed)
    ids = rs.randint(3, cfg.vocab_size,
                     size=(cfg.vision_codebook_num, B, N)).astype(np.int64)
    vi = np.full((B, N), Mv, np.int64)
    for b in range(B):
        s = 1 + b
        vi[b, s:s + Mv] = np.arange(Mv)
        ids[:, b, s:s + Mv] = rs.randint(
            cfg.vocab_size, cfg.vocab_size + cfg.vision_vocab_size, size=Mv)
    sig = rs.randn(B, N, cfg.contiguous_signal_size).astype(np.float32)
    sig[vi >= Mv] = 0.0
    return {"input_ids": ids, "attention_mask": np.ones((B, N), np.int64),
            "vision_indices": vi, "coninous_signal": sig}


def _assert_parity(spec, ref, N):
    """Sequences equal on the prompt + the generated span of every row;
    positions past a row's EOS are loop-timing artifacts in BOTH impls and
    are excluded."""
    ng_s = np.asarray(spec.num_generated)
    ng_r = np.asarray(ref.num_generated)
    np.testing.assert_array_equal(ng_s, ng_r)
    seq_s, seq_r = np.asarray(spec.sequences), np.asarray(ref.sequences)
    assert seq_s.shape == seq_r.shape
    for b in range(seq_r.shape[1]):
        end = N + ng_r[b]
        np.testing.assert_array_equal(seq_s[:, b, :end], seq_r[:, b, :end])


@pytest.fixture(scope="module")
def stack():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_spec_matches_greedy(stack):
    cfg, params = stack
    inp = _prompt_with_image(cfg, B=2, text_len=5, seed=1)
    N = inp["vision_indices"].shape[1]
    g = Generator(params, cfg)
    base = GenerationConfig(max_new_tokens=12, eos_token_id=-1,
                            decode_modality="text")
    ref = g(inp, base)
    spec = g(inp, dataclasses.replace(base, spec_decode=3))
    _assert_parity(spec, ref, N)
    assert (np.asarray(spec.num_generated) == 12).all()


def test_spec_matches_greedy_with_eos_desync(stack):
    """Pick an EOS id that actually occurs mid-stream so rows finish at
    different iterations (per-row cache indices / truncation paths)."""
    cfg, params = stack
    inp = _prompt_with_image(cfg, B=3, text_len=4, seed=2)
    N = inp["vision_indices"].shape[1]
    g = Generator(params, cfg)
    probe = g(inp, GenerationConfig(max_new_tokens=10, eos_token_id=-1,
                                    decode_modality="text"))
    eos = int(np.asarray(probe.sequences)[0, 0, N + 4])
    base = GenerationConfig(max_new_tokens=10, eos_token_id=eos,
                            decode_modality="text")
    ref = g(inp, base)
    spec = g(inp, dataclasses.replace(base, spec_decode=4))
    _assert_parity(spec, ref, N)


def test_spec_matches_kv_quant(stack):
    """int8 head-major KV cache under spec decode on CPU, where the fused
    kernel is inactive: the gamma+1-token verify runs the XLA dequant path
    -- results must match the standard decode. (The kernel path itself,
    Nq<=8 q-blocks, is covered by test_spec_kv_quant_through_kernel in
    interpret mode.)"""
    cfg, params = stack
    inp = _prompt_with_image(cfg, B=2, text_len=5, seed=3)
    N = inp["vision_indices"].shape[1]
    g = Generator(params, cfg)
    base = GenerationConfig(max_new_tokens=9, eos_token_id=-1,
                            decode_modality="text", kv_quant=True)
    ref = g(inp, base)
    spec = g(inp, dataclasses.replace(base, spec_decode=2))
    _assert_parity(spec, ref, N)


def test_spec_matches_2d_rope():
    cfg = LibraConfig.tiny(use_2d_rope=True)
    params = M.init_params(jax.random.PRNGKey(1), cfg)
    inp = _prompt_with_image(cfg, B=2, text_len=4, seed=4)
    N = inp["vision_indices"].shape[1]
    g = Generator(params, cfg)
    base = GenerationConfig(max_new_tokens=8, eos_token_id=-1,
                            decode_modality="text")
    ref = g(inp, base)
    spec = g(inp, dataclasses.replace(base, spec_decode=3))
    _assert_parity(spec, ref, N)


def test_bigram_drafts_mechanism():
    """Handcrafted history: drafts copy the continuation of the most
    recent prior bigram occurrence."""
    #        0  1  2  3  4  5  6   P=7 (pending=6)
    hist = jnp.asarray([[5, 6, 7, 8, 9, 5, 6, 6, 0, 0, 0, 0]])
    valid = jnp.asarray([[True] * 8 + [False] * 4])
    P = jnp.asarray([7])
    pending = jnp.asarray([6])
    # bigram (hist[6]=6? no: prev = hist[P-1]=hist[6]=6, pending=6) ->
    # matches (6,6)? positions j with hist[j]==6, hist[j+1]==6: j=6 needs
    # j+1<7 -> excluded. No match -> junk drafts (clip path).
    d = _bigram_drafts(hist, valid, P, pending, gamma=3)
    assert d.shape == (1, 3)

    # now a real match: prev=9? build: pending=6, prev=hist[P-1]=5 at P=6
    hist2 = jnp.asarray([[5, 6, 7, 8, 9, 5, 6, 0, 0, 0, 0, 0]])
    valid2 = jnp.asarray([[True] * 7 + [False] * 5])
    d2 = _bigram_drafts(hist2, valid2, jnp.asarray([6]), jnp.asarray([6]),
                        gamma=3)
    # bigram (5, 6) occurs at j=0 (j+1=1 < 6): drafts = hist[2:5] = 7,8,9
    np.testing.assert_array_equal(np.asarray(d2)[0], [7, 8, 9])


def test_spec_rejects_sampling_and_dual(stack):
    cfg, params = stack
    g = Generator(params, cfg)
    inp = _prompt_with_image(cfg, B=1, text_len=3, seed=5)
    with pytest.raises(ValueError):
        g(inp, GenerationConfig(max_new_tokens=4, do_sample=True,
                                decode_modality="text", spec_decode=3))
    # t2i prompt (ends at BOI) resolves to dual -> unsupported
    Mv = cfg.max_vision_token_length
    ids = np.random.RandomState(6).randint(
        3, cfg.vocab_size, size=(cfg.vision_codebook_num, 1, 5))
    ids[:, :, -1] = cfg.vocab_size + cfg.vision_vocab_size - 2
    vi = np.full((1, 5), Mv, np.int64)
    vi[:, -1] = 0
    t2i = {"input_ids": ids, "attention_mask": np.ones((1, 5), np.int64),
           "vision_indices": vi,
           "coninous_signal": np.zeros((1, 5, cfg.contiguous_signal_size),
                                       np.float32)}
    with pytest.raises(ValueError):
        g(t2i, GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                                spec_decode=3))


def test_spec_kv_quant_through_kernel(monkeypatch, stack):
    """Force the Pallas decode-attention kernel (interpret mode): the
    normal decode runs it at Nq=1 and the spec verify at Nq=gamma+1; both
    paths must agree token-for-token."""
    from libra_tpu.ops.pallas import decode_attention as DA
    monkeypatch.setattr(DA, "INTERPRET", True)
    cfg, params = stack
    # kernel needs 128-aligned head_dim: widen heads
    cfg = LibraConfig.tiny(hidden_size=256, num_attention_heads=2)
    params = M.init_params(jax.random.PRNGKey(2), cfg)
    inp = _prompt_with_image(cfg, B=2, text_len=4, seed=7)
    N = inp["vision_indices"].shape[1]
    g = Generator(params, cfg)
    base = GenerationConfig(max_new_tokens=8, eos_token_id=-1,
                            decode_modality="text", kv_quant=True)
    ref = g(inp, base)
    spec = g(inp, dataclasses.replace(base, spec_decode=3))
    _assert_parity(spec, ref, N)
