"""Text-only decode (decode_modality='text') parity.

assemble_logits puts -inf on the whole vision vocab (incl. BOI) at text
positions, so a sequence whose prompt ends in text provably never re-enters
vision during decode -- statically skipping the vision path must therefore
reproduce the dual-path decode exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import LibraConfig
from libra_tpu.generation import GenerationConfig, Generator
from libra_tpu.models import libra as M


def _prompt_with_image(cfg, B, text_len, seed=0):
    Mv = cfg.max_vision_token_length
    N = text_len + Mv
    rs = np.random.RandomState(seed)
    ids = rs.randint(3, cfg.vocab_size,
                     size=(cfg.vision_codebook_num, B, N)).astype(np.int64)
    vi = np.full((B, N), Mv, np.int64)
    starts = [1 + b for b in range(B)]
    for b, s in enumerate(starts):
        vi[b, s:s + Mv] = np.arange(Mv)
        ids[:, b, s:s + Mv] = rs.randint(
            cfg.vocab_size, cfg.vocab_size + cfg.vision_vocab_size, size=Mv)
    sig = rs.randn(B, N, cfg.contiguous_signal_size).astype(np.float32)
    sig[vi >= Mv] = 0.0
    return {"input_ids": ids, "attention_mask": np.ones((B, N), np.int64),
            "vision_indices": vi, "coninous_signal": sig}


def test_lang_only_decode_forward_matches_dense():
    """One cached decode step on a text token: lang_only skips the vision
    path but every skipped value fed only discarded where() branches."""
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    B, Mv = 2, cfg.max_vision_token_length
    inp = _prompt_with_image(cfg, B, text_len=5)
    N = inp["vision_indices"].shape[1]
    S = N + 4

    @jax.jit
    def prefill():
        cache = M.init_cache(cfg, B, S)
        mask = jnp.zeros((B, S), jnp.int32).at[:, :N].set(
            jnp.asarray(inp["attention_mask"], jnp.int32))
        pos = M.position_ids_from_mask(jnp.asarray(inp["attention_mask"]))
        out = M.forward(params, cfg, jnp.asarray(inp["input_ids"]), mask,
                        jnp.asarray(inp["vision_indices"]),
                        jnp.asarray(inp["coninous_signal"]),
                        position_ids=pos, cache=cache)
        return out.cache, mask

    cache, mask = prefill()
    tok = jnp.full((cfg.vision_codebook_num, B, 1), 7, jnp.int64)
    vi = jnp.full((B, 1), Mv, jnp.int64)
    mask = mask.at[:, N].set(1)
    pos = jnp.full((B, 1), N, jnp.int32)

    def step(lang_only):
        out = M.forward(params, cfg, tok, mask, vi, None,
                        position_ids=pos, cache=cache, lang_only=lang_only)
        return out.hidden_states, M.compute_text_logits(
            params, out.hidden_states)

    h_d, tl_d = jax.jit(lambda: step(False))()
    h_l, tl_l = jax.jit(lambda: step(True))()
    np.testing.assert_allclose(np.asarray(h_l), np.asarray(h_d),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(tl_l), np.asarray(tl_d),
                               rtol=2e-5, atol=2e-5)


def test_generator_text_mode_matches_dual():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    inp = _prompt_with_image(cfg, B=2, text_len=4, seed=1)
    g = Generator(params, cfg)
    dual = g(inp, GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                                   decode_modality="dual"))
    text = g(inp, GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                                   decode_modality="text"))
    np.testing.assert_array_equal(np.asarray(text.sequences),
                                  np.asarray(dual.sequences))
    # text mode can never emit a vision-vocab token
    new = np.asarray(text.sequences)[:, :, -6:]
    assert (new < cfg.vocab_size).all()


def test_generator_auto_resolves_per_prompt_tail():
    """decode_modality='auto' (the default, what pipeline.chat uses) picks
    the lang-only decode body for text-ending prompts and the dual-path
    body for prompts ending inside an image block -- resolved host-side,
    keyed into the compile cache."""
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    g = Generator(params, cfg)
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1)

    text_inp = _prompt_with_image(cfg, B=1, text_len=4, seed=2)
    res_auto = g(text_inp, gen)
    assert [k.decode_modality for k in g._compiled] == ["text"]
    res_text = g(text_inp, GenerationConfig(
        max_new_tokens=4, eos_token_id=-1, decode_modality="text"))
    np.testing.assert_array_equal(np.asarray(res_auto.sequences),
                                  np.asarray(res_text.sequences))

    # t2i-shaped prompt: ends at BOI (inside the image block)
    Mv = cfg.max_vision_token_length
    B, N = 1, 5
    rng = np.random.RandomState(3)
    ids = rng.randint(3, cfg.vocab_size,
                      size=(cfg.vision_codebook_num, B, N))
    ids[:, :, -1] = cfg.vocab_size + cfg.vision_vocab_size - 2   # BOI
    vi = np.full((B, N), Mv, np.int64)
    vi[:, -1] = 0
    t2i_inp = {"input_ids": ids, "attention_mask": np.ones((B, N), np.int64),
               "vision_indices": vi,
               "coninous_signal": np.zeros(
                   (B, N, cfg.contiguous_signal_size), np.float32)}
    res_t2i = g(t2i_inp, gen)
    assert sorted(k.decode_modality for k in g._compiled) == ["dual", "text"]
    new = np.asarray(res_t2i.sequences)[:, :, N:]
    assert (new >= cfg.vocab_size).all()     # continues the image block


def test_text_mode_rejects_image_tail_prompt():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    Mv = cfg.max_vision_token_length
    B, N = 1, Mv + 2
    ids = np.random.RandomState(0).randint(
        3, cfg.vocab_size, size=(cfg.vision_codebook_num, B, N))
    vi = np.full((B, N), Mv, np.int64)
    vi[0, 2:] = np.arange(Mv)                # prompt ends INSIDE the image
    inp = {"input_ids": ids, "attention_mask": np.ones((B, N), np.int64),
           "vision_indices": vi,
           "coninous_signal": np.zeros((B, N, cfg.contiguous_signal_size),
                                       np.float32)}
    g = Generator(params, cfg)
    with pytest.raises(ValueError):
        g(inp, GenerationConfig(max_new_tokens=2, eos_token_id=-1,
                                decode_modality="text"))


def test_serving_text_mode_matches_auto():
    from libra_tpu.serving import Request, ServingEngine

    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)

    def make_reqs():
        reqs = []
        for i in range(3):
            inp = _prompt_with_image(cfg, B=1, text_len=3 + i, seed=10 + i)
            reqs.append(Request(
                request_id=i, input_ids=np.asarray(inp["input_ids"][:, 0]),
                vision_indices=np.asarray(inp["vision_indices"][0]),
                contiguous_signal=np.asarray(inp["coninous_signal"][0]),
                max_new_tokens=4))
        return reqs

    def run(modality):
        eng = ServingEngine(
            params, cfg, max_batch=2, max_len=48,
            gen=GenerationConfig(eos_token_id=-1, decode_modality=modality),
            decode_chunk=2)
        return {r.request_id: np.asarray(r.tokens) for r in eng.run(make_reqs())}

    dual, text = run("dual"), run("text")
    assert dual.keys() == text.keys()
    for k in dual:
        np.testing.assert_array_equal(text[k], dual[k])

    # 'auto' with an all-text-tail stream resolves to the lang-only body
    eng = ServingEngine(
        params, cfg, max_batch=2, max_len=48,
        gen=GenerationConfig(eos_token_id=-1), decode_chunk=2)
    out = {r.request_id: np.asarray(r.tokens) for r in eng.run(make_reqs())}
    assert list(eng._decode_fns) == [True]
    for k in dual:
        np.testing.assert_array_equal(out[k], dual[k])
