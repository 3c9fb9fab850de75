"""2D vision-prediction mode tests: the dense masked-shift formulation must
match a direct oracle of the reference's augmented-map construction
(cal_vision_logits_train, modeling_libra.py:942-1014), and 2D generation
must run end to end with the ring-buffer decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import LibraConfig
from libra_tpu.generation import GenerationConfig, Generator
from libra_tpu.models import libra as M


def oracle_2d_inputs(cfg, h, vi, placeholder):
    """Direct reimplementation of the reference algorithm: per complete
    image, build the (R+1)x(R+1) augmented map with BOI at [1,0] and the
    grid at [1:,1:], gather up/left, append the EOI entries."""
    R = cfg.image_feature_resolution
    Mv = cfg.max_vision_token_length
    B, N, D = h.shape
    out = np.zeros((B, N, 2 * D), np.float32)
    ph = np.asarray(placeholder)
    hn = np.asarray(h)
    vi = np.asarray(vi)
    for b in range(B):
        t = 0
        while t < N:
            if vi[b, t] != 0:
                t += 1
                continue
            # image block starts at t (BOI)
            block = hn[b, t:t + Mv]              # (578, D)
            grid = block[1:-1].reshape(R, R, D)
            aug = np.broadcast_to(ph, (R + 1, R + 1, D)).copy()
            aug[1, 0] = block[0]                 # BOI
            aug[1:, 1:] = grid
            up = aug[:-1, 1:]                    # (R, R, D)
            left = aug[1:, :-1]
            entries = np.concatenate([up, left], -1).reshape(R * R, 2 * D)
            pre_eoi = np.concatenate([block[-2], ph])   # flipped order!
            eoi = np.concatenate([block[-1], ph])
            out[b, t:t + Mv] = np.concatenate(
                [entries, pre_eoi[None], eoi[None]], 0)
            t += Mv
    return out


def test_2d_inputs_match_oracle():
    cfg = LibraConfig.tiny(vision_prediction_mode="2d")
    R, Mv = cfg.image_feature_resolution, cfg.max_vision_token_length
    B, D = 2, cfg.hidden_size
    text_len = 3
    N = text_len + Mv + 2
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (B, N, D))
    vi = np.full((B, N), Mv, np.int64)
    vi[:, text_len:text_len + Mv] = np.arange(Mv)
    vi = jnp.asarray(vi)

    params = M.init_params(jax.random.PRNGKey(1), cfg)
    got_logits = M.compute_vision_logits_2d(params, cfg, h, vi)

    inputs = oracle_2d_inputs(cfg, h, vi, params["vision_hidden_placeholder"])
    want = np.einsum("bnd,qdv->qbnv", inputs,
                     np.asarray(params["vision_lm_head"]))

    flag = np.asarray(vi) < Mv
    got = np.asarray(got_logits)
    # only vision positions are consumed downstream
    np.testing.assert_allclose(got[:, flag], want[:, flag],
                               rtol=1e-4, atol=1e-4)


def test_2d_generation_runs():
    """t2i generation in 2D mode: full image block then forced newline,
    and decode logits must equal full-sequence 2D logits (ring-buffer
    consistency)."""
    cfg = LibraConfig.tiny(vision_prediction_mode="2d")
    Mv = cfg.max_vision_token_length
    params = M.init_params(jax.random.PRNGKey(0), cfg)

    from libra_tpu.tokenization import SimpleTextTokenizer
    # build a t2i prompt by hand: [bos, w, w, BOI]
    B, Q = 1, cfg.vision_codebook_num
    boi = cfg.vocab_size + cfg.vision_vocab_size - 2
    ids = np.array([[1, 7, 9, boi]])
    ids = np.broadcast_to(ids, (Q, B, 4)).copy()
    vi = np.array([[Mv, Mv, Mv, 0]])
    inputs = {"input_ids": ids, "attention_mask": np.ones((B, 4), np.int32),
              "vision_indices": vi, "coninous_signal": None}
    gen = GenerationConfig(max_new_tokens=Mv + 1, eos_token_id=-1)
    res = Generator(params, cfg)(inputs, gen)
    seq = np.asarray(res.sequences)
    new = seq[:, :, 4:]
    assert (new[:, :, :Mv - 1] >= cfg.vocab_size).all()
    assert (new[:, :, Mv - 1] == cfg.newline_token_id).all()

    # cross-check: teacher-forced full-sequence logits give same argmax as
    # the incremental decode produced (greedy self-consistency)
    full_ids = jnp.asarray(seq[:, :, :4 + Mv - 1])
    full_vi = jnp.asarray(
        np.concatenate([vi, np.arange(1, Mv)[None]], axis=1))
    mask = jnp.ones(full_vi.shape, jnp.int32)
    out = M.forward(params, cfg, full_ids, mask, full_vi, None)
    vl = M.compute_vision_logits_2d(params, cfg, out.hidden_states, full_vi)
    tl = M.compute_text_logits(params, out.hidden_states)
    logits = M.assemble_logits(cfg, tl, vl, full_vi < Mv)
    # positions 3 .. 3+Mv-2 predict the generated vision tokens
    pred = np.argmax(np.asarray(logits[:, 0, 3:3 + Mv - 1]), axis=-1)
    np.testing.assert_array_equal(pred, seq[:, 0, 4:4 + Mv - 1])
