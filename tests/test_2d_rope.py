"""2D-RoPE generation: incremental cached decode must match teacher-forced
full-sequence forward (position/bookkeeping consistency)."""

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.generation import GenerationConfig, Generator
from libra_tpu.models import libra as M


def test_2d_rope_generation_consistency():
    cfg = LibraConfig.tiny(use_2d_rope=True)
    Mv = cfg.max_vision_token_length
    params = M.init_params(jax.random.PRNGKey(0), cfg)

    B, Q = 1, cfg.vision_codebook_num
    boi = cfg.vocab_size + cfg.vision_vocab_size - 2
    ids = np.broadcast_to(np.array([[1, 7, 9, boi]]), (Q, B, 4)).copy()
    vi = np.array([[Mv, Mv, Mv, 0]])
    inputs = {"input_ids": ids, "attention_mask": np.ones((B, 4), np.int32),
              "vision_indices": vi, "coninous_signal": None}
    steps = Mv + 1
    gen = GenerationConfig(max_new_tokens=steps, eos_token_id=-1)
    res = Generator(params, cfg)(inputs, gen)
    seq = np.asarray(res.sequences)

    new = seq[:, :, 4:]
    assert (new[:, :, :Mv - 1] >= cfg.vocab_size).all()
    assert (new[:, :, Mv - 1] == cfg.newline_token_id).all()

    # teacher-forced check of the vision block
    full_ids = jnp.asarray(seq[:, :, :4 + Mv - 1])
    full_vi = jnp.asarray(np.concatenate([vi, np.arange(1, Mv)[None]], 1))
    mask = jnp.ones(full_vi.shape, jnp.int32)
    out = M.forward(params, cfg, full_ids, mask, full_vi, None)
    tl = M.compute_text_logits(params, out.hidden_states)
    vl = M.compute_vision_logits(params, out.hidden_states)
    logits = M.assemble_logits(cfg, tl, vl, full_vi < Mv)
    pred = np.argmax(np.asarray(logits[:, 0, 3:3 + Mv - 1]), axis=-1)
    np.testing.assert_array_equal(pred, seq[:, 0, 4:4 + Mv - 1])
