"""Modality-split prefill parity: gathering the static-width text rows
through the full-rank language path must reproduce the dense dual-path
forward exactly (language outputs at vision positions are discarded by the
routing merge, so skipping them changes nothing)."""

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.models import libra as M


def _image_inputs(cfg, img_starts, text_len):
    """Rows each carrying one full Mv image block at img_starts[b], with
    row b left-padded by b positions (pad inside [0, img_start))."""
    Mv = cfg.max_vision_token_length
    B = len(img_starts)
    N = text_len + Mv
    rs = np.random.RandomState(0)
    ids = rs.randint(3, cfg.vocab_size, size=(cfg.vision_codebook_num, B, N))
    vi = np.full((B, N), Mv, np.int64)
    mask = np.ones((B, N), np.int64)
    for b, s in enumerate(img_starts):
        vi[b, s:s + Mv] = np.arange(Mv)
        ids[:, b, s:s + Mv] = rs.randint(
            cfg.vocab_size, cfg.vocab_size + cfg.vision_vocab_size, size=Mv)
        mask[b, :b] = 0                       # left padding, b < img_start
    sig = rs.randn(B, N, cfg.contiguous_signal_size).astype(np.float32)
    sig[vi >= Mv] = 0.0
    return ids, mask, vi, sig, N


def test_text_span_maps_cover_exactly_the_non_vision_rows():
    cfg = LibraConfig.tiny()
    Mv = cfg.max_vision_token_length
    N = Mv + 7
    starts = np.asarray([0, 3, 7], np.int32)
    src, inv = M.text_span_maps(cfg, jnp.asarray(starts), N)
    src, inv = np.asarray(src), np.asarray(inv)
    assert src.shape == (3, 7) and inv.shape == (3, N)
    for b, s in enumerate(starts):
        expect = [j for j in range(N) if not (s <= j < s + Mv)]
        assert src[b].tolist() == expect
        for j, n in enumerate(expect):
            assert inv[b, n] == j             # inverse on text positions
    assert M.text_span_maps(cfg, jnp.asarray(starts), Mv) is None


def test_forward_split_matches_dense():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    starts = [0, 2, 4]
    ids, mask, vi, sig, N = _image_inputs(cfg, starts, text_len=6)

    def run(split):
        span = (M.text_span_maps(cfg, jnp.asarray(starts, jnp.int32), N)
                if split else None)
        out = M.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray(vi), jnp.asarray(sig), text_span=span)
        return out.hidden_states

    dense = jax.jit(lambda: run(False))()
    split = jax.jit(lambda: run(True))()
    np.testing.assert_allclose(np.asarray(split), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


def test_forward_split_matches_dense_2d_rope():
    cfg = LibraConfig.tiny(use_2d_rope=True, vision_prediction_mode="2d")
    params = M.init_params(jax.random.PRNGKey(1), cfg)
    starts = [1, 3]
    ids, mask, vi, sig, N = _image_inputs(cfg, starts, text_len=5)

    def run(split):
        span = (M.text_span_maps(cfg, jnp.asarray(starts, jnp.int32), N)
                if split else None)
        out = M.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray(vi), jnp.asarray(sig), text_span=span)
        return out.hidden_states

    np.testing.assert_allclose(np.asarray(jax.jit(lambda: run(True))()),
                               np.asarray(jax.jit(lambda: run(False))()),
                               rtol=2e-4, atol=2e-4)


def test_generator_split_toggle_same_sequences():
    """End-to-end raw-pixels generation: split_prefill on/off produce the
    same greedy tokens (split changes WHICH rows the language dots run on,
    never their values)."""
    from libra_tpu.config import VQGANConfig
    from libra_tpu.generation import GenerationConfig, Generator
    from libra_tpu.models import vqgan as vqgan_model

    cfg = LibraConfig.tiny()
    vq_cfg = VQGANConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    Mv = cfg.max_vision_token_length

    B, text_len = 2, 6
    N = text_len + Mv
    rs = np.random.RandomState(2)
    ids = rs.randint(3, cfg.vocab_size,
                     size=(cfg.vision_codebook_num, B, N)).astype(np.int64)
    starts = np.asarray([2, 4], np.int32)
    vi = np.full((B, N), Mv, np.int64)
    for b, s in enumerate(starts):
        vi[b, s:s + Mv] = np.arange(Mv)
    inputs = {"input_ids": ids, "attention_mask": np.ones((B, N), np.int64),
              "vision_indices": vi,
              "pixels": rs.randn(B, 28, 28, 3).astype(np.float32),
              "img_start": starts}
    g = Generator(params, cfg, vq_params=vq_params, vq_cfg=vq_cfg)
    on = g(inputs, GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                                    split_prefill=True))
    off = g(inputs, GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                                     split_prefill=False))
    np.testing.assert_array_equal(np.asarray(on.sequences),
                                  np.asarray(off.sequences))
