"""Fused vision-encode generation must equal the pre-encoded path
token for token."""

import jax
import numpy as np
import pytest

from libra_tpu.config import LibraConfig, VQGANConfig
from libra_tpu.data.caption_format import IMG_PH
from libra_tpu.generation import GenerationConfig, Generator
from libra_tpu.models import libra as M, vqgan as vqgan_model
from libra_tpu.tokenization import (ImageTokenizer, LibraTokenizer,
                                    SimpleTextTokenizer)


def test_fused_generation_matches_preencoded():
    cfg = LibraConfig.tiny()
    vq_cfg = VQGANConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
    img_tok = ImageTokenizer(vq_cfg, vq_params, token_offset=cfg.vocab_size,
                             max_vision_token_length=cfg.max_vision_token_length)
    joint = LibraTokenizer(text_tok, img_tok)
    Mv = cfg.max_vision_token_length

    img = np.random.RandomState(0).randn(1, 28, 28, 3).astype(np.float32)
    ph = " ".join([IMG_PH] * Mv)
    prompt = f"{ph} describe:"

    # path A: host-side image tokenization
    pre = joint([{"language": [prompt], "vision": [img[0]]}])
    gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1)
    res_a = Generator(params, cfg)(pre, gen)

    # path B: fused -- raw pixels + placeholder text ids
    t = text_tok([prompt])
    ids = np.asarray(t["input_ids"], np.int64)
    pos = np.nonzero(ids[0] == text_tok.img_ph_token_id)[0]
    vi = np.full(ids.shape, Mv, np.int64)
    vi[0, pos[0]:pos[0] + Mv] = np.arange(Mv)
    inputs_b = {
        "input_ids": np.broadcast_to(ids[None],
                                     (cfg.vision_codebook_num,) + ids.shape),
        "attention_mask": np.asarray(t["attention_mask"]),
        "vision_indices": vi,
        "pixels": img,
        "img_start": np.asarray([pos[0]]),
    }
    g = Generator(params, cfg, vq_params=vq_params, vq_cfg=vq_cfg)
    res_b = g(inputs_b, gen)

    np.testing.assert_array_equal(np.asarray(res_a.sequences),
                                  np.asarray(res_b.sequences))


def test_multilayer_clip_tap():
    """select_layer as an iterable concatenates tapped hidden states
    (reference: clip_encoder.py:22-51; quant_conv in-dim vqgan.py:49)."""
    from libra_tpu.config import CLIPVisionConfig
    from libra_tpu.models import clip as clip_model

    ccfg = CLIPVisionConfig.tiny()
    cp = clip_model.init_params(jax.random.PRNGKey(0), ccfg)
    px = np.random.RandomState(0).randn(2, 28, 28, 3).astype(np.float32)

    f = jax.jit(lambda p, x, s: clip_model.forward_features(
        p, ccfg, x, select_layer=s, square_output=False),
        static_argnums=2)
    f_m2 = f(cp, px, -2)
    f_m1 = f(cp, px, -1)
    both = f(cp, px, (-2, -1))
    assert both.shape[-1] == 2 * ccfg.hidden_size
    np.testing.assert_allclose(np.asarray(both[..., :ccfg.hidden_size]),
                               np.asarray(f_m2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(both[..., ccfg.hidden_size:]),
                               np.asarray(f_m1), rtol=1e-5, atol=1e-5)


def test_fused_generation_multilayer_signal():
    """The fused pixels->prefill path works when the continuous signal is a
    multi-layer CLIP concat (the flagship shape: 2 x 1024 == 2048)."""
    vq_cfg = VQGANConfig.tiny(select_layer=(-2, -1))
    cfg = LibraConfig.tiny(
        contiguous_signal_size=vq_cfg.clip_feature_dim)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
    Mv = cfg.max_vision_token_length

    img = np.random.RandomState(0).randn(1, 28, 28, 3).astype(np.float32)
    prompt = " ".join([IMG_PH] * Mv) + " describe:"
    t = text_tok([prompt])
    ids = np.asarray(t["input_ids"], np.int64)
    pos = np.nonzero(ids[0] == text_tok.img_ph_token_id)[0]
    vi = np.full(ids.shape, Mv, np.int64)
    vi[0, pos[0]:pos[0] + Mv] = np.arange(Mv)
    inputs = {
        "input_ids": np.broadcast_to(ids[None],
                                     (cfg.vision_codebook_num,) + ids.shape),
        "attention_mask": np.asarray(t["attention_mask"]),
        "vision_indices": vi,
        "pixels": img,
        "img_start": np.asarray([pos[0]]),
    }
    g = Generator(params, cfg, vq_params=vq_params, vq_cfg=vq_cfg)
    res = g(inputs, GenerationConfig(max_new_tokens=4, eos_token_id=-1))
    seq = np.asarray(res.sequences)
    assert seq.shape[-1] == ids.shape[-1] + 4
    assert (seq >= 0).all()


def test_uint8_pixels_match_prenormalized():
    """uint8 pixels normalize ON DEVICE inside the prefill program with the
    exact host math (data/processors.py rescale+normalize), so sequences
    match the pre-normalized float32 path bit for bit."""
    cfg = LibraConfig.tiny()
    vq_cfg = VQGANConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    Mv = cfg.max_vision_token_length

    rs = np.random.RandomState(3)
    u8 = rs.randint(0, 256, size=(1, 28, 28, 3)).astype(np.uint8)
    mean = np.asarray(vq_cfg.clip.image_mean, np.float32)
    std = np.asarray(vq_cfg.clip.image_std, np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std

    N = Mv + 5
    ids = rs.randint(3, cfg.vocab_size,
                     size=(cfg.vision_codebook_num, 1, N)).astype(np.int64)
    vi = np.full((1, N), Mv, np.int64)
    vi[0, 2:2 + Mv] = np.arange(Mv)
    base = {"input_ids": ids, "attention_mask": np.ones((1, N), np.int64),
            "vision_indices": vi, "img_start": np.asarray([2], np.int32)}
    g = Generator(params, cfg, vq_params=vq_params, vq_cfg=vq_cfg)
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
    res_u8 = g(dict(base, pixels=u8), gen)
    res_f32 = g(dict(base, pixels=f32), gen)
    np.testing.assert_array_equal(np.asarray(res_u8.sequences),
                                  np.asarray(res_f32.sequences))
