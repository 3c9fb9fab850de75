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
