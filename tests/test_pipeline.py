"""High-level pipeline tests on tiny random models."""

import jax
import numpy as np
import pytest

from libra_tpu.config import CLIPVisionConfig, LibraConfig, VQGANConfig
from libra_tpu.data.caption_format import IMG_PH
from libra_tpu.models import libra as M, vqgan as vqgan_model
from libra_tpu.pipeline import LibraPipeline, process_prompt, t2i_prompt
from libra_tpu.data.processors import LibraEvalImageProcessor
from libra_tpu.tokenization import (ImageTokenizer, LibraTokenizer,
                                    SimpleTextTokenizer)


@pytest.fixture(scope="module")
def pipe():
    cfg = LibraConfig.tiny()
    vq_cfg = VQGANConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
    img_tok = ImageTokenizer(vq_cfg, vq_params, token_offset=cfg.vocab_size,
                             max_vision_token_length=cfg.max_vision_token_length)
    tok = LibraTokenizer(text_tok, img_tok)
    proc = LibraEvalImageProcessor(vq_cfg.clip)
    return LibraPipeline(cfg, params, tok, image_processor=proc)


def test_process_prompt_shapes():
    p = process_prompt("what is it?", num_img_tokens=4)
    assert p.count(IMG_PH) == 4
    assert p.rstrip().endswith("ASSISTANT:")
    assert "USER:" in p
    p2 = process_prompt("hi", with_image=False)
    assert IMG_PH not in p2


def test_t2i_prompt():
    assert t2i_prompt("a cat").endswith("<img_gen>")


def test_chat_runs(pipe):
    from PIL import Image
    img = Image.fromarray(np.random.RandomState(0)
                          .randint(0, 255, (40, 40, 3), np.uint8))
    outs = pipe.chat(["describe this", "what color?"], images=[img, img],
                     max_new_tokens=4)
    assert len(outs) == 2
    assert all(isinstance(o, str) for o in outs)


def test_generate_image(pipe):
    img = pipe.generate_image("a tiny cat", temperature=0.0)
    assert img is not None
    assert img.shape[-1] == 3
    assert img.shape[0] == pipe.tokenizer.image_tokenizer.cfg.resolution


def test_vision_tokenizer_config_yaml(tmp_path):
    """vision_tokenizer_config.yaml parsing matches the reference schema
    (tokenization_libra.py:148-160, vqgan.py:26-75)."""
    from libra_tpu.config import load_vision_tokenizer_config

    yaml_text = """
max_vision_token_length: 578
freeze: true
params:
  embed_dim: 18
  codebook_size: 512
  num_codebook: 2
  ckpt_path: weights/tokenizer.ckpt
  ddconfig:
    encoder_name: openai/clip-vit-large-patch14-336
    select_layer: -2
    z_channels: 18
    resolution: 336
    initial_resolution: 24
    ch: 128
    ch_mult: [1, 1, 2, 2, 4]
    num_res_blocks: 2
    attn_resolutions: [24]
    out_ch: 3
    dropout: 0.0
    norm_first: true
    num_attn_head: 4
"""
    (tmp_path / "vision_tokenizer_config.yaml").write_text(yaml_text)
    cfg, ckpt_path, max_vt, clip_dir = \
        load_vision_tokenizer_config(str(tmp_path))
    assert max_vt == 578
    assert ckpt_path == str(tmp_path / "weights/tokenizer.ckpt")
    # encoder_name resolves against the checkpoint dir (the reference's
    # nested-CLIP-dir layout, tokenization_libra.py:157-158)
    assert clip_dir == str(tmp_path / "openai/clip-vit-large-patch14-336")
    assert cfg.embed_dim == 18 and cfg.codebook_size == 512
    assert cfg.num_codebook == 2
    assert cfg.encoder_name == "clip" and cfg.select_layer == -2
    assert cfg.ch_mult == (1, 1, 2, 2, 4)
    assert cfg.attn_resolutions == (24,)
    assert cfg.norm_first is True and cfg.attn_num_heads == 4
    assert cfg.initial_resolution == 24 and cfg.resolution == 336

    # absent YAML -> defaults + <dir>/vqgan.ckpt
    cfg2, ckpt2, mvt2, cd2 = load_vision_tokenizer_config(
        str(tmp_path / "nope"))
    assert mvt2 is None and ckpt2.endswith("vqgan.ckpt") and cd2 is None
    assert cfg2.embed_dim == 18


def test_chat_thread_multi_turn(pipe):
    """Incremental ChatThread: two turns run end-to-end, and the first
    turn's text equals the full-re-prefill chat() on the same prompt."""
    from PIL import Image
    img = Image.fromarray(np.random.RandomState(1)
                          .randint(0, 255, (40, 40, 3), np.uint8))
    want1 = pipe.chat(["describe this"], images=[img], max_new_tokens=4)
    thread = pipe.start_chat(n_parallel=1, max_len=128, max_new_tokens=4,
                             delta_bucket=4)
    out1 = thread.ask(["describe this"], images=[img])
    assert out1 == want1                        # same prompt, same greedy path
    out2 = thread.ask(["and the shape?"])
    assert len(out2) == 1 and isinstance(out2[0], str)
    assert thread.turn == 2
    # second turn compiled only the small delta program, not the
    # image-block prompt width
    widths = sorted(k[0] for k in thread.session._fns)
    assert len(widths) == 2 and widths[0] < widths[1]
