"""Vision tokenizer + joint tokenizer + generation loop tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import LibraConfig, VQGANConfig
from libra_tpu.generation import GenerationConfig, Generator
from libra_tpu.models import lfq, libra as M, vqgan as vqgan_model
from libra_tpu.tokenization import (IMG_GEN, IMG_PH, ImageTokenizer,
                                    LibraTokenizer, SimpleTextTokenizer)


@pytest.fixture(scope="module")
def stack():
    cfg = LibraConfig.tiny()
    vq_cfg = VQGANConfig.tiny()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = M.init_params(k1, cfg)
    vq_params = vqgan_model.init_params(k2, vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
    img_tok = ImageTokenizer(vq_cfg, vq_params, token_offset=cfg.vocab_size,
                             max_vision_token_length=cfg.max_vision_token_length)
    tok = LibraTokenizer(text_tok, img_tok)
    return cfg, vq_cfg, params, tok


def test_lfq_roundtrip():
    spec = lfq.LFQSpec(codebook_size=16, num_codebooks=2, dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 8))
    out = lfq.quantize(x, spec)
    assert out.indices.shape == (3, 5, 2)
    assert ((out.indices >= 0) & (out.indices < 16)).all()
    codes = lfq.indices_to_codes(out.indices, spec)
    np.testing.assert_allclose(codes, out.quantized, atol=1e-6)
    # bit-packing is MSB-first: all-positive => index 15
    pos = lfq.quantize(jnp.ones((1, 1, 8)), spec)
    assert (np.asarray(pos.indices) == 15).all()


def test_lfq_training_losses():
    spec = lfq.LFQSpec(codebook_size=16, num_codebooks=2, dim=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    out = lfq.quantize(x, spec, training=True)
    assert np.isfinite(float(out.aux_loss))
    # straight-through: gradient wrt x of sum(quantized) == 1 everywhere
    g = jax.grad(lambda x: jnp.sum(lfq.quantize(x, spec, training=True)
                                   .quantized))(x)
    np.testing.assert_allclose(g, np.ones_like(g), atol=1e-6)


def test_image_tokenizer_framing(stack):
    cfg, vq_cfg, params, tok = stack
    B = 2
    img = jax.random.normal(jax.random.PRNGKey(3), (B, 28, 28, 3))
    enc = tok.image_tokenizer.encode(img)
    ids = np.asarray(enc["input_ids"])
    Q, B_, Mv = ids.shape
    assert (Q, B_, Mv) == (2, B, cfg.max_vision_token_length)
    assert (ids[:, :, 0] == tok.image_tokenizer.boi_token_id).all()
    assert (ids[:, :, -1] == tok.image_tokenizer.eoi_token_id).all()
    inner = ids[:, :, 1:-1]
    assert (inner >= cfg.vocab_size).all()
    assert (inner < cfg.vocab_size + vq_cfg.codebook_size).all()
    assert enc["encoder_feat"].shape == (B, Mv - 2, vq_cfg.clip.hidden_size)

    # decode roundtrip: framing strip + square reshape
    pixels = tok.image_tokenizer.decode([[ids[q, 0].tolist() for q in range(Q)]])
    assert pixels.shape == (1, vq_cfg.resolution, vq_cfg.resolution, 3)


def test_joint_tokenizer_i2t(stack):
    cfg, vq_cfg, params, tok = stack
    Mv = cfg.max_vision_token_length
    img = np.random.RandomState(0).randn(28, 28, 3).astype(np.float32)
    zero_img = np.zeros_like(img)  # text-only rows carry a zero image that
    # has_image filters post-encode (reference: instruction_dataset + ...:262-264)
    ph = " ".join([IMG_PH] * Mv)
    samples = [{"language": [f"{ph} describe the image", "no image here"],
                "vision": [img, zero_img], "has_image": [True, False]}]
    out = tok(samples)
    ids = out["input_ids"]
    Q, B, N = ids.shape
    assert Q == 2 and B == 2
    vi = out["vision_indices"]
    flag = vi < Mv
    assert flag[0].sum() == Mv and flag[1].sum() == 0
    # vision ids occupy the combined-vocab upper range exactly at flag
    np.testing.assert_array_equal(ids[0] >= cfg.vocab_size, flag)
    # continuous signal: zero rows at BOI/EOI, nonzero inside, zero on text
    sig = out["coninous_signal"]
    img_pos = np.nonzero(flag[0])[0]
    assert np.all(sig[0, img_pos[0]] == 0)       # BOI
    assert np.all(sig[0, img_pos[-1]] == 0)      # EOI
    assert np.abs(sig[0, img_pos[1]]).sum() > 0  # first code token
    assert np.abs(sig[1]).sum() == 0


def test_joint_tokenizer_t2i_prompt(stack):
    cfg, _, params, tok = stack
    out = tok([{"language": [f"a drawing of a dog {IMG_GEN}"]}])
    ids, vi = out["input_ids"], out["vision_indices"]
    # <img_gen> becomes BOI with vision_index 0 (tokenization_libra.py:253-254, 275)
    assert ids[0, 0, -1] == tok.image_tokenizer.boi_token_id
    assert vi[0, -1] == 0
    assert out["coninous_signal"] is None


def test_greedy_generation_i2t(stack):
    cfg, vq_cfg, params, tok = stack
    Mv = cfg.max_vision_token_length
    tok.text_tokenizer.padding_side = "left"
    img = np.random.RandomState(1).randn(28, 28, 3).astype(np.float32)
    ph = " ".join([IMG_PH] * Mv)
    out = tok([{"language": [f"{ph} caption:", f"{ph} a longer caption query:"],
                "vision": [img, img]}])
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1)  # no early stop
    g = Generator(params, cfg)
    res = g(out, gen)
    Q, B, N = np.asarray(out["input_ids"]).shape
    seq = np.asarray(res.sequences)
    assert seq.shape == (Q, B, N + 4)
    new = seq[:, :, N:]
    # text positions can never emit vision ids (-inf placeholder slice)
    assert (new < cfg.vocab_size).all()
    # deterministic
    res2 = g(out, gen)
    np.testing.assert_array_equal(seq, np.asarray(res2.sequences))
    tok.text_tokenizer.padding_side = "right"


def test_t2i_generation_image_block(stack):
    """After a prompt ending in BOI, generation must produce vision ids for
    the whole image block, then the forced newline after EOI."""
    cfg, _, params, tok = stack
    Mv = cfg.max_vision_token_length
    out = tok([{"language": ["draw a cat " + IMG_GEN]}])
    steps = Mv + 1  # 5 in-image tokens (vi 1..5) + forced newline
    gen = GenerationConfig(max_new_tokens=steps, eos_token_id=-1)
    res = Generator(params, cfg)(out, gen)
    seq = np.asarray(res.sequences)
    Q, B, N = np.asarray(out["input_ids"]).shape
    new = seq[:, :, N:]
    # vi of generated tokens: 1, 2, ..., Mv-1 are vision; then text
    assert (new[:, :, :Mv - 1] >= cfg.vocab_size).all()
    # the token generated FROM the EOI position is the forced newline
    assert (new[:, :, Mv - 1] == cfg.newline_token_id).all()


def test_sampling_generation(stack):
    cfg, _, params, tok = stack
    out = tok([{"language": ["tell me a story"]}])
    gen = GenerationConfig(max_new_tokens=6, do_sample=True, temperature=0.9,
                           top_k=20, eos_token_id=-1)
    res = Generator(params, cfg)(out, gen, rng=jax.random.PRNGKey(7))
    seq = np.asarray(res.sequences)
    assert np.isfinite(seq).all()
    assert (seq >= 0).all()


def test_top_p_filter_nucleus_sets():
    """_filter_top_p must keep exactly the smallest prefix of the sorted
    distribution whose cumulative prob exceeds p (HF TopPLogitsWarper
    semantics, used by the reference sample() path)."""
    from libra_tpu.generation import _filter_top_p

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.2]]))
    kept = np.isfinite(np.asarray(_filter_top_p(logits, 0.7)))
    np.testing.assert_array_equal(kept, [[True, True, False]])

    # p below top-1 keeps only the argmax
    kept = np.isfinite(np.asarray(_filter_top_p(logits, 0.4)))
    np.testing.assert_array_equal(kept, [[True, False, False]])

    # p ~ 1 keeps everything; unsorted input order must not matter
    shuffled = jnp.log(jnp.asarray([[0.2, 0.5, 0.3]]))
    kept = np.isfinite(np.asarray(_filter_top_p(shuffled, 0.99)))
    np.testing.assert_array_equal(kept, [[True, True, True]])
    kept = np.isfinite(np.asarray(_filter_top_p(shuffled, 0.7)))
    np.testing.assert_array_equal(kept, [[False, True, True]])

    # kept probabilities renormalise over the nucleus only
    filtered = _filter_top_p(logits, 0.7)
    probs = np.asarray(jax.nn.softmax(filtered, axis=-1))
    np.testing.assert_allclose(probs[0], [0.625, 0.375, 0.0], atol=1e-6)


def test_decode_roundtrip_text_and_image(stack):
    cfg, _, params, tok = stack
    Mv = cfg.max_vision_token_length
    img = np.random.RandomState(2).randn(28, 28, 3).astype(np.float32)
    ph = " ".join([IMG_PH] * Mv)
    # NB: decode drops the final tail token (reference assumes a trailing
    # EOS: tokenization_libra.py:394), so end with a sacrificial token.
    out = tok([{"language": [f"{ph} hello world </s>"], "vision": [img]}])
    decoded = tok.batch_decode(out["input_ids"])
    assert len(decoded) == 1
    assert "hello world" in decoded[0]["language"]
    assert decoded[0]["vision"] is not None
    assert decoded[0]["vision"].shape[-1] == 3


def test_downsample_ratio_inference():
    """Conv-encoder downsample ratio from ckpt filename + variable token
    length (reference: image_tokenizer.py:28-35, 62-68)."""
    from libra_tpu.tokenization import ImageTokenizer

    assert ImageTokenizer.infer_downsample_ratio("vq_f16_16384.ckpt") == 16
    assert ImageTokenizer.infer_downsample_ratio("/x/tok_f8_v2.ckpt") == 8
    assert ImageTokenizer.infer_downsample_ratio("vqgan.ckpt") is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ImageTokenizer.infer_downsample_ratio("vq_f16__f8_.ckpt")

    import jax
    from libra_tpu.config import VQGANConfig
    from libra_tpu.models import vqgan as vqgan_model
    cfg = VQGANConfig.tiny()
    params = vqgan_model.init_params(jax.random.PRNGKey(0), cfg)
    tok = ImageTokenizer(cfg, params, token_offset=256,
                         max_vision_token_length=6, downsample_ratio=14)
    img = np.zeros((1, 28, 28, 3), np.float32)
    assert tok.get_token_length(img) == 2 * 2 + 2
    assert tok.get_token_length(None) == 6
    tok2 = ImageTokenizer(cfg, params, token_offset=256,
                          max_vision_token_length=6)
    assert tok2.get_token_length(img) == 6
