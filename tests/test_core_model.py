"""Core decoder tests.

The "oracle" functions here re-implement the REFERENCE semantics directly
(gather/scatter routing, K/V tensor cloning for the bridge -- see
modeling_libra.py:111-147, 267-296, 317-327) as straight-line JAX, and the
tests check that the TPU-native dense/masked formulation is numerically
identical.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import LibraConfig
from libra_tpu.models import libra as M
from libra_tpu.ops.attention import AttentionInputs, bridged_attention, causal_bias
from libra_tpu.ops.rope import apply_rope, rope_cos_sin
from libra_tpu.ops.routed import routed_linear, routed_low_rank


def rng(*keys):
    return jax.random.split(jax.random.PRNGKey(0), len(keys))


# ---------------------------------------------------------------------------
# Oracles (reference semantics)
# ---------------------------------------------------------------------------

def oracle_routed_linear(x, flag, w_lang, wa, wb, addition_mode=False):
    """cal_language_vision with gather/scatter, done with where()."""
    lang = x @ w_lang
    vis = (x @ wa) @ wb
    if addition_mode:
        return lang + jnp.where(flag[..., None], vis, 0.0)
    return jnp.where(flag[..., None], vis, lang)


def oracle_bridged_attention(q, k, v, kb, vb, flag, bias):
    """Reference clone-and-scatter bridge (attn_with_bridge)."""
    d = q.shape[-1]
    scale = 1.0 / np.sqrt(d)
    fk = flag[:, :, None, None]
    k_for_vis = k + jnp.where(~fk, kb, 0.0)
    k_for_lang = k + jnp.where(fk, kb, 0.0)
    s_v = jnp.einsum("bqhd,bkhd->bhqk", q, k_for_vis) * scale
    s_l = jnp.einsum("bqhd,bkhd->bhqk", q, k_for_lang) * scale
    fq = flag[:, None, :, None]
    s = jnp.where(fq, s_v, s_l) + bias
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    v_for_vis = v + jnp.where(~fk, vb, 0.0)
    v_for_lang = v + jnp.where(fk, vb, 0.0)
    out_v = jnp.einsum("bhqk,bkhd->bqhd", a, v_for_vis)
    out_l = jnp.einsum("bhqk,bkhd->bqhd", a, v_for_lang)
    return jnp.where(flag[:, :, None, None], out_v, out_l)


# ---------------------------------------------------------------------------
# Unit tests
# ---------------------------------------------------------------------------

def test_routed_linear_matches_oracle():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (2, 10, 16))
    w = jax.random.normal(ks[1], (16, 24)) * 0.1
    wa = jax.random.normal(ks[2], (16, 4)) * 0.1
    wb = jax.random.normal(ks[3], (4, 24)) * 0.1
    flag = jax.random.bernoulli(ks[0], 0.5, (2, 10))
    for am in (False, True):
        got = routed_linear(x, flag, w, wa, wb, am)
        want = oracle_routed_linear(x, flag, w, wa, wb, am)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_bridged_attention_matches_oracle():
    key = jax.random.PRNGKey(2)
    B, N, H, d = 2, 12, 2, 8
    ks = jax.random.split(key, 6)
    q, k, v, kb, vb = (jax.random.normal(ks[i], (B, N, H, d)) for i in range(5))
    flag = jax.random.bernoulli(ks[5], 0.5, (B, N))
    mask = jnp.ones((B, N), jnp.int32).at[0, :3].set(0)  # left padding
    bias = causal_bias(mask, N, N)
    got = bridged_attention(AttentionInputs(q, k, v, kb, vb), flag, flag, bias)
    want = oracle_bridged_attention(q, k, v, kb, vb, flag, bias)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rope_linearity():
    """rope(K + Kb) == rope(K) + rope(Kb): justifies bridging after RoPE."""
    cos, sin = rope_cos_sin(32, 8)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    k = jax.random.normal(k1, (1, 16, 2, 8))
    kb = jax.random.normal(k2, (1, 16, 2, 8))
    pos = jnp.arange(16)[None, :]
    np.testing.assert_allclose(
        apply_rope(k + kb, cos, sin, pos),
        apply_rope(k, cos, sin, pos) + apply_rope(kb, cos, sin, pos),
        rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Full-model tests
# ---------------------------------------------------------------------------

def make_inputs(cfg: LibraConfig, B=2, text_len=5, seed=0):
    """Prompt = [text_len text tokens][one full image block][2 text tokens]."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    M_ = cfg.max_vision_token_length
    N = text_len + M_ + 2
    Q = cfg.vision_codebook_num
    V = cfg.vocab_size

    text_ids = jax.random.randint(ks[0], (Q, B, N), 3, V)
    text_ids = jnp.broadcast_to(text_ids[0:1], (Q, B, N))  # codebooks share text
    img_codes = jax.random.randint(ks[1], (Q, B, M_), 0, cfg.vision_vocab_size - 2)
    boi = cfg.vision_vocab_size - 2
    eoi = cfg.vision_vocab_size - 1
    img_codes = img_codes.at[:, :, 0].set(boi).at[:, :, -1].set(eoi) + V

    ids = text_ids.at[:, :, text_len:text_len + M_].set(img_codes)
    vi = jnp.full((B, N), M_, jnp.int32)
    vi = vi.at[:, text_len:text_len + M_].set(jnp.arange(M_))
    mask = jnp.ones((B, N), jnp.int32).at[0, :2].set(0)  # left-pad batch row 0
    sig = jax.random.normal(ks[2], (B, N, cfg.contiguous_signal_size)) * 0.1
    return ids, mask, vi, sig


@pytest.fixture(scope="module")
def tiny_model():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def jit_forward(cfg):
    """Jitted forward (eager per-op dispatch is ~100x slower on CPU)."""
    @jax.jit
    def f(params, input_ids, attention_mask, vision_indices,
          contiguous_signal=None, position_ids=None, cache=None):
        return M.forward(params, cfg, input_ids, attention_mask,
                         vision_indices, contiguous_signal, position_ids,
                         cache)
    return f


def test_forward_shapes(tiny_model):
    cfg, params = tiny_model
    ids, mask, vi, sig = make_inputs(cfg)
    out = jit_forward(cfg)(params, ids, mask, vi, sig)
    B, N = mask.shape
    assert out.hidden_states.shape == (B, N, cfg.hidden_size)
    assert np.isfinite(np.asarray(out.hidden_states)).all()


def test_cache_consistency(tiny_model):
    """prefill(N) + decode(1) must equal full forward(N+1) at the last token."""
    cfg, params = tiny_model
    ids, mask, vi, sig = make_inputs(cfg)
    Q, B, N = ids.shape
    S = N + 4
    fwd = jit_forward(cfg)

    # ground truth: full uncached forward
    full = fwd(params, ids, mask, vi, sig)

    # prefill first N-1 tokens
    cache = M.init_cache(cfg, B, S, dtype=jnp.float32)
    mask_buf = jnp.zeros((B, S), jnp.int32).at[:, :N - 1].set(mask[:, :N - 1])
    pos = M.position_ids_from_mask(mask[:, :N - 1])
    pre = fwd(params, ids[:, :, :N - 1], mask_buf, vi[:, :N - 1],
              sig[:, :N - 1], position_ids=pos, cache=cache)

    # compare only non-pad positions: padded queries attend to nothing and
    # produce (masked-away) garbage that differs by buffer size
    valid = np.asarray(mask[:, :N - 1]).astype(bool)
    np.testing.assert_allclose(np.asarray(pre.hidden_states)[valid],
                               np.asarray(full.hidden_states[:, :N - 1])[valid],
                               rtol=2e-4, atol=2e-4)

    # decode the final token
    mask_buf = mask_buf.at[:, N - 1].set(mask[:, N - 1])
    last_pos = M.position_ids_from_mask(mask)[:, -1:]
    step = fwd(params, ids[:, :, N - 1:], mask_buf, vi[:, N - 1:],
               sig[:, N - 1:], position_ids=last_pos, cache=pre.cache)
    np.testing.assert_allclose(step.hidden_states[:, 0],
                               full.hidden_states[:, -1],
                               rtol=2e-4, atol=2e-4)


def test_loss_matches_assembled_logits(tiny_model):
    """multicodebook_loss must equal CE over the materialised combined logits."""
    cfg, params = tiny_model
    ids, mask, vi, sig = make_inputs(cfg)
    flag = vi < cfg.max_vision_token_length
    out = jit_forward(cfg)(params, ids, mask, vi, sig)
    tl = M.compute_text_logits(params, out.hidden_states)
    vl = M.compute_vision_logits(params, out.hidden_states)

    labels = jnp.where(mask[None].astype(bool), ids, -100)
    # mask BOI positions and first-text-after-image (reference label rules)
    boi_id = cfg.vocab_size + cfg.vision_vocab_size - 2
    labels = jnp.where(ids == boi_id, -100, labels)
    post_img = jnp.roll(vi == cfg.max_vision_token_length - 1, 1, axis=-1)
    labels = jnp.where(post_img[None], -100, labels)

    got = M.multicodebook_loss(cfg, tl, vl, flag, labels)

    # oracle: materialise combined logits exactly like cal_vl_logits
    logits = M.assemble_logits(cfg, tl, vl, flag)   # (Q,B,N,Vc)
    total = 0.0
    for q in range(cfg.vision_codebook_num):
        lg = np.asarray(logits[q][:, :-1], np.float64)
        lab = np.asarray(labels[q][:, 1:])
        valid = lab != -100
        lse = np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1)) + lg.max(-1)
        pick = np.take_along_axis(lg, np.where(valid, lab, 0)[..., None], -1)[..., 0]
        nll = (lse - pick)[valid]
        total += nll.mean()
    want = total / cfg.vision_codebook_num
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_force_eoi_newline(tiny_model):
    cfg, _ = tiny_model
    Q, B, Vc = cfg.vision_codebook_num, 3, cfg.combined_vocab_size
    logits = jnp.zeros((Q, B, Vc))
    last_vi = jnp.array([cfg.max_vision_token_length - 1, 0,
                         cfg.max_vision_token_length])
    out = M.force_eoi_newline(cfg, logits, last_vi)
    assert int(jnp.argmax(out[0, 0])) == cfg.newline_token_id
    np.testing.assert_array_equal(out[:, 1:], logits[:, 1:])


def test_2d_position_ids():
    cfg = LibraConfig.tiny()
    # layout: [bos_text, text, BOI, 4 image tokens, EOI, text]
    M_ = cfg.max_vision_token_length  # 6, R = 2
    vi = jnp.array([[M_, M_, 0, 1, 2, 3, 4, M_ - 1, M_]])
    pos = M.get_2d_position_ids(cfg, vi)
    # base counter: text,text,boi advance 1; image tokens 0; EOI advances R+1
    # pos[b, 2, n]
    assert pos.shape == (1, 2, 9)
    base = pos[0, :, 2]  # BOI
    np.testing.assert_array_equal(base, [2, 2])
    # first image token: offset (1,1)
    np.testing.assert_array_equal(pos[0, :, 3], [3, 3])
    # grid position (1,2)
    np.testing.assert_array_equal(pos[0, :, 4], [3, 4])
    # EOI advances the base counter by R+1 and sits at the new base
    np.testing.assert_array_equal(pos[0, :, 7], [5, 5])
    # text after EOI continues one step later
    np.testing.assert_array_equal(pos[0, :, 8], [6, 6])


@pytest.mark.parametrize("variant", [
    {"addition_mode": True},
    {"concat_signals": False},
    {"norm_signals": False},
    {"use_vision_position_embedding": True},
    {"unified_head": True},
])
def test_config_variants_cache_consistency(variant):
    """Every config-flag variant (reference: configuration_libra.py:21-58)
    must keep the core invariant: prefill + cached decode == full forward."""
    cfg = LibraConfig.tiny(**variant)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    ids, mask, vi, sig = make_inputs(cfg)
    Q, B, N = ids.shape
    fwd = jit_forward(cfg)

    full = fwd(params, ids, mask, vi, sig)
    assert np.isfinite(np.asarray(full.hidden_states)).all()

    cache = M.init_cache(cfg, B, N + 2, dtype=jnp.float32)
    mask_buf = jnp.zeros((B, N + 2), jnp.int32).at[:, :N - 1].set(
        mask[:, :N - 1])
    pos = M.position_ids_from_mask(mask[:, :N - 1])
    pre = fwd(params, ids[:, :, :N - 1], mask_buf, vi[:, :N - 1],
              sig[:, :N - 1], position_ids=pos, cache=cache)
    mask_buf = mask_buf.at[:, N - 1].set(mask[:, N - 1])
    last_pos = M.position_ids_from_mask(mask)[:, -1:]
    step = fwd(params, ids[:, :, N - 1:], mask_buf, vi[:, N - 1:],
               sig[:, N - 1:], position_ids=last_pos, cache=pre.cache)
    np.testing.assert_allclose(step.hidden_states[:, 0],
                               full.hidden_states[:, -1],
                               rtol=2e-4, atol=2e-4)

    # training loss stays finite under the variant
    flag = vi < cfg.max_vision_token_length
    labels = jnp.where(mask[None].astype(bool), ids, -100)
    labels = jnp.where(flag[None] != (labels >= cfg.vocab_size), -100, labels)
    tl = M.compute_text_logits(params, full.hidden_states)
    vl = M.compute_vision_logits(params, full.hidden_states)
    loss = M.multicodebook_loss(cfg, tl, vl, flag, labels,
                                unified=cfg.unified_head)
    assert np.isfinite(float(loss))
