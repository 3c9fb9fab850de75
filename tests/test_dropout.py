"""Train-time dropout: reference pdrop semantics (VERDICT r1 item 7).

The reference applies nn.Dropout at embd/attn/resid sites with vision_*
twins (modeling_llama.py:226-228, modeling_libra.py:254,426-427,543-551,767);
shipped configs set all rates to 0. These tests pin: rates are honored when
a dropout_rng is supplied (training), ignored without one (eval), and
identity when zero.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libra_tpu.config import LibraConfig
from libra_tpu.models import libra as M
from libra_tpu.ops.routed import apply_dropout, routed_dropout


def _batch(cfg, B=2, seed=0):
    rng = np.random.RandomState(seed)
    Mv = cfg.max_vision_token_length
    N = 4 + Mv
    Q = cfg.vision_codebook_num
    ids = rng.randint(3, cfg.vocab_size, size=(Q, B, N)).astype(np.int32)
    ids[1:] = ids[0]
    img = rng.randint(0, cfg.vision_vocab_size - 2, size=(Q, B, Mv)) + cfg.vocab_size
    ids[:, :, 2:2 + Mv] = img
    vi = np.full((B, N), Mv, np.int32)
    vi[:, 2:2 + Mv] = np.arange(Mv)
    mask = np.ones((B, N), np.int32)
    sig = rng.randn(B, N, cfg.contiguous_signal_size).astype(np.float32) * 0.02
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(vi), jnp.asarray(sig)


def _forward(cfg, params, batch, rng=None):
    ids, mask, vi, sig = batch
    f = jax.jit(functools.partial(M.forward, cfg=cfg))
    return f(params, input_ids=ids, attention_mask=mask, vision_indices=vi,
             contiguous_signal=sig, dropout_rng=rng).hidden_states


def test_apply_dropout_scaling_and_identity():
    x = jnp.ones((1000, 8))
    assert apply_dropout(None, x, 0.5) is x
    assert apply_dropout(jax.random.PRNGKey(0), x, 0.0) is x
    y = np.asarray(apply_dropout(jax.random.PRNGKey(0), x, 0.25))
    # inverted dropout: survivors scaled by 1/(1-p), mean preserved ~
    kept = y != 0
    np.testing.assert_allclose(y[kept], 1.0 / 0.75)
    assert abs(kept.mean() - 0.75) < 0.02


def test_routed_dropout_per_modality_rates():
    flag = jnp.asarray([[True] * 2000 + [False] * 2000])
    x = jnp.ones((1, 4000, 4))
    y = np.asarray(routed_dropout(jax.random.PRNGKey(1), x, flag, 0.5, 0.1))
    vis_keep = (y[0, :2000] != 0).mean()
    lang_keep = (y[0, 2000:] != 0).mean()
    assert abs(vis_keep - 0.5) < 0.05
    assert abs(lang_keep - 0.9) < 0.05
    # survivor scaling uses the modality's own rate
    np.testing.assert_allclose(y[0, :2000][y[0, :2000] != 0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(y[0, 2000:][y[0, 2000:] != 0], 1 / 0.9, rtol=1e-6)


def test_zero_rates_rng_is_noop():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    h0 = _forward(cfg, params, batch)
    h1 = _forward(cfg, params, batch, rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


def test_dropout_active_deterministic_per_rng():
    cfg = LibraConfig.tiny(resid_pdrop=0.2, attn_pdrop=0.1, embd_pdrop=0.1,
                           vision_embd_pdrop=0.3, vision_resid_pdrop=0.3)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    h_eval = _forward(cfg, params, batch)                     # no rng = eval
    ha = _forward(cfg, params, batch, rng=jax.random.PRNGKey(5))
    hb = _forward(cfg, params, batch, rng=jax.random.PRNGKey(5))
    hc = _forward(cfg, params, batch, rng=jax.random.PRNGKey(6))
    assert not np.allclose(np.asarray(h_eval), np.asarray(ha))
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))
    assert not np.allclose(np.asarray(ha), np.asarray(hc))
    # eval path unaffected by nonzero rates
    cfg0 = LibraConfig.tiny()
    h_plain = _forward(cfg0, params, batch)
    np.testing.assert_array_equal(np.asarray(h_eval), np.asarray(h_plain))


def test_train_step_with_dropout_runs_and_differs():
    from libra_tpu.training.trainer import init_state, train_step
    import optax

    cfg = LibraConfig.tiny(resid_pdrop=0.2, embd_pdrop=0.1)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.sgd(1e-3)
    state = init_state(params, opt)
    ids, mask, vi, sig = _batch(cfg)
    labels = jnp.where(jnp.ones_like(ids, bool), ids, -100)
    # mask cross-modal boundary labels: the BOI position (predicted from a
    # text position) and the first text token after the image
    post_img = jnp.roll(vi == cfg.max_vision_token_length - 1, 1, axis=-1)
    labels = jnp.where(post_img[None] | (vi == 0)[None], -100, labels)
    batch = {"input_ids": ids, "attention_mask": mask, "vision_indices": vi,
             "coninous_signal": sig, "labels": labels}
    step = jax.jit(functools.partial(train_step, cfg=cfg, opt=opt))
    s1, m1 = step(state, batch)
    assert np.isfinite(float(m1["loss"]))
    # the mask is keyed on state.step: the same batch at a different step
    # sees different masks -> different loss
    s2, m2 = step(s1._replace(params=state.params,
                              opt_state=state.opt_state), batch)
    assert float(m1["loss"]) != float(m2["loss"])
