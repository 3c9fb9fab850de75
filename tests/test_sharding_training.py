"""SPMD tests on a virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): parameter sharding, a full
fsdp+tp train step, and freeze policies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import LibraConfig
from libra_tpu.models import libra as M
from libra_tpu.parallel import make_mesh, param_specs
from libra_tpu.training.optimizer import OptimizerConfig, trainable_mask
from libra_tpu.training.trainer import Trainer

from tests.test_core_model import make_inputs


def make_batch(cfg, B=4):
    ids, mask, vi, sig = make_inputs(cfg, B=B)
    labels = jnp.where(mask[None].astype(bool), ids, -100)
    boi_id = cfg.vocab_size + cfg.vision_vocab_size - 2
    labels = jnp.where(ids == boi_id, -100, labels)
    post_img = jnp.roll(vi == cfg.max_vision_token_length - 1, 1, axis=-1)
    labels = jnp.where(post_img[None], -100, labels)
    return {"input_ids": ids, "attention_mask": mask, "vision_indices": vi,
            "coninous_signal": sig, "labels": labels}


@pytest.fixture(scope="module")
def tiny():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_param_specs_cover_tree(tiny):
    cfg, params = tiny
    specs = param_specs(params)
    n_params = len(jax.tree_util.tree_leaves(params))
    n_specs = len(jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: x is None or hasattr(x, "index")))
    assert n_params > 0
    # every param leaf got a spec with matching rank
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(
        specs, is_leaf=lambda x: hasattr(x, "index")))
    for path, leaf in flat_p:
        spec = flat_s[path]
        assert len(spec) <= leaf.ndim, (path, spec, leaf.shape)


def test_train_step_fsdp_tp(tiny):
    cfg, params = tiny
    mesh = make_mesh(data=2, fsdp=2, model=2)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=100,
                              warmup_ratio=0.0)
    trainer = Trainer(cfg, params, mesh, opt_cfg)
    batch = make_batch(cfg, B=4)
    m1 = trainer.step(batch)
    l1 = float(m1["loss"])
    for _ in range(3):
        m = trainer.step(batch)
    l2 = float(m["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1  # same-batch loss must drop


def test_sharded_matches_single_device(tiny):
    """The sharded train step must produce the same loss as 1-device."""
    cfg, params = tiny
    batch = make_batch(cfg, B=4)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=100,
                              warmup_ratio=0.0)
    t1 = Trainer(cfg, params, make_mesh(1, 1, 1), opt_cfg)
    t8 = Trainer(cfg, params, make_mesh(2, 2, 2), opt_cfg)
    l1 = float(t1.step(batch)["loss"])
    l8 = float(t8.step(batch)["loss"])
    np.testing.assert_allclose(l1, l8, rtol=1e-4)
    l1b = float(t1.step(batch)["loss"])
    l8b = float(t8.step(batch)["loss"])
    np.testing.assert_allclose(l1b, l8b, rtol=1e-3)


def _right_pad_batch(batch):
    """make_batch left-pads row 0 (mask-0 at the FRONT); seq-parallel
    token padding is only loss-neutral for right-padded rows
    (pad_batch_tokens enforces this -- ADVICE r3 finding 1), so move the
    masked slots to the tail and -100 their labels."""
    mask = np.asarray(batch["attention_mask"]).copy()
    n_pad = (mask == 0).sum(-1)
    mask[...] = 1
    for b, n in enumerate(n_pad):
        if n:
            mask[b, -n:] = 0
    labels = np.where(mask[None].astype(bool),
                      np.asarray(batch["labels"]), -100)
    return {**batch, "attention_mask": jnp.asarray(mask),
            "labels": jnp.asarray(labels)}


def test_seq_parallel_matches_single_device(tiny):
    """Sequence (context) parallelism: the token axis sharded over the
    "seq" mesh axis must reproduce the 1-device loss — GSPMD inserts the
    attention K/V all-gathers; params replicate over "seq"."""
    cfg, params = tiny
    batch = _right_pad_batch(make_batch(cfg, B=2))
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=100,
                              warmup_ratio=0.0)
    t1 = Trainer(cfg, params, make_mesh(1, 1, 1), opt_cfg)
    tsp = Trainer(cfg, params, make_mesh(data=1, fsdp=2, model=2, seq=2),
                  opt_cfg)
    # the batch arrays really are token-sharded on the wire
    sb = tsp.shard_batch(batch)
    spec = sb["attention_mask"].sharding.spec
    assert spec[-1] == "seq", spec
    l1 = float(t1.step(batch)["loss"])
    lsp = float(tsp.step(batch)["loss"])
    np.testing.assert_allclose(l1, lsp, rtol=1e-4)
    l1b = float(t1.step(batch)["loss"])
    lspb = float(tsp.step(batch)["loss"])
    np.testing.assert_allclose(l1b, lspb, rtol=1e-3)


def test_pad_batch_tokens_rejects_left_pad(tiny):
    """Left-padded rows make seq-axis token padding non-loss-neutral
    (fully-masked query rows attend UNIFORMLY, including appended pad
    keys -- ADVICE r3 finding 1): pad_batch_tokens must refuse them."""
    from libra_tpu.training.trainer import pad_batch_tokens
    cfg, _ = tiny
    batch = make_batch(cfg, B=2)          # make_inputs left-pads row 0
    N = batch["attention_mask"].shape[-1]
    with pytest.raises(ValueError, match="right-padded"):
        pad_batch_tokens(batch, cfg, multiple=N + 3)
    ok = pad_batch_tokens(_right_pad_batch(batch), cfg, multiple=N + 3)
    assert ok["attention_mask"].shape[-1] == N + 3


def test_grad_accumulation_matches_concat(tiny):
    """accum_train_step over A stacked micro-batches must equal one step on
    the concatenated batch EXACTLY (group-total loss normalisation), even
    with unbalanced valid-label counts across micros."""
    cfg, params = tiny
    mesh = make_mesh(data=2, fsdp=2, model=2)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=100,
                              warmup_ratio=0.0)

    m1 = make_batch(cfg, B=4)
    m2 = make_batch(cfg, B=4)
    # unbalance the micros: mask out the last labels of micro 2 only
    N = m2["labels"].shape[-1]
    tail = jnp.arange(N) >= N - 3
    m2 = dict(m2, labels=jnp.where(tail[None, None], -100, m2["labels"]))

    concat = {k: (None if m1[k] is None
                  else jnp.concatenate(
                      [m1[k], m2[k]],
                      axis=1 if k in ("input_ids", "labels") else 0))
              for k in m1}

    t_ref = Trainer(cfg, params, mesh, opt_cfg)
    t_acc = Trainer(cfg, params, mesh, opt_cfg)
    l_ref = t_ref.step(concat)
    l_acc = t_acc.step_accum([m1, m2])
    np.testing.assert_allclose(float(l_ref["loss"]), float(l_acc["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(l_ref["grad_norm"]),
                               float(l_acc["grad_norm"]), rtol=1e-5)
    for k in ("lm_head", "signal_proj"):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(t_ref.state.params[k])),
            np.asarray(jax.device_get(t_acc.state.params[k])),
            atol=2e-6, rtol=1e-5)


def test_grad_accumulation_reduces_peak_memory(tiny):
    """The accumulation point: XLA's compiled temp (activation) memory for
    an A-micro accumulated step must be well below the concatenated step's
    (measured ~8.5x lower at A=8 on the CPU backend)."""
    import functools
    from libra_tpu.training.optimizer import make_optimizer
    from libra_tpu.training.trainer import (accum_train_step, init_state,
                                            train_step)

    cfg, params = tiny
    opt = make_optimizer(OptimizerConfig(total_steps=10, warmup_ratio=0.0),
                         params)
    state = jax.jit(functools.partial(init_state, opt=opt))(params)
    A = 4
    micro = make_batch(cfg, B=2)
    concat = {k: jnp.concatenate(
        [micro[k]] * A, axis=1 if k in ("input_ids", "labels") else 0)
        for k in micro}
    stacked = {k: jnp.stack([micro[k]] * A) for k in micro}
    c1 = jax.jit(functools.partial(train_step, cfg=cfg, opt=opt)) \
        .lower(state, concat).compile().memory_analysis()
    c2 = jax.jit(functools.partial(accum_train_step, cfg=cfg, opt=opt)) \
        .lower(state, stacked).compile().memory_analysis()
    if c1 is None or c2 is None:
        pytest.skip("memory_analysis unavailable on this backend")
    assert c2.temp_size_in_bytes < 0.5 * c1.temp_size_in_bytes, \
        (c1.temp_size_in_bytes, c2.temp_size_in_bytes)


def test_stack_micro_batches_pads_neutral(tiny):
    """Micros of different lengths stack via loss/attention-neutral padding."""
    from libra_tpu.training.trainer import stack_micro_batches

    cfg, _ = tiny
    m1 = {k: np.asarray(v) for k, v in make_batch(cfg, B=2).items()}
    m2 = {k: (v[..., :-2, :] if k == "coninous_signal" else v[..., :-2])
          for k, v in m1.items()}
    stacked = stack_micro_batches([m1, m2], cfg)
    N = m1["attention_mask"].shape[-1]
    assert stacked["input_ids"].shape == (2,) + m1["input_ids"].shape
    assert (stacked["attention_mask"][1, :, -2:] == 0).all()
    assert (stacked["labels"][1, :, :, -2:] == -100).all()
    assert (stacked["vision_indices"][1, :, -2:]
            == cfg.max_vision_token_length).all()


def test_frozen_language_mask(tiny):
    cfg, params = tiny
    mask = trainable_mask(params, OptimizerConfig(frozen_language=True))
    flat = jax.tree_util.tree_leaves_with_path(mask)
    by_path = {"/".join(p.key for p in path): v for path, v in flat}
    assert by_path["layers/attn/q_proj"] is False
    assert by_path["layers/attn/vision_q/wa"] is True
    assert by_path["layers/attn/k_bridge_lang/wa"] is True  # name has 'bridge'
    assert by_path["embed_tokens"] is False
    assert by_path["signal_proj"] is True     # vision_contiguous_signal_processor
    assert by_path["signal_norm"] is True     # vision_signal_norm
    assert by_path["norm"] is False
    assert by_path["vision_norm"] is True
    assert by_path["lm_head"] is False
    assert by_path["vision_lm_head"] is True


def test_frozen_params_unchanged(tiny):
    cfg, params = tiny
    mesh = make_mesh(1, 2, 2)
    opt_cfg = OptimizerConfig(learning_rate=1e-2, total_steps=100,
                              warmup_ratio=0.0, frozen_language=True)
    trainer = Trainer(cfg, params, mesh, opt_cfg)
    before = np.asarray(jax.device_get(trainer.state.params["lm_head"]))
    before_v = np.asarray(jax.device_get(
        trainer.state.params["vision_lm_head"]))
    batch = make_batch(cfg, B=4)
    trainer.step(batch)
    trainer.step(batch)  # step 0 has lr=0 (warmup schedule starts at 0)
    after = np.asarray(jax.device_get(trainer.state.params["lm_head"]))
    after_v = np.asarray(jax.device_get(trainer.state.params["vision_lm_head"]))
    np.testing.assert_array_equal(before, after)
    assert np.abs(after_v - before_v).max() > 0


def test_sharded_decode_matches_single_device(tiny):
    """Tensor-parallel generation (params + KV cache sharded over the
    "model" axis) must emit exactly the tokens of single-device decode."""
    from libra_tpu.generation import GenerationConfig, Generator
    from libra_tpu.parallel.sharding import cache_shardings

    cfg, params = tiny
    ids, mask, vi, sig = make_inputs(cfg, B=2)
    inputs = {"input_ids": ids, "attention_mask": mask,
              "vision_indices": vi, "coninous_signal": sig}
    gen = GenerationConfig(max_new_tokens=8, eos_token_id=-1)

    ref = Generator(params, cfg)(inputs, gen)

    mesh = make_mesh(data=2, fsdp=1, model=4)
    g = Generator(params, cfg, mesh=mesh)
    # params actually landed sharded over the model axis
    q_sh = g.params["layers"]["attn"]["q_proj"].sharding
    assert q_sh.spec[-1] == "model"
    got = g(inputs, gen)
    np.testing.assert_array_equal(np.asarray(got.sequences),
                                  np.asarray(ref.sequences))
    np.testing.assert_array_equal(np.asarray(got.num_generated),
                                  np.asarray(ref.num_generated))


def test_remat_policies_match_full(tiny):
    """names-policy rematerialisation (save tagged dot outputs instead of
    recomputing them in the backward -- models.libra._remat_policy) must be
    a pure memory/time tradeoff: gradients equal full remat exactly up to
    bf16 reassociation noise."""
    from libra_tpu.training.trainer import loss_fn

    cfg, params = tiny
    batch = make_batch(cfg)

    def grads(remat):
        return jax.jit(lambda p: jax.grad(
            lambda q: loss_fn(q, cfg, batch, remat=remat))(p))(params)

    g_full = grads(True)
    for policy in ("big_dots", "names:mlp_down,attn_o", "dots"):
        g = grads(policy)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32)))), g_full, g)
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3, policy
    with pytest.raises(ValueError, match="unknown remat names"):
        grads("names:nonexistent_tag")
    with pytest.raises(ValueError, match="remat must be"):
        grads("bogus_policy")
