"""Fused (device-resident image tokenization) train step must produce the
same loss as the host-side tokenize-then-step path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import CLIPVisionConfig, LibraConfig, VQGANConfig
from libra_tpu.data.laion import LaionDataset
from libra_tpu.data.processors import LibraCaptionProcessor, LibraImageProcessor
from libra_tpu.models import libra as M, vqgan as vqgan_model
from libra_tpu.tokenization import (ImageTokenizer, LibraTokenizer,
                                    SimpleTextTokenizer)
from libra_tpu.train_wrapper import LibraTrainWrapper
from libra_tpu.training import fused
from libra_tpu.training.optimizer import OptimizerConfig, make_optimizer
from libra_tpu.training.trainer import init_state, loss_fn

from tests.test_data_layer import _make_shard


def test_fused_matches_unfused(tmp_path):
    cfg = LibraConfig.tiny()
    vq_cfg = VQGANConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)
    img_tok = ImageTokenizer(vq_cfg, vq_params, token_offset=cfg.vocab_size,
                             max_vision_token_length=cfg.max_vision_token_length)
    joint = LibraTokenizer(text_tok, img_tok)

    _make_shard(tmp_path / "s.tar", n=6, seed=0)
    ds = LaionDataset(LibraImageProcessor(vq_cfg.clip),
                      LibraCaptionProcessor(),
                      str(tmp_path / "s.tar"), tokenizer=text_tok,
                      i2t_prob=0.5, num_img_tokens=cfg.max_vision_token_length,
                      seed=5, native_reader=False)
    it = iter(ds)
    raw = [next(it) for _ in range(3)]
    batch = ds.collater(raw)

    # unfused: host tokenization
    wrapper = LibraTrainWrapper(cfg, joint)
    arrays = wrapper.prepare_batch(batch)
    unfused = float(jax.jit(functools.partial(loss_fn, cfg=cfg,
                                              remat=False))(params,
                                                            batch=arrays))

    # fused: device tokenization inside the step
    fb = fused.prepare_fused_batch(batch["samples"], text_tok, cfg)
    fused_loss = float(jax.jit(functools.partial(
        fused.fused_loss_fn, cfg=cfg, vq_cfg=vq_cfg, remat=False))(
        params, vq_params, batch=fb))

    np.testing.assert_allclose(fused_loss, unfused, rtol=1e-4)


def test_fused_train_step_runs(tmp_path):
    cfg = LibraConfig.tiny()
    vq_cfg = VQGANConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    vq_params = vqgan_model.init_params(jax.random.PRNGKey(1), vq_cfg)
    text_tok = SimpleTextTokenizer(vocab_size=cfg.vocab_size)

    _make_shard(tmp_path / "s.tar", n=6, seed=1)
    ds = LaionDataset(LibraImageProcessor(vq_cfg.clip),
                      LibraCaptionProcessor(),
                      str(tmp_path / "s.tar"), tokenizer=text_tok,
                      i2t_prob=1.0, num_img_tokens=cfg.max_vision_token_length,
                      seed=2, native_reader=False)
    it = iter(ds)
    batch = ds.collater([next(it) for _ in range(2)])
    fb = fused.prepare_fused_batch(batch["samples"], text_tok, cfg)

    opt = make_optimizer(OptimizerConfig(total_steps=10, warmup_ratio=0.0,
                                         learning_rate=1e-3), params)
    step = fused.make_fused_train_step(cfg, vq_cfg, opt)
    state = init_state(params, opt)
    state, m1 = step(state, vq_params, fb)  # step 0: lr=0 (warmup)
    state, m2 = step(state, vq_params, fb)
    state, m3 = step(state, vq_params, fb)
    assert np.isfinite(float(m3["loss"]))
    assert float(m3["loss"]) < float(m1["loss"])
