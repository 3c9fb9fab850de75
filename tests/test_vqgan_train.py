"""VQGAN tokenizer-training tests (tiny shapes): conv encoder, LPIPS,
PatchGAN discriminator, and an alternating AE/disc step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import VQGANConfig
from libra_tpu.models import vqgan as vq
from libra_tpu.models import vqgan_train as vt


def test_conv_encoder_shapes():
    cfg = VQGANConfig.tiny()
    params = vq.init_encoder_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    z = vq.encoder_forward(params, cfg, x)
    # two levels, one downsample: 28 -> 14
    assert z.shape == (2, 14, 14, cfg.z_channels)
    assert np.isfinite(np.asarray(z)).all()


def test_discriminator_patch_logits():
    params = vt.init_discriminator_params(jax.random.PRNGKey(0), ndf=8,
                                          n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    y = vt.discriminator_forward(params, x)
    assert y.shape[0] == 2 and y.shape[-1] == 1
    assert y.shape[1] > 1  # patch map, not scalar


def test_lpips_zero_for_identical():
    params = vt.init_lpips_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    d_same = float(vt.lpips(params, x, x))
    d_diff = float(vt.lpips(params, x, -x))
    assert abs(d_same) < 1e-6
    assert d_diff > d_same


def test_hinge_loss_values():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    assert float(vt.hinge_d_loss(real, fake)) == 0.0
    assert float(vt.hinge_d_loss(-real, -fake)) == 3.0


def test_vqgan_alternating_train_step():
    cfg = VQGANConfig.tiny()
    params = vq.init_params(jax.random.PRNGKey(0), cfg)
    trainer = vt.VQGANTrainer(cfg, params, lr=1e-4)
    pixels = jax.random.normal(jax.random.PRNGKey(2), (2, 28, 28, 3))
    targets = jnp.tanh(pixels)
    logs = trainer.train_step(pixels, targets)
    assert np.isfinite(logs["aeloss"]) and np.isfinite(logs["discloss"])
    before = logs["aeloss"]
    for _ in range(2):
        logs = trainer.train_step(pixels, targets)
    assert np.isfinite(logs["aeloss"])
    # decoder params actually moved
    assert trainer.step == 3
