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


def test_lpips_converter_parity_vs_torch_oracle():
    """convert_vgg16_lpips + the JAX LPIPS must reproduce the reference
    LPIPS.forward exactly (torch oracle from the SAME torchvision/vgg_lpips
    named state dict; lpips.py:41-54). Pins both the converter's layout
    mapping (OIHW->HWIO, slice indices) and the loss math."""
    from libra_tpu.checkpoint import convert_vgg16_lpips
    from tests.torch_oracle import lpips_reference, make_lpips_state_dict

    sd = make_lpips_state_dict(seed=0)
    params = convert_vgg16_lpips({k: v.numpy() for k, v in sd.items()})
    rng = np.random.RandomState(0)
    x = np.tanh(rng.randn(2, 3, 64, 64)).astype(np.float32)   # NCHW [-1,1]
    y = np.tanh(rng.randn(2, 3, 64, 64)).astype(np.float32)

    ref = lpips_reference(sd, x, y)
    got = float(vt.lpips(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(y.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=2e-4)


def test_lpips_converter_accepts_slice_names():
    """The reference LPIPS module state_dict carries net.slice{s}.{i}.*
    names; conversion must match the features.{i}.* path bit-for-bit."""
    from libra_tpu.checkpoint import _lpips_slice_of, convert_vgg16_lpips
    from tests.torch_oracle import make_lpips_state_dict

    sd = {k: v.numpy() for k, v in make_lpips_state_dict(seed=1).items()}
    renamed = {}
    for k, v in sd.items():
        if k.startswith("features."):
            i = int(k.split(".")[1])
            renamed[f"net.slice{_lpips_slice_of(i)}.{k.split('.', 1)[1]}"] = v
        else:
            renamed[k] = v
    a = convert_vgg16_lpips(sd)
    b = convert_vgg16_lpips(renamed)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(la, lb)

    with pytest.raises(KeyError):
        convert_vgg16_lpips({k: v for k, v in sd.items()
                             if not k.startswith("lin0")})


def test_vqgan_trainer_accepts_pretrained_lpips():
    from libra_tpu.checkpoint import convert_vgg16_lpips
    from tests.torch_oracle import make_lpips_state_dict

    lp = convert_vgg16_lpips(
        {k: v.numpy() for k, v in make_lpips_state_dict(seed=2).items()})
    cfg = VQGANConfig.tiny()
    params = vq.init_params(jax.random.PRNGKey(0), cfg)
    trainer = vt.VQGANTrainer(cfg, params, lr=1e-4, lpips_params=lp)
    np.testing.assert_array_equal(
        np.asarray(trainer.loss_params["lpips"]["lins"][0]["w"]).ravel(),
        np.asarray(lp["lins"][0]["w"]).ravel())


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
