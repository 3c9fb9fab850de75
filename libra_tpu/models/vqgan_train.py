"""VQGAN tokenizer-training losses and trainer.

Behavior parity with the reference tokenizer-training stack (used only when
training the vision tokenizer itself, stripped at LLM time):

* LPIPS perceptual loss: VGG16 feature distances through learned 1x1 "lin"
  heads (reference: taming/modules/losses/lpips.py:11-123). Weights load
  from torch checkpoints via libra_tpu.checkpoint-style converters; random
  init otherwise.
* PatchGAN NLayerDiscriminator (reference: discriminator/model.py:15-65),
  batch-stats BatchNorm (GAN training always runs in batch mode).
* VQLPIPSWithDiscriminator: L1 + perceptual + hinge/vanilla GAN with the
  adaptive generator weight d_w = |grad_nll| / |grad_g| on the decoder's
  last layer (reference: vqperceptual.py:34-136) -- computed here with two
  jax.grad calls w.r.t. conv_out.
* Alternating AE/discriminator optimisation (reference: vqgan.py:161-223)
  as two jitted steps.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from libra_tpu.config import VQGANConfig
from libra_tpu.models import vqgan as vq
from libra_tpu.ops.conv import conv2d

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# VGG16 / LPIPS
# ---------------------------------------------------------------------------

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# LPIPS taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAP_AFTER = {1, 3, 6, 9, 12}  # conv indices (0-based among convs)
_LPIPS_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


def init_vgg16_params(key) -> Params:
    convs = []
    cin = 3
    ks = jax.random.split(key, 16)
    i = 0
    for c in _VGG_CFG:
        if c == "M":
            continue
        fan = 9 * cin
        w = jax.random.normal(ks[i], (3, 3, cin, c)) * (fan ** -0.5)
        convs.append({"w": w, "b": jnp.zeros((c,))})
        cin = c
        i += 1
    return {"convs": convs}


def vgg16_features(params: Params, x: jax.Array):
    """x: (B, H, W, 3) in [-1, 1] -> list of 5 tapped feature maps."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    ci = 0
    for c in _VGG_CFG:
        if c == "M":
            B, H, W, C = h.shape
            h = h[:, :H // 2 * 2, :W // 2 * 2]  # torch MaxPool2d floors
            h = h.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))
            continue
        h = jax.nn.relu(conv2d(h, **params["convs"][ci]))
        if ci in _TAP_AFTER:
            feats.append(h)
        ci += 1
    return feats


def init_lpips_params(key) -> Params:
    k1, *ks = jax.random.split(key, 6)
    return {
        "vgg": init_vgg16_params(k1),
        "lins": [{"w": jnp.abs(jax.random.normal(k, (1, 1, c, 1))) * 0.1}
                 for k, c in zip(ks, _LPIPS_CHANNELS)],
    }


def lpips(params: Params, x: jax.Array, y: jax.Array) -> jax.Array:
    """Perceptual distance, (B, 1, 1, 1)-mean -> scalar per batch mean.
    Inputs in [-1, 1], NHWC."""
    fx = vgg16_features(params["vgg"], x)
    fy = vgg16_features(params["vgg"], y)
    total = 0.0
    for a, b, lin in zip(fx, fy, params["lins"]):
        na = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        nb = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        val = conv2d(d, lin["w"])                       # (B, H, W, 1)
        total = total + jnp.mean(val, axis=(1, 2, 3))   # spatial mean
    return jnp.mean(total)


# ---------------------------------------------------------------------------
# PatchGAN discriminator
# ---------------------------------------------------------------------------

def init_discriminator_params(key, input_nc: int = 3, ndf: int = 64,
                              n_layers: int = 3) -> Params:
    ks = iter(jax.random.split(key, 16))
    layers = []
    cin, mult = input_nc, 1
    layers.append({"conv": {"w": 0.02 * jax.random.normal(
        next(ks), (4, 4, cin, ndf)), "b": jnp.zeros((ndf,))}, "bn": None})
    cin = ndf
    for n in range(1, n_layers + 1):
        mult = min(2 ** n, 8)
        cout = ndf * mult
        layers.append({
            "conv": {"w": 0.02 * jax.random.normal(next(ks), (4, 4, cin, cout)),
                     "b": jnp.zeros((cout,))},
            "bn": {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,))},
        })
        cin = cout
    head = {"w": 0.02 * jax.random.normal(next(ks), (4, 4, cin, 1)),
            "b": jnp.zeros((1,))}
    return {"layers": layers, "head": head}


def _batch_norm(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def discriminator_forward(params: Params, x: jax.Array) -> jax.Array:
    """PatchGAN logits map. Strides: 2 for the first n_layers convs, then 1,
    all with pad 1 on a 4x4 kernel (torch padding=1 == pad then VALID)."""
    n_layers = len(params["layers"]) - 1
    h = x
    for i, layer in enumerate(params["layers"]):
        stride = 2 if i < n_layers else 1
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h = conv2d(hp, **layer["conv"], stride=stride, padding="VALID")
        if layer["bn"] is not None:
            h = _batch_norm(h, **layer["bn"])
        h = jax.nn.leaky_relu(h, 0.2)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return conv2d(hp, **params["head"], stride=1, padding="VALID")


# ---------------------------------------------------------------------------
# Combined loss
# ---------------------------------------------------------------------------

def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    return jnp.where(global_step < threshold, value, weight)


class VQGANLossConfig(NamedTuple):
    disc_start: int = 0
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    disc_loss: str = "hinge"


def generator_loss(loss_params: Params, cfg: VQGANLossConfig,
                   codebook_loss, inputs, recons, global_step,
                   nll_grad_last, g_grad_last):
    """AE-side loss (optimizer_idx 0). nll_grad_last / g_grad_last are the
    gradients of the nll/GAN terms w.r.t. the decoder's last conv weight,
    used for the adaptive discriminator weight."""
    rec = jnp.abs(inputs - recons)
    p = lpips(loss_params["lpips"], inputs, recons) \
        if cfg.perceptual_weight > 0 else 0.0
    nll = jnp.mean(rec) + cfg.perceptual_weight * p
    logits_fake = discriminator_forward(loss_params["disc"], recons)
    g_loss = -jnp.mean(logits_fake)

    d_weight = jnp.linalg.norm(nll_grad_last.ravel()) / (
        jnp.linalg.norm(g_grad_last.ravel()) + 1e-4)
    d_weight = jax.lax.stop_gradient(
        jnp.clip(d_weight, 0.0, 1e4)) * cfg.disc_weight
    disc_factor = adopt_weight(cfg.disc_factor, global_step,
                               threshold=cfg.disc_start)
    total = nll + d_weight * disc_factor * g_loss \
        + cfg.codebook_weight * jnp.mean(codebook_loss)
    return total, {"nll_loss": nll, "g_loss": g_loss, "d_weight": d_weight,
                   "quant_loss": jnp.mean(codebook_loss)}


def discriminator_loss(loss_params: Params, cfg: VQGANLossConfig,
                       inputs, recons, global_step):
    logits_real = discriminator_forward(
        loss_params["disc"], jax.lax.stop_gradient(inputs))
    logits_fake = discriminator_forward(
        loss_params["disc"], jax.lax.stop_gradient(recons))
    fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    disc_factor = adopt_weight(cfg.disc_factor, global_step,
                               threshold=cfg.disc_start)
    d = disc_factor * fn(logits_real, logits_fake)
    return d, {"disc_loss": d, "logits_real": jnp.mean(logits_real),
               "logits_fake": jnp.mean(logits_fake)}


# ---------------------------------------------------------------------------
# Tokenizer trainer (AE/disc alternating, reference vqgan.py:161-223)
# ---------------------------------------------------------------------------

class VQGANTrainer:
    """Alternating autoencoder/discriminator training of the tokenizer.
    With a CLIP encoder the encoder is frozen (reference: vqgan.py:207-213
    excludes encoder params from the AE optimizer)."""

    def __init__(self, cfg: VQGANConfig, params: Params,
                 loss_cfg: VQGANLossConfig = VQGANLossConfig(),
                 lr: float = 4.5e-6, seed: int = 0,
                 lpips_params: Optional[Params] = None):
        """lpips_params: pretrained LPIPS weights (VGG16 + lin heads) from
        checkpoint.convert_vgg16_lpips / load_lpips_params -- REQUIRED for
        a perceptually meaningful loss on real tokenizer training; the
        random-init fallback only exercises the math."""
        self.cfg = cfg
        self.loss_cfg = loss_cfg
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.params = params
        self.loss_params = {
            "lpips": (lpips_params if lpips_params is not None
                      else init_lpips_params(k1)),
            "disc": init_discriminator_params(k2)}
        # AdamW betas (0.5, 0.9) (reference: vqgan.py:214-222)
        self.ae_opt = optax.adamw(lr, b1=0.5, b2=0.9)
        self.disc_opt = optax.adamw(lr, b1=0.5, b2=0.9)
        self.ae_state = self.ae_opt.init(self._ae_params(params))
        self.disc_state = self.disc_opt.init(self.loss_params["disc"])
        self.step = 0
        self._ae_step = jax.jit(self._make_ae_step())
        self._disc_step = jax.jit(self._make_disc_step())

    def _ae_params(self, params):
        # decoder + quant convs train; CLIP encoder frozen
        return {k: params[k] for k in
                ("decoder", "quant_conv", "post_quant_conv")}

    def _reconstruct(self, params, pixels):
        quant, aux, _, _ = vq.encode(params, self.cfg, pixels, training=True)
        rec = vq.decode_code  # noqa -- direct decode from quant:
        z = conv2d(quant, **params["post_quant_conv"])
        recon = vq.decoder_forward(params["decoder"], self.cfg, z)
        return recon, aux

    def _make_ae_step(self):
        cfg_l = self.loss_cfg

        def loss_fn(ae_params, frozen, loss_params, pixels, targets, step):
            params = dict(frozen, **ae_params)
            recon, aux = self._reconstruct(params, pixels)

            def nll_of(w):
                p2 = dict(params, decoder=dict(params["decoder"],
                                               conv_out=w))
                r, _ = self._reconstruct(p2, pixels)
                rec = jnp.mean(jnp.abs(targets - r))
                if cfg_l.perceptual_weight > 0:
                    rec = rec + cfg_l.perceptual_weight * lpips(
                        loss_params["lpips"], targets, r)
                return rec

            def g_of(w):
                p2 = dict(params, decoder=dict(params["decoder"],
                                               conv_out=w))
                r, _ = self._reconstruct(p2, pixels)
                return -jnp.mean(discriminator_forward(loss_params["disc"], r))

            w_last = params["decoder"]["conv_out"]["w"]
            nll_grad = jax.grad(lambda w: nll_of(
                {"w": w, "b": params["decoder"]["conv_out"]["b"]}))(w_last)
            g_grad = jax.grad(lambda w: g_of(
                {"w": w, "b": params["decoder"]["conv_out"]["b"]}))(w_last)

            total, logs = generator_loss(loss_params, cfg_l, aux, targets,
                                         recon, step, nll_grad, g_grad)
            return total, logs

        def step_fn(ae_params, frozen, loss_params, ae_state, pixels,
                    targets, step):
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ae_params, frozen, loss_params, pixels, targets, step)
            updates, new_state = self.ae_opt.update(grads, ae_state, ae_params)
            return optax.apply_updates(ae_params, updates), new_state, loss, logs

        return step_fn

    def _make_disc_step(self):
        cfg_l = self.loss_cfg

        def loss_fn(disc_params, params, lpips_params, pixels, targets, step):
            recon, _ = self._reconstruct(params, pixels)
            lp = {"disc": disc_params, "lpips": lpips_params}
            d, logs = discriminator_loss(lp, cfg_l, targets, recon, step)
            return d, logs

        def step_fn(disc_params, params, lpips_params, disc_state, pixels,
                    targets, step):
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                disc_params, params, lpips_params, pixels, targets, step)
            updates, new_state = self.disc_opt.update(grads, disc_state,
                                                      disc_params)
            return (optax.apply_updates(disc_params, updates), new_state,
                    loss, logs)

        return step_fn

    def train_step(self, pixels, targets=None) -> Dict[str, float]:
        """One AE update + one discriminator update (reference
        training_step). pixels: CLIP-normalized input; targets: [-1,1] RGB
        ground truth (clip_to_rgb of pixels when None)."""
        if targets is None:
            targets = pixels
        ae_params = self._ae_params(self.params)
        frozen = {k: v for k, v in self.params.items()
                  if k not in ae_params}
        ae_params, self.ae_state, ae_loss, ae_logs = self._ae_step(
            ae_params, frozen, self.loss_params, self.ae_state, pixels,
            targets, self.step)
        self.params = dict(self.params, **ae_params)

        disc, self.disc_state, d_loss, d_logs = self._disc_step(
            self.loss_params["disc"], self.params, self.loss_params["lpips"],
            self.disc_state, pixels, targets, self.step)
        self.loss_params["disc"] = disc
        self.step += 1
        return {"aeloss": float(ae_loss), "discloss": float(d_loss),
                **{k: float(v) for k, v in ae_logs.items()},
                **{k: float(v) for k, v in d_logs.items()}}
