"""Fused train step: device-resident image tokenization inside the jitted
step.

The reference runs CLIP+VQGAN tokenization under no_grad INSIDE the train
step on GPU (LibraTrainWrapper.forward -> LibraTokenizer,
modeling_libra.py:1414-1433; SURVEY.md section 3.1 marks it the hot path).
Here the whole pipeline -- CLIP ViT encode, LFQ quantize, id/signal
scatter, decoder forward/backward -- is ONE compiled XLA program: the
vision encode overlaps with the decoder's early layers automatically, and
no token ids ever bounce through the host.

Constraint for static shapes: every sample carries exactly one image block
(the LAION pretrain shape). `image_valid` zeroes contributions of samples
whose image is a dummy.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from libra_tpu.config import LibraConfig, VQGANConfig
from libra_tpu.models import libra as M
from libra_tpu.models import vqgan as vq
from libra_tpu.training.trainer import TrainState


class FusedBatch(NamedTuple):
    """Host-prepared arrays; everything image-dependent is computed on
    device."""
    pixels: jax.Array          # (B, S, S, 3) CLIP-normalized
    text_ids: jax.Array        # (B, N) token ids; image slots hold anything
    img_start: jax.Array       # (B,) start index of the 578-token block
    attention_mask: jax.Array  # (B, N)
    vision_indices: jax.Array  # (B, N)
    labels_static: jax.Array   # (Q, B, N) labels with -100 at masked spots
    label_copy_mask: jax.Array  # (B, N) True where label := encoded image id
    signal_ignore: jax.Array   # (B,) True -> zero the continuous signal (t2i)


def maybe_normalize_pixels(vq_cfg: VQGANConfig, pixels: jax.Array):
    """uint8 (already resized/cropped) pixels -> CLIP-normalized float32 ON
    DEVICE. Serving fast path: ship 1 byte/channel host->device (4x fewer
    staging bytes than f32) and fold rescale+normalize into the prefill
    program -- the same f32 math as the host normalize
    (data/processors.py:88-92), so results are identical. Float inputs pass
    through unchanged (already normalized)."""
    if pixels.dtype != jnp.uint8:
        return pixels
    mean = jnp.asarray(vq_cfg.clip.image_mean, jnp.float32)
    std = jnp.asarray(vq_cfg.clip.image_std, jnp.float32)
    return (pixels.astype(jnp.float32) / 255.0 - mean) / std


def encode_images_to_tokens(vq_params, vq_cfg: VQGANConfig, cfg: LibraConfig,
                            pixels: jax.Array):
    """(B,S,S,3) -> framed ids (Q, B, 578) in combined vocab + continuous
    signal rows (B, 578, C) with zero BOI/EOI rows
    (ImageTokenizer.encode + signal framing: image_tokenizer.py:75-95,
    tokenization_libra.py:278-287). Accepts uint8 pixels (normalized on
    device, see maybe_normalize_pixels) or pre-normalized float32."""
    pixels = maybe_normalize_pixels(vq_cfg, pixels)
    _, _, indices, feat = vq.encode(vq_params, vq_cfg, pixels)
    B, g, _, Q = indices.shape
    ids = indices.transpose(3, 0, 1, 2).reshape(Q, B, g * g) + cfg.vocab_size
    boi = cfg.vocab_size + cfg.vision_vocab_size - 2
    eoi = cfg.vocab_size + cfg.vision_vocab_size - 1
    ids = jnp.concatenate([
        jnp.full((Q, B, 1), boi, ids.dtype), ids,
        jnp.full((Q, B, 1), eoi, ids.dtype)], axis=-1)
    C = feat.shape[-1]
    feat = feat.reshape(B, g * g, C)
    zero = jnp.zeros((B, 1, C), feat.dtype)
    sig = jnp.concatenate([zero, feat, zero], axis=1)   # (B, 578, C)
    return ids, sig


def _scatter_block(row: jax.Array, block: jax.Array, start) -> jax.Array:
    """Insert `block` (M, ...) into `row` (N, ...) at dynamic offset."""
    return jax.lax.dynamic_update_slice(
        row, block.astype(row.dtype), (start,) + (0,) * (row.ndim - 1))


def resolve_attn_impl(attn_impl: str) -> str:
    """'auto' -> the fused Pallas flash kernel on TPU, XLA elsewhere --
    the same resolution generation._prefill and ServingEngine use. With
    the r5 custom VJP (ops/pallas/flash_bridge.py) the kernel is
    differentiable, so TRAINING defaults onto it too: the XLA backward
    materialises (B, H, N, N) probability planes in HBM per layer; the
    fused backward recomputes them in VMEM."""
    if attn_impl == "auto":
        return "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    return attn_impl


def fused_loss_fn(params, vq_params, cfg: LibraConfig, vq_cfg: VQGANConfig,
                  batch: FusedBatch, remat=True,
                  dropout_rng=None, attn_impl: str = "auto") -> jax.Array:
    Q = cfg.vision_codebook_num
    B, N = batch.text_ids.shape
    Mv = cfg.max_vision_token_length

    img_ids, img_sig = encode_images_to_tokens(
        jax.lax.stop_gradient(vq_params), vq_cfg, cfg, batch.pixels)
    img_sig = jnp.where(batch.signal_ignore[:, None, None], 0.0, img_sig)

    ids = jnp.broadcast_to(batch.text_ids[None], (Q, B, N))
    ids = jax.vmap(jax.vmap(_scatter_block, in_axes=(0, 0, 0)),
                   in_axes=(0, 0, None))(ids, img_ids, batch.img_start)
    sig = jnp.zeros((B, N, img_sig.shape[-1]), img_sig.dtype)
    sig = jax.vmap(_scatter_block)(sig, img_sig, batch.img_start)

    labels = jnp.where(batch.label_copy_mask[None], ids,
                       batch.labels_static)

    flag = batch.vision_indices < Mv
    out = M.forward(params, cfg, ids, batch.attention_mask,
                    batch.vision_indices, sig, remat=remat,
                    dropout_rng=dropout_rng,
                    attn_impl=resolve_attn_impl(attn_impl))
    tl = M.compute_text_logits(params, out.hidden_states)
    if cfg.vision_prediction_mode == "2d":
        vl = M.compute_vision_logits_2d(params, cfg, out.hidden_states,
                                        batch.vision_indices)
    else:
        vl = M.compute_vision_logits(params, out.hidden_states)
    return M.multicodebook_loss(cfg, tl, vl, flag, labels,
                                unified=cfg.unified_head)


def make_fused_train_step(cfg: LibraConfig, vq_cfg: VQGANConfig,
                          opt: optax.GradientTransformation,
                          dropout_seed: int = 0, grad_mask=None,
                          attn_impl: str = "auto", remat=True):
    """grad_mask: static bool pytree (training.optimizer.trainable_mask)
    -- frozen leaves never get dL/dW matmuls emitted (see
    trainer.masked_value_and_grad).
    remat: True/"full" or "dots" (see models.libra.forward)."""
    from libra_tpu.training.trainer import masked_value_and_grad

    def step(state: TrainState, vq_params, batch: FusedBatch):
        rng = (jax.random.fold_in(jax.random.PRNGKey(dropout_seed),
                                  state.step)
               if M.dropout_enabled(cfg) else None)
        loss, grads = masked_value_and_grad(
            lambda p: fused_loss_fn(p, vq_params, cfg, vq_cfg, batch,
                                    remat=remat, dropout_rng=rng,
                                    attn_impl=attn_impl),
            state.params, grad_mask)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(new_params, new_opt, state.step + 1),
                {"loss": loss, "grad_norm": optax.global_norm(grads)})
    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Host-side batch preparation from data-layer samples
# ---------------------------------------------------------------------------

def prepare_fused_batch(samples: Dict[str, list], text_tokenizer,
                        cfg: LibraConfig,
                        max_length: Optional[int] = None) -> FusedBatch:
    """Convert a pair-sample collated batch ({'vision': [pixels...],
    'language': [caption...], 'label_mask_position_map': [...]}) into a
    FusedBatch. Texts contain the <img_ph> block; exactly one image per
    sample."""
    Mv = cfg.max_vision_token_length
    t = text_tokenizer(samples["language"], padding="longest")
    ids = np.asarray(t["input_ids"], np.int32)
    mask = np.asarray(t["attention_mask"], np.int32)
    B, N = ids.shape

    ph_id = text_tokenizer.img_ph_token_id
    img_start = np.zeros((B,), np.int32)
    vision_indices = np.full((B, N), Mv, np.int64)
    for b in range(B):
        pos = np.nonzero(ids[b] == ph_id)[0]
        if len(pos) != Mv:
            raise ValueError(f"sample {b}: {len(pos)} <img_ph>, want {Mv}")
        img_start[b] = pos[0]
        vision_indices[b, pos[0]:pos[0] + Mv] = np.arange(Mv)

    # static labels: text tokens with pad/BOS/span masks; image-token labels
    # are sentinel-copied from the device-side encode
    labels = np.broadcast_to(ids[None],
                             (cfg.vision_codebook_num, B, N)).astype(np.int64).copy()
    labels[:, mask == 0] = -100
    labels[labels == text_tokenizer.bos_token_id] = -100
    copy_mask = np.zeros((B, N), bool)
    for b, spans in enumerate(samples["label_mask_position_map"]):
        sl = slice(img_start[b], img_start[b] + Mv)
        copy_mask[b, sl] = True
        copy_mask[b, img_start[b]] = False          # BOI label masked
        labels[:, b, sl] = -100
        for start, end in spans:
            if start is None:
                continue
            labels[:, b, slice(start, end)] = -100
            copy_mask[b, slice(start, end)] = False

    ignore = np.asarray(samples.get("contiguous_ignore_sign",
                                    [False] * B), bool)
    pixels = np.stack([np.asarray(v) for v in samples["vision"]])

    if max_length and N > max_length:
        ids = ids[:, :max_length]
        mask = mask[:, :max_length]
        vision_indices = vision_indices[:, :max_length]
        labels = labels[:, :, :max_length]
        copy_mask = copy_mask[:, :max_length]
        N = max_length

    return FusedBatch(
        pixels=jnp.asarray(pixels), text_ids=jnp.asarray(ids),
        img_start=jnp.asarray(img_start),
        attention_mask=jnp.asarray(mask),
        vision_indices=jnp.asarray(vision_indices),
        labels_static=jnp.asarray(labels),
        label_copy_mask=jnp.asarray(copy_mask),
        signal_ignore=jnp.asarray(ignore))
