"""Optimizer construction: AdamW(0.9, 0.99) + cosine schedule + warmup +
grad clip + selective freezing.

Mirrors the reference run config (libra_pretrain.yaml:81-94: lr 1e-4,
cosine, warmup 5%, weight_decay 0.01, AdamW betas (0.9, 0.99), clip 1.0)
and the LibraTrainWrapper freeze policies (modeling_libra.py:1342-1369).
Frozen parameters are expressed as optax.set_to_zero partitions, the
pjit-native ZeRO-friendly equivalent of requires_grad=False.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-4
    warmup_ratio: float = 0.05
    total_steps: int = 40_000
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.99
    max_grad_norm: float = 1.0
    min_lr_ratio: float = 0.0
    # language-side LR scaling (reference: LibraTrainer.create_optimizer
    # honors lr_scale param groups, trainer.py:38-85)
    llm_lr_scale: float = 1.0
    # freeze policies (reference: modeling_libra.py:1342-1369)
    frozen_language: bool = False
    freeze_vision_value: bool = False
    freeze_text_embedding: bool = False
    freeze_vision_embedding: bool = False


def _path_str(path) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)


def trainable_mask(params: Any, cfg: OptimizerConfig) -> Any:
    """True = trainable. Name semantics follow the reference's substring
    matching over parameter names; our tree uses shorter names, so the
    vision-side signal fusion params (reference names
    vision_contiguous_signal_processor / vision_signal_norm) are mapped
    explicitly."""
    vision_extra = {"signal_proj", "signal_norm", "vision_position_embedding"}

    def visit(path, leaf):
        p = _path_str(path)
        parts = set(p.split("/"))
        # bridges are vision-side params (reference names them
        # vision_k_bridge_on_language etc.)
        is_vision = ("vision" in p) or ("bridge" in p) or bool(parts & vision_extra)
        if cfg.frozen_language and not is_vision:
            return False
        if cfg.freeze_vision_value and "vision_v" in p and "bridge" not in p:
            return False
        if cfg.freeze_text_embedding and "embed_tokens" in parts:
            return False
        if cfg.freeze_vision_embedding and "vision_embed_tokens" in parts:
            return False
        return True

    return jax.tree_util.tree_map_with_path(visit, params)


def decay_mask(params: Any) -> Any:
    """Weight decay applies to matrices only, not norm scales / 1-D params
    (reference: trainer.py:27-36 counts RMSNorm as layernorm; no biases
    exist in the decoder)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = max(1, int(cfg.total_steps * cfg.warmup_ratio))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.learning_rate,
        warmup_steps=warmup, decay_steps=cfg.total_steps,
        end_value=cfg.learning_rate * cfg.min_lr_ratio)


def _vision_mask(params: Any) -> Any:
    vision_extra = {"signal_proj", "signal_norm", "vision_position_embedding"}

    def visit(path, leaf):
        p = _path_str(path)
        return ("vision" in p) or ("bridge" in p) \
            or bool(set(p.split("/")) & vision_extra)
    return jax.tree_util.tree_map_with_path(visit, params)


def make_optimizer(cfg: OptimizerConfig, params: Any) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)

    def chain(lr_scale: float):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2),
            optax.add_decayed_weights(cfg.weight_decay,
                                      mask=decay_mask(params)),
            optax.scale_by_learning_rate(
                lambda step: schedule(step) * lr_scale),
        )

    train_mask = trainable_mask(params, cfg)
    vision = _vision_mask(params)
    all_trainable = all(jax.tree_util.tree_leaves(train_mask))
    if cfg.llm_lr_scale == 1.0 and all_trainable:
        return chain(1.0)

    def label(t, is_vis):
        if not t:
            return "frozen"
        return "vision" if is_vis else "language"

    labels = jax.tree_util.tree_map(label, train_mask, vision)
    return optax.multi_transform(
        {"vision": chain(1.0), "language": chain(cfg.llm_lr_scale),
         "frozen": optax.set_to_zero()}, labels)
