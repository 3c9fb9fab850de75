"""Exponential moving average of parameters.

The reference ships an EMA helper marked "NOT AVAILABLE"
(trainer.py:88-149); here it is a working optax-style transform over the
sharded param pytree (EMA state inherits the params' shardings, so it
composes with fsdp for free)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    ema: Any
    count: jax.Array


def init_ema(params: Any) -> EMAState:
    return EMAState(ema=jax.tree_util.tree_map(jnp.array, params),
                    count=jnp.zeros((), jnp.int32))


def update_ema(state: EMAState, params: Any, decay: float = 0.999,
               warmup: bool = True) -> EMAState:
    """ema <- d * ema + (1-d) * params, with the standard bias-correcting
    warmup d_t = min(decay, (1+t)/(10+t))."""
    count = state.count + 1
    d = jnp.minimum(decay, (1.0 + count) / (10.0 + count)) if warmup \
        else jnp.asarray(decay)
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
        state.ema, params)
    return EMAState(ema=new_ema, count=count)
