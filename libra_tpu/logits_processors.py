"""Constrained-decoding logits processors.

Functional equivalents of the reference's processors
(llama/modeling_llama_utils.py:8-76 -- defined there but unused by the main
path; provided here as composable functions for the jitted decode loop):

* no_newline: once a newline has been emitted, force EOS;
* valid_image: inside an image block restrict sampling to image-token ids,
  and force <EOI> at the block's last slot.

Each processor is (logits (Q,B,Vc), state) -> logits and is pure/jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from libra_tpu.config import LibraConfig

NEG = -1e30


def no_newline_processor(cfg: LibraConfig, logits: jax.Array,
                         emitted_newline: jax.Array) -> jax.Array:
    """emitted_newline: (B,) bool -- once true, only EOS is allowed."""
    forced = jnp.full_like(logits, NEG)
    forced = forced.at[..., cfg.eos_token_id].set(0.0)
    return jnp.where(emitted_newline[None, :, None], forced, logits)


def valid_image_processor(cfg: LibraConfig, logits: jax.Array,
                          vision_indices: jax.Array) -> jax.Array:
    """vision_indices: (B,) index of the position being predicted FROM.
    While inside an image (index in [0, M-3]) restrict to the 512 code ids;
    at index M-3 (last grid cell) force <EOI>."""
    Vc = logits.shape[-1]
    V, Mv = cfg.vocab_size, cfg.max_vision_token_length
    code_lo, code_hi = V, V + cfg.vision_vocab_size - 2
    eoi_id = V + cfg.vision_vocab_size - 1

    ids = jnp.arange(Vc)
    in_code_range = (ids >= code_lo) & (ids < code_hi)
    codes_only = jnp.where(in_code_range[None, None, :], logits, NEG)
    force_eoi = jnp.full_like(logits, NEG).at[..., eoi_id].set(0.0)

    vi = vision_indices
    mid_image = (vi >= 0) & (vi < Mv - 3)
    last_cell = vi == Mv - 3
    out = jnp.where(mid_image[None, :, None], codes_only, logits)
    out = jnp.where(last_cell[None, :, None], force_eoi, out)
    return out
