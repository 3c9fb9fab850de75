"""Modality-routed dual-path projections, the TPU-native way.

The reference routes tokens through language/vision modules with boolean-mask
gather/scatter (`cal_language_vision`, reference: modeling_libra.py:111-147)
-- dynamic shapes that XLA cannot tile. Here we compute BOTH paths densely for
all tokens and select with `jnp.where(vision_flag)`. This is numerically
identical (each output element comes from exactly one path) and fully static.

Cost note: the vision path is a down_ratio-4 bottleneck (LibraLinear,
reference: modeling_libra.py:150-204), so dense dual-path costs +25% FLOPs on
projections only; attention/matmul FLOPs are unchanged, and everything stays
on the MXU with no host-visible gathers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def select_by_flag(flag: jax.Array, vision: jax.Array, language: jax.Array) -> jax.Array:
    """out[t] = vision[t] if flag[t] else language[t], broadcasting flag over
    trailing feature dims."""
    extra = vision.ndim - flag.ndim
    f = flag.reshape(flag.shape + (1,) * extra)
    return jnp.where(f, vision, language)


def low_rank_linear(x: jax.Array, wa: jax.Array, wb: jax.Array) -> jax.Array:
    """Factored linear y = (x @ wa) @ wb.

    Mirrors LibraLinear.forward (reference: modeling_libra.py:192-199) with
    weights stored transposed for x @ W convention:
    wa: (in, bottleneck), wb: (bottleneck, out).
    """
    hidden = jnp.einsum("...i,ir->...r", x, wa.astype(x.dtype))
    return jnp.einsum("...r,ro->...o", hidden, wb.astype(x.dtype))


def routed_linear(x: jax.Array, flag: jax.Array, w_lang: jax.Array,
                  wa_vis: jax.Array, wb_vis: jax.Array,
                  addition_mode: bool = False) -> jax.Array:
    """Dense routed projection.

    Language path: full-rank x @ w_lang. Vision path: low-rank (x@wa)@wb.
    addition_mode adds the vision output on top of the language output at
    vision positions instead of replacing it
    (reference: modeling_libra.py:111-127).
    """
    lang = jnp.einsum("...i,io->...o", x, w_lang.astype(x.dtype))
    vis = low_rank_linear(x, wa_vis, wb_vis)
    if addition_mode:
        return lang + select_by_flag(flag, vis, jnp.zeros_like(vis))
    return select_by_flag(flag, vis, lang)


def routed_low_rank(x: jax.Array, flag: jax.Array,
                    wa_lang: jax.Array, wb_lang: jax.Array,
                    wa_vis: jax.Array, wb_vis: jax.Array) -> jax.Array:
    """Routed projection where both paths are low-rank (the K/V bridges:
    vision_*_bridge_on_language vs vision_*_bridge_on_vision,
    reference: modeling_libra.py:259-263,318-319)."""
    lang = low_rank_linear(x, wa_lang, wb_lang)
    vis = low_rank_linear(x, wa_vis, wb_vis)
    return select_by_flag(flag, vis, lang)
